from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QueryDef"] = {}


@dataclass
class QueryDef:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str | None = None


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a driver-contract query.

    Determinism conventions (both engines must agree bit-for-bit):
    - numeric outputs are BIGINT or DOUBLE only (no engine-specific decimal
      widths in result schemas);
    - money aggregations go through exact DECIMAL sums, then one cast to
      DOUBLE (double summation order is engine-dependent; decimal is not);
    - event timestamps are compared as epoch-microsecond BIGINTs (the events
      parquet is ns-precision, which Spark reads as long and DuckDB truncates
      to µs — epoch integers are the timezone-proof common denominator);
    - every LIMIT has a total tie-breaking ORDER BY;
    - window orderings always include a unique key column.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QueryDef(name, fn, oracle, fn.__doc__)
        return fn

    return deco
