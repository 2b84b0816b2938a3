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


def ordered(df: DataFrame, *cols) -> DataFrame:
    """Final presentation sort for a result that is BOUNDED by construction.

    ``orderBy`` plans ``Exchange rangepartitioning`` whose range sampler is a
    separate Spark job that re-executes the sort's child stage — a measured
    ~0.17 s/query fixed tax at bench scale, and a pointless global exchange
    of an already-tiny relation at any scale (guide §2.4: an orderBy used
    only to make output deterministic is an accidental shuffle).
    ``coalesce(1).sortWithinPartitions`` yields the identical ordered rows
    (one partition holding every row, sorted by the same keys) with no
    sampling job and no exchange.

    ONLY for results whose row count is bounded by the query's construction
    — a fixed grouping domain (years, nations, priorities, histogram
    buckets, confusion cells), an explicit top-k, or a driver-bounded probe
    — NOT for per-entity outputs that grow with the data (per-document,
    per-part, per-supplier rows keep their global ``orderBy``: at 100 TB
    those sorts need range parallelism). The coalesce(1) merges the final
    (post-shuffle, partial-agg-collapsed) stage into one task, which for a
    bounded group domain is O(groups × map_tasks) rows — small at any SF.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)


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
