"""Driver-contract query registry.

Each entry pairs a Spark DataFrame implementation with an equivalent ANSI-SQL
oracle that DuckDB runs on the same parquet tables. The driver hash-compares
results at sf=0.01 (row count + schema + order-insensitive value hash), so
every query follows the determinism conventions documented on
``queries.registry.query``.
"""

from micromegas_spark.queries.registry import REGISTRY, QueryDef, query

# import for registration side effects
from micromegas_spark.queries import (  # noqa: E402,F401
    core,
    engine_ops,
    llm,
    sql_surface,
    tpch_extra,
    tpch_full,
)

__all__ = ["REGISTRY", "QueryDef", "query"]


def queries():
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql():
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
