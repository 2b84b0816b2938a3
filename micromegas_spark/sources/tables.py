"""Readers for the driver's synthetic test tables (TESTDATA.md).

The reference's scan layer (SURVEY §2.1 S1-S3) is a partitioned parquet scan
with catalog-level pruning; at test scale each table is a single parquet file
so ``spark.read.parquet`` with Catalyst's built-in projection/predicate
pushdown is the whole story. The partition-pruned read path for materialized
views lives in ``micromegas_spark.plans``.

Conventions for the ``events`` stream table:
- parquet stores TIMESTAMP(NANOS) which Spark rejects; with
  ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as BIGINT
  epoch-ns. We expose it as:
    * ``ts``       — BIGINT epoch-nanoseconds (reference is ns-native,
                     SURVEY §1.3 / span_table.rs:56-65)
    * ``ts_us``    — BIGINT epoch-microseconds (ts div 1000)
    * ``event_time`` — TIMESTAMP (µs precision) for human-facing queries
  Oracle parity note: DuckDB reads the same column as a naive µs timestamp;
  epoch-µs BIGINTs are the timezone-proof common denominator, so the
  driver-compared queries group/sort on epoch integers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micromegas_spark.session import configure

TEST_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# (applicationId, path, (mtime, size)) → DataFrame. A DataFrame is an
# immutable logical plan, and the file stamp in the key means an in-place
# rewrite of the parquet gets a fresh read; the win is the ~100ms of py4j
# + file-listing + schema-read that spark.read.parquet pays per call —
# measurable across an 84-query bench.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None  # directory-style parquet or remote path: no staleness key
    key = (spark.sparkContext.applicationId, os.path.abspath(path), stamp)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(path)
    if name == "events":
        dt = dict(df.dtypes).get("ts", "")
        if dt == "bigint":
            # TIMESTAMP(NANOS) parquet + nanosAsLong → epoch-ns BIGINT
            df = df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
                "event_time", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif dt.startswith("timestamp"):
            # µs TIMESTAMP parquet: reconstruct the ns-native surface.
            # Session tz is UTC (session.RUNTIME_CONFS) so the ntz→ltz cast
            # matches DuckDB's naive-as-UTC epoch_us() reading.
            us = F.unix_micros(F.col("ts").cast("timestamp"))
            df = (
                df.withColumn("event_time", F.col("ts").cast("timestamp"))
                .withColumn("ts_us", us)
                .withColumn("ts", (us * F.lit(1000)).cast("bigint"))
            )
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TEST_TABLES)}
