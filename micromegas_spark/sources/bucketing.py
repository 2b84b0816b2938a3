"""Bucketed-table write path: co-located joins and aggregations.

At 100 TB the dominant cost of fact⨝fact joins is the shuffle. Writing both
tables bucketed by the join key (`bucketBy` + `sortBy`) pre-partitions the
data on disk: Spark's scan reports the bucketing as its output
partitioning, so an equi-join on the bucket key plans with **no Exchange**
on either side (verified by tests/test_bucketing.py on the physical plan).

This is the Spark-idiomatic equivalent of the reference's declared scan
orderings + co-located partition layout (SURVEY §2.6 O3 / §4 'bucketed-
sorted tables avoiding shuffle') — where the reference certifies sortedness
to elide sorts, Spark certifies bucketing to elide shuffles.

Bucketed tables require the session catalog (saveAsTable); the warehouse
location comes from spark.sql.warehouse.dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write df as a bucketed (and optionally sort-within-bucket) managed
    table. n_buckets should match the target parallelism granularity —
    buckets are the minimum join/agg task unit."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables previously bucketed on the join key: planned
    shuffle-free (SortMergeJoin over bucket-aligned scans)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
