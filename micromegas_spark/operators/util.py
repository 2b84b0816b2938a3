"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition expression-heavy pipelines to full cluster parallelism.

    Small dimension-like inputs often arrive as 1-2 parquet splits (file
    size < maxPartitionBytes, or a single row group); md5/shingle/JSON
    stages are CPU-bound, so a single input split would serialize them on
    one core. At 100 TB the source has thousands of splits and this is a
    no-op; at test scale it is the difference between 1 and 32 cores."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
