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
    if _estimated_partitions(df) >= target:
        return df
    return df.repartition(target)


def _estimated_partitions(df: DataFrame) -> int:
    """Estimate the scan's split count WITHOUT ``df.rdd`` — the RDD
    conversion forces full physical planning per call (~100 ms warm,
    >1 s on first JIT), which is pure driver overhead for a partition
    probe. For file-backed plans, splits ≈ Σ file sizes /
    maxPartitionBytes (how Spark actually splits), floored by the file
    count the same way. Non-file or remote-scheme plans fall back to the
    exact RDD probe."""
    import math
    import os

    try:
        files = df.inputFiles()
        if files and all(f.startswith("file:") for f in files):
            spark = df.sparkSession
            raw = spark.conf.get("spark.sql.files.maxPartitionBytes")
            # conf may carry a unit suffix ("134217728b", "128MB")
            import re

            m = re.fullmatch(r"(\d+)\s*([kKmMgG]?)[bB]?", raw.strip())
            if not m:
                raise ValueError(raw)
            maxpb = int(m.group(1)) * {
                "": 1, "k": 1024, "m": 1024**2, "g": 1024**3
            }[m.group(2).lower()]
            total = 0
            for f in files:
                path = f[len("file://"):] if f.startswith("file://") else f[len("file:"):]
                total += os.path.getsize(path)
            return max(len(files), math.ceil(total / max(maxpb, 1)))
    except Exception:
        pass
    return df.rdd.getNumPartitions()
