"""Range join: points ⨝ intervals containing them.

Spark has no native range-join optimization (a plain theta join plans as
BroadcastNestedLoop / cartesian — O(n·m) per key). The scale composition is
bucketing: explode each interval into the fixed-width time buckets it
overlaps, give each point its single bucket, equi-join on (key, bucket),
then re-apply the exact BETWEEN predicate as a residual. Each (point,
interval) pair meets exactly once (the point owns one bucket), so no
dedup pass is needed.

Bucket width trades explode factor (long intervals → many buckets) against
join selectivity (wide buckets → more residual-filtered pairs); set it
near the median interval length.

Correctness is algorithm-independent — the DuckDB oracle for
events_range_join runs the naive BETWEEN theta join and must produce the
identical row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_time: str,
    interval_begin: str,
    interval_end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of points to every interval (same keys) with
    interval_begin ≤ point_time ≤ interval_end. Returns point columns +
    interval columns."""
    w = int(bucket_width)
    i_exploded = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(interval_begin) / w).cast("bigint"),
                (F.col(interval_end) / w).cast("bigint"),
            )
        ),
    )
    p_bucketed = points.withColumn("_bucket", (F.col(point_time) / w).cast("bigint"))
    joined = p_bucketed.join(i_exploded, [*key_cols, "_bucket"])
    return joined.where(
        (F.col(point_time) >= F.col(interval_begin))
        & (F.col(point_time) <= F.col(interval_end))
    ).drop("_bucket")
