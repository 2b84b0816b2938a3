"""Ordered-sequence (funnel) analysis over an event stream.

Not in the reference's operator inventory — part of the product-analytics
surface a telemetry lakehouse is used for (the reference's docs drive the
same events tables at dashboards). Semantics: earliest-anchor greedy
matching, the standard funnel-engine contract — step 1 matches each
user's EARLIEST step-1 event, and each later step matches its earliest
event strictly after the previous match (optionally within ``window``
of the anchor — expressed in ``ts_col``'s own unit, whatever that is;
the in-repo callers pass microsecond timestamps and a microsecond
window). Greedy-from-earliest can miss windowed
sequences a later anchor would complete; that caveat is inherent to the
contract and mirrored exactly by the DuckDB oracle.
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    window: int | None = None,
) -> DataFrame:
    """Users reaching each funnel step in order → (step, event_type,
    n_users), step 1-indexed.

    Scale shape: one aggregation per step, each keyed on the user column
    — every groupBy and join shuffles on the SAME key, so after the first
    exchange the stages are co-partitioned (no re-shuffle; AQE reuses the
    partitioning). The per-step relations shrink monotonically (funnel),
    and the final counts are single-row aggregates. No window functions,
    no per-user event collection — memory is O(1) per user per step."""
    if not steps:
        raise InvalidArgument("funnel needs at least one step")
    cur = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t1"))
    )
    if window is not None:
        cur = cur.select(user_col, "_t1", (F.col("_t1") + F.lit(window)).alias("_hi"))
    out_counts = [cur.agg(F.count("*").cast("bigint").alias("n")).select(
        F.lit(1).cast("bigint").alias("step"), F.lit(steps[0]).alias(type_col), "n"
    )]
    prev = cur
    for i, step in enumerate(steps[1:], start=2):
        cond = (F.col(type_col) == step) & (F.col(ts_col) > F.col(f"_t{i-1}"))
        if window is not None:
            cond = cond & (F.col(ts_col) <= F.col("_hi"))
        nxt = (
            df.join(prev, user_col)
            .where(cond)
            .groupBy(user_col, *( ["_hi"] if window is not None else [] ))
            .agg(F.min(ts_col).alias(f"_t{i}"))
        )
        out_counts.append(
            nxt.agg(F.count("*").cast("bigint").alias("n")).select(
                F.lit(i).cast("bigint").alias("step"), F.lit(step).alias(type_col), "n"
            )
        )
        prev = nxt
    out = out_counts[0]
    for c in out_counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("step")
