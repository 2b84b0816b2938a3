"""Time-series gap filling with linear interpolation.

The observability counterpart of the reference's lerp family (SURVEY
§2.8 F18 — math/lerp.rs gives the scalar; dashboards need it applied
across missing samples): given per-(series, bin) aggregates, densify
each series over its own [min_bin, max_bin] range and linearly
interpolate the missing bins between their nearest present neighbors.

Spark-first shape: the dense axis comes from one explode(sequence()) per
series (no driver-side range generation), the join back to observations
is an equi-join on (series, bin), and neighbor discovery is two
IGNORE-NULLS window passes (last over the preceding frame, first over
the following frame) — one shuffle on the series key total, since the
windows and the join share the partitioning. No Python anywhere.

Interpolation arithmetic is deliberately engine-portable: callers feed
exact-integer aggregates (e.g. floor-scaled micros + counts) so the
derived doubles are correctly-rounded quotients of exact ints, and the
lerp expression is mirrored term-for-term by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_linear(
    df: DataFrame,
    series_col: str,
    bin_col: str,
    value_col: str,
) -> DataFrame:
    """Densify + linearly interpolate.

    ``df`` must hold at most one row per (series, bin) with a numeric
    ``value_col``. Returns (series, bin, value, interpolated) over every
    series' full [min, max] bin range: observed bins pass through,
    interior gaps get prev + (next - prev) * (bin - prev_bin) /
    (next_bin - prev_bin), and (defensively) a one-sided gap extends the
    nearest neighbor — with min/max both observed that branch never
    fires for interior rows."""
    s, b, v = F.col(series_col), F.col(bin_col), F.col(value_col)
    obs = df.select(s.alias("_s"), b.alias("_b"), v.alias("_v"))

    dense = (
        obs.groupBy("_s")
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select("_s", F.explode(F.sequence("_lo", "_hi")).alias("_b"))
    )
    j = dense.join(obs, ["_s", "_b"], "left")

    w_prev = (
        Window.partitionBy("_s")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("_s")
        .orderBy("_b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    present_bin = F.when(F.col("_v").isNotNull(), F.col("_b"))
    e = j.select(
        "_s",
        "_b",
        "_v",
        F.last("_v", ignorenulls=True).over(w_prev).alias("_pv"),
        F.last(present_bin, ignorenulls=True).over(w_prev).alias("_pb"),
        F.first("_v", ignorenulls=True).over(w_next).alias("_nv"),
        F.first(present_bin, ignorenulls=True).over(w_next).alias("_nb"),
    )
    lerped = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (
        (F.col("_b") - F.col("_pb")) / (F.col("_nb") - F.col("_pb"))
    )
    value = (
        F.when(F.col("_v").isNotNull(), F.col("_v"))
        .when(F.col("_pv").isNull(), F.col("_nv"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .otherwise(lerped)
    )
    return e.select(
        F.col("_s").alias(series_col),
        F.col("_b").alias(bin_col),
        value.alias(value_col),
        F.when(F.col("_v").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias("interpolated"),
    )
