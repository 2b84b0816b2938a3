"""As-of join — the time-series join Spark lacks as a built-in
(SURVEY §2.3 J6: absent in the reference too; named by the project brief
as a custom-operator target).

Semantics (backward as-of): for every left row, attach the single right
row with the same key and the greatest right.time ≤ left.time.

Spark-first implementation — the union-window composition, NOT a pandas
merge_asof: tag both sides, union, and take ``last(right value ignoring
nulls)`` over a (key)-partitioned window ordered by (time, side, tie).
One shuffle on the key, sort within partitions, no Python. This is the
scale-correct shape: a naive range join would be O(n·m) per key, and
merge_asof via applyInPandas would force both sides through Arrow.

Ties: a right row at exactly left.time matches (≤); among equal-time right
rows the one with the greatest tie-breaker column wins. Deterministic for
the DuckDB oracle (queries/core.events_asof_join mirrors the same union-
window SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    right_value_cols: list[str],
    tie_col: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join. Returns all left columns plus
    ``right_value_cols`` (NULL when no right row precedes).

    ``tolerance``: maximum allowed left.time − right.time (same unit as
    time_col); matches older than that become NULL."""
    lcols = left.columns
    # The match is carried as ONE struct of (right time + all value cols),
    # null only for left-side rows: a single last(ignorenulls) then always
    # references one right row, even when individual right value columns
    # are NULL (per-column last() could mix columns from different rows).
    r_struct = F.struct(
        F.col(time_col).alias("_rt"),
        *[F.col(c).alias(c) for c in right_value_cols],
    )
    r_struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    # side 0 = right (sorts before left at equal time → inclusive ≤ match)
    r_tagged = right.select(
        *key_cols,
        F.col(time_col).alias("_t"),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in key_cols],
    )
    l_tagged = left.select(
        *key_cols,
        F.col(time_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        *[F.col(c) for c in lcols if c not in key_cols],
    )
    tie = (
        [F.col("_r").getField(tie_col)]
        if tie_col and tie_col in right_value_cols
        else []
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t"), F.col("_side"), *tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = r_tagged.unionByName(l_tagged).select(
        *key_cols,
        "_t",
        "_side",
        *[F.col(c) for c in lcols if c not in key_cols],
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    out = matched.where(F.col("_side") == 1)
    m_t = F.col("_m").getField("_rt")
    keep: list[Column] = [F.col(c) for c in key_cols]
    keep += [F.col("_t").alias(time_col)]
    keep += [F.col(c) for c in lcols if c not in key_cols and c != time_col]
    in_tol = (F.col("_t") - m_t) <= tolerance if tolerance is not None else F.lit(True)
    keep += [
        F.when(in_tol, F.col("_m").getField(c)).alias(f"{c}_asof")
        for c in right_value_cols
    ]
    keep += [F.when(in_tol, F.col("_t") - m_t).alias("asof_gap")]
    return out.select(*keep)
