"""Histogram aggregate suite.

Reference: rust/datafusion-extensions/src/histogram/
  - histogram_udaf.rs / accumulator.rs — make_histogram(start, end, nb_bins, v)
    → Struct{start, end, min, max, sum, sum_sq, count, bins: List<UInt64>};
    every non-null value updates min/max/sum/sum_sq/count, and its bin index
    floor((v-start)/width) is clamped to [0, nb_bins-1] (accumulator.rs:120-131).
  - sum_histograms_udaf.rs — bin-wise re-aggregable merge (accumulator.rs:135-180).
  - quantile.rs — rank interpolation within the first bin where the cumulative
    count reaches count*ratio (quantile.rs:15-41; falls back to `end`).
  - variance.rs — sample variance ((sum_sq/n - mean²) · n/(n-1)).
  - accessors.rs — count/sum extraction.
  - expand.rs — histogram → rows (bin_center, count).

Spark-first design: ``histogram_agg`` is not a row-at-a-time UDAF but a
composition of native aggregate expressions (conditional per-bin counts +
min/max/sum/count), so it runs inside whole-stage codegen with map-side
partial aggregation — the property that makes it re-aggregable across the
reference's extract/merge materialization phases (SURVEY §2.4 A2/A5) and
shuffle-light at 100 TB. Accessors are pure Column expressions over the
struct. Nothing here leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bin_index(v: Column, start: float, end: float, nb_bins: int) -> Column:
    """floor((v-start)/width) clamped to [0, nb_bins-1] (accumulator.rs:127-129)."""
    width = (end - start) / nb_bins
    return F.least(
        F.greatest(F.floor((v - F.lit(float(start))) / F.lit(width)), F.lit(0.0)),
        F.lit(float(nb_bins - 1)),
    ).cast("int")


def histogram_agg(v: Column, start: float, end: float, nb_bins: int) -> Column:
    """Aggregate expression producing the reference's histogram struct.

    Usage: ``df.groupBy(...).agg(histogram_agg(F.col("x"), 0, 100, 20).alias("h"))``.

    bins[i] is a conditional count — Catalyst compiles nb_bins parallel
    count-if aggregates, each map-side combinable. For very large nb_bins
    (>~1000) prefer the two-phase SQL shape (queries/core.py
    lineitem_histogram_bins) which shuffles (group, bin) pairs instead.
    """
    idx = bin_index(v, start, end, nb_bins)
    bins = F.array(
        *[F.count(F.when((idx == i) & v.isNotNull(), 1)) for i in range(nb_bins)]
    )
    return F.struct(
        F.lit(float(start)).alias("start"),
        F.lit(float(end)).alias("end"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.sum(v).alias("sum"),
        F.sum(v * v).alias("sum_sq"),
        F.count(v).alias("count"),
        bins.alias("bins"),
    )


def sum_histograms(h: Column, nb_bins: int) -> Column:
    """Re-aggregable merge of histogram structs as a single aggregate
    expression (sum_histograms_udaf.rs): elementwise bin sums +
    min/max/sum/sum_sq/count recombination.

    Spark has no native 'elementwise array sum' aggregate, but with a
    statically-known bin count each position is one map-side-combinable
    SUM(element_at(...)) — the same conditional-aggregate trick as
    histogram_agg, so the merge composes with groupBy/AQE like any other
    agg. For unknown/huge bin counts use merge_histograms() (exploded
    two-shuffle shape). Usage::

        df.groupBy(...).agg(sum_histograms(F.col("h"), 20).alias("h"))
    """
    bins = F.array(
        *[F.sum(F.element_at(h.getField("bins"), i + 1)) for i in range(nb_bins)]
    )
    return F.struct(
        F.first(h.getField("start")).alias("start"),
        F.first(h.getField("end")).alias("end"),
        F.min(h.getField("min")).alias("min"),
        F.max(h.getField("max")).alias("max"),
        F.sum(h.getField("sum")).alias("sum"),
        F.sum(h.getField("sum_sq")).alias("sum_sq"),
        F.sum(h.getField("count")).alias("count"),
        bins.alias("bins"),
    )


def merge_histograms(df: DataFrame, hist_col: str, group_cols: list[str]) -> DataFrame:
    """DataFrame-level sum_histograms: merges one histogram struct per input
    row into one per group (sum_histograms_udaf.rs semantics; incompatible
    start/end/nb_bins raise at runtime in the reference — here the caller
    guarantees compatibility, as the merge query contract does,
    sql_batch_view.rs:170-175).

    Scale shape: posexplode(bins) → (group, bin_idx) partial sums → rebuild
    array with array_agg sorted by position. Two shuffles on small
    pre-aggregated data; no Python.
    """
    h = F.col(hist_col)
    scalars = df.groupBy(*group_cols).agg(
        F.first(h.getField("start")).alias("start"),
        F.first(h.getField("end")).alias("end"),
        F.min(h.getField("min")).alias("min"),
        F.max(h.getField("max")).alias("max"),
        F.sum(h.getField("sum")).alias("sum"),
        F.sum(h.getField("sum_sq")).alias("sum_sq"),
        F.sum(h.getField("count")).alias("count"),
    )
    exploded = df.select(*group_cols, F.posexplode(h.getField("bins")).alias("pos", "cnt"))
    bins = (
        exploded.groupBy(*group_cols, "pos")
        .agg(F.sum("cnt").alias("cnt"))
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cnt"))).alias("pc"))
        .select(*group_cols, F.col("pc.cnt").alias("bins"))
    )
    joined = scalars.join(bins, group_cols)
    return joined.select(
        *group_cols,
        F.struct("start", "end", "min", "max", "sum", "sum_sq", "count", "bins").alias(hist_col),
    )


# ---------------------------------------------------------------------------
# Accessors (scalar, pure Column expressions over the struct)
# ---------------------------------------------------------------------------


def count_from_histogram(h: Column) -> Column:
    """accessors.rs: total count."""
    return h.getField("count")


def sum_from_histogram(h: Column) -> Column:
    """accessors.rs: total sum."""
    return h.getField("sum")


def variance_from_histogram(h: Column) -> Column:
    """Sample variance ((sum_sq/n − mean²)·n/(n−1)) — variance.rs:11-14."""
    n = h.getField("count").cast("double")
    mean = h.getField("sum") / n
    return (h.getField("sum_sq") / n - mean * mean) * (n / (n - F.lit(1.0)))


def quantile_from_histogram(h: Column, ratio: Column | float) -> Column:
    """Rank interpolation within the first bin whose cumulative count reaches
    count*ratio, skipping empty bins; falls back to `end` (quantile.rs:15-41):

        estimate = (1-r)·bin_begin + r·bin_end,
        r = (count·ratio − cum_before) / bin_count

    Pure higher-order-function expression (aggregate over zipped
    (bin, index)), evaluated per row JVM-side.
    """
    r = F.lit(ratio) if not isinstance(ratio, Column) else ratio
    # acc: struct(cum BIGINT, found INT, cum_before BIGINT)
    zipped = F.arrays_zip(
        h.getField("bins").alias("b"),
        F.sequence(F.lit(0), F.size(h.getField("bins")) - 1).alias("i"),
    )
    target = h.getField("count").cast("double") * r
    init = F.struct(
        F.lit(0).cast("bigint").alias("cum"),
        F.lit(-1).alias("found"),
        F.lit(0).cast("bigint").alias("cum_before"),
    )

    def step(acc, x):
        bin_cnt = x.getField("b").cast("bigint")
        idx = x.getField("i").cast("int")
        new_cum = acc.getField("cum") + bin_cnt
        hit = (new_cum.cast("double") >= target) & (bin_cnt > 0)
        return F.when(acc.getField("found") >= 0, acc).otherwise(
            F.when(
                hit,
                F.struct(
                    new_cum.alias("cum"), idx.alias("found"), acc.getField("cum").alias("cum_before")
                ),
            ).otherwise(
                F.struct(new_cum.alias("cum"), F.lit(-1).alias("found"), F.lit(0).cast("bigint").alias("cum_before"))
            )
        )

    acc = F.aggregate(zipped, init, step)
    nb = F.size(h.getField("bins")).cast("double")
    width = (h.getField("end") - h.getField("start")) / nb
    found = acc.getField("found").cast("double")
    bin_begin = h.getField("start") + found * width
    bin_end_ = h.getField("start") + (found + 1.0) * width
    bin_cnt = F.element_at(h.getField("bins"), acc.getField("found") + 1).cast("double")
    bucket_ratio = (target - acc.getField("cum_before").cast("double")) / bin_cnt
    estimate = (F.lit(1.0) - bucket_ratio) * bin_begin + bucket_ratio * bin_end_
    return F.when(acc.getField("found") >= 0, estimate).otherwise(h.getField("end"))


def expand_histogram(df: DataFrame, hist_col: str, extra_cols: list[str] | None = None) -> DataFrame:
    """UDTF expand_histogram(h) → rows (bin_center DOUBLE, count BIGINT)
    (expand.rs; SURVEY §2.4 A7). posexplode + center arithmetic."""
    h = F.col(hist_col)
    nb = F.size(h.getField("bins")).cast("double")
    width = (h.getField("end") - h.getField("start")) / nb
    out = df.select(
        *(extra_cols or []),
        h.getField("start").alias("_start"),
        width.alias("_width"),
        F.posexplode(h.getField("bins")).alias("_pos", "count"),
    )
    return out.select(
        *(extra_cols or []),
        (F.col("_start") + (F.col("_pos").cast("double") + 0.5) * F.col("_width")).alias("bin_center"),
        "count",
    )


_HIST_T = (
    "STRUCT<start:DOUBLE,end:DOUBLE,min:DOUBLE,max:DOUBLE,sum:DOUBLE,"
    "sum_sq:DOUBLE,count:BIGINT,bins:ARRAY<BIGINT>>"
)


def register(spark: SparkSession) -> None:
    # histogram struct functions are Column/DataFrame-level APIs; the SQL
    # spellings of the scalar accessors (functions-reference.md:886+) are
    # registered as SQL macros over the struct — pure expressions, JVM-side
    try:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION variance_from_histogram(h {_HIST_T}) "
            "RETURNS DOUBLE RETURN (h.sum_sq/h.count - (h.sum/h.count)*(h.sum/h.count)) * (cast(h.count as double)/(h.count - 1))"
        )
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION count_from_histogram(h {_HIST_T}) "
            "RETURNS BIGINT RETURN h.count"
        )
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION sum_from_histogram(h {_HIST_T}) "
            "RETURNS DOUBLE RETURN h.sum"
        )
        # quantile: the SAME fold as the Python quantile_from_histogram
        # above (quantile.rs:15-41 rank interpolation, empty bins skipped,
        # falling back to `end`) so both spellings agree bit-for-bit
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION quantile_from_histogram(h {_HIST_T}, ratio DOUBLE) "
            "RETURNS DOUBLE RETURN aggregate("
            " h.bins,"
            " named_struct('cum', cast(0 as bigint), 'idx', 0, 'found', -1,"
            "              'cum_before', cast(0 as bigint)),"
            " (acc, b) -> CASE WHEN acc.found >= 0 THEN acc ELSE named_struct("
            "   'cum', acc.cum + b,"
            "   'idx', acc.idx + 1,"
            "   'found', CASE WHEN cast(acc.cum + b as double) >= ratio * cast(h.count as double)"
            "                     AND b > 0 THEN acc.idx ELSE -1 END,"
            "   'cum_before', CASE WHEN cast(acc.cum + b as double) >= ratio * cast(h.count as double)"
            "                       AND b > 0 THEN acc.cum ELSE cast(0 as bigint) END) END,"
            " acc -> CASE WHEN acc.found < 0 THEN h.end ELSE"
            "   (1.0d - (ratio * cast(h.count as double) - cast(acc.cum_before as double))"
            "          / cast(element_at(h.bins, acc.found + 1) as double))"
            "   * (h.start + cast(acc.found as double) * (h.end - h.start) / cast(size(h.bins) as double))"
            "   + ((ratio * cast(h.count as double) - cast(acc.cum_before as double))"
            "          / cast(element_at(h.bins, acc.found + 1) as double))"
            "   * (h.start + (cast(acc.found as double) + 1.0d) * (h.end - h.start) / cast(size(h.bins) as double))"
            " END)"
        )
    except Exception:
        pass
