"""K-Minimum-Values (KMV) distinct/overlap sketches.

Corpus-overlap estimation without a join: per side, keep the k smallest
48-bit shingle hashes; merging two sketches estimates each side's distinct
count, the union size, the intersection size, and Jaccard similarity
(Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations", SIGMOD'07). At 100 TB this is THE way to answer "how much do
corpus A and corpus B overlap" — the sketches are a few KB per side and
mergeable, where any join-based answer is output-proportional.

Reference parity: the reference ships mergeable sketch aggregation for
COUNT DISTINCT (HLL partials, SURVEY §2.4 A9); KMV extends the same
partial+final contract to *set algebra* (intersection/Jaccard), which HLL
cannot express losslessly.

Scale shape: the k smallest of N uniform hashes all fall below
~k/N * 2^48, so we (1) distinct the (side, hash) pairs, (2) count each
side, (3) filter to a threshold with 8x slack — a scan-side predicate that
discards ~all rows before any sort — and (4) sort only the tiny survivor
set. A widening loop guards the (astronomically unlikely) case the slack
was not enough, so the result is *exactly* the k smallest, never an
approximation of the sketch itself: the DuckDB oracle recomputes the same
sketch with a plain ORDER BY LIMIT k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from micromegas_spark.operators.text import word_shingles

# 48-bit hash space: int(md5(shingle)[0:12], 16). Exactly representable in
# a double (2^48 < 2^53), so u = h / 2^48 is one exact division on both
# engines.
_SPACE = float(1 << 48)


def kmv_hashes(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as 48-bit md5-derived ints (the KMV
    hash universe; 32 bits would collide at ~80k shingles, 48 bits at ~17M
    per birthday bound — rebuild with more hex digits beyond that)."""
    return F.transform(
        word_shingles(text, n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("bigint"),
    )


def kmv_sketches(pairs: DataFrame, k: int, side_col: str = "side", hash_col: str = "h") -> DataFrame:
    """(side, hash) pairs -> one row per side: sorted array of the k
    smallest DISTINCT hashes (`ks`) plus the side's exact distinct count
    at test scale is NOT required — only the counts used to pick the
    filter threshold, which never reach the result.

    Returns columns: side, ks (array<bigint>, ascending, length
    min(k, n_distinct)).
    """
    d = pairs.select(F.col(side_col).alias("side"), F.col(hash_col).alias("h")).distinct()
    d_cached = d.persist()
    # post-cache coalesce (OPTIMIZATION_r11 #12 pattern): the distinct's
    # shuffle leaves the session's scale partitioning and the persist pins
    # it (AQE cannot coalesce a cached plan's output) — every consumer ran
    # cores*8 near-empty tasks at bench scale. Merging cache blocks ~8:1
    # at read time keeps the distinct itself at full width.
    d = d_cached.coalesce(pairs.sparkSession.sparkContext.defaultParallelism)
    try:
        # per-side distinct counts: one small agg over the distinct relation
        counts = {r["side"]: r["n"] for r in d.groupBy("side").agg(F.count("*").alias("n")).collect()}
        if not counts:
            # empty input: F.coalesce(*[]) below would raise — the empty
            # (side, ks) relation is the correct empty sketch set
            return d.groupBy("side").agg(
                F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("ks")
            )
        slack = 8.0
        for _ in range(4):
            # scan-side threshold per side: keep h < 2^48 * slack*k/n
            thr = {
                s: int(_SPACE) if n <= slack * k else int(_SPACE * (slack * k / n))
                for s, n in counts.items()
            }
            thr_expr = F.coalesce(
                *[F.when(F.col("side") == s, F.lit(t)) for s, t in thr.items()]
            )
            surv = d.where(F.col("h") < thr_expr)
            # ONE aggregate delivers both the slack check and the sketch:
            # the previous count-check + lazily-returned aggregate shape
            # executed the verify count over the cache, then — because the
            # persist is released in the finally below — the CALLER's
            # consumption re-ran the whole distinct chain from the source
            # (measured: a second full md5/explode/distinct pass per query).
            # A sketch is kB-sized BY DESIGN (sides x k x 8 bytes), so
            # collecting it is bounded at any corpus scale; only the k
            # smallest per side cross to the driver.
            surv_agg = surv.groupBy("side").agg(
                F.count("*").alias("_n"),
                F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("ks"),
            )
            rows = surv_agg.collect()
            ok = {r["side"]: r["_n"] for r in rows}
            if all(ok.get(s, 0) >= min(k, n) for s, n in counts.items()):
                import pandas as pd
                from pyspark.sql.types import StructType

                schema = StructType(
                    [surv_agg.schema["side"], surv_agg.schema["ks"]]
                )
                pdf = pd.DataFrame(
                    {"side": [r["side"] for r in rows], "ks": [r["ks"] for r in rows]}
                )
                # coalesce(1): one slice for a sides-bounded sketch table
                # (Arrow createDataFrame otherwise slices it cores-ways)
                return pairs.sparkSession.createDataFrame(pdf, schema).coalesce(1)
            slack *= 8.0  # widen and retry (not expected to trigger)
        # give up on pruning: exact global per-side sort of the distinct set
        return d.groupBy("side").agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("ks"))
    finally:
        d_cached.unpersist()


def kmv_merge_estimates(sketches: DataFrame, k: int, side_a: str = "A", side_b: str = "B") -> DataFrame:
    """Merge the two sides' sketches into one row of estimates.

    distinct(X) ~= (k-1) / u_k where u_k is the k-th smallest hash as a
    fraction of the hash space; union from the combined k smallest of
    A ∪ B; intersection/Jaccard from the fraction of the combined sketch
    present in both sides (the unbiased KMV set-operation estimators).
    Falls back to exact counts when a side has fewer than k distincts.

    Output: k, n_a_est, n_b_est, union_est, inter_est, jaccard_est.
    """
    one = sketches.groupBy().agg(
        F.min(F.when(F.col("side") == side_a, F.col("ks"))).alias("a"),
        F.min(F.when(F.col("side") == side_b, F.col("ks"))).alias("b"),
    )

    def est(arr: Column) -> Column:
        # (k-1)/u_k in the pruned regime; exact size when the whole side fit
        n = F.size(arr)
        u = F.element_at(arr, n) / F.lit(_SPACE)
        return F.when(n >= k, (F.lit(k - 1)) / u).otherwise(n.cast("double"))

    u_arr = F.slice(F.array_sort(F.array_union(F.col("a"), F.col("b"))), 1, k)
    merged = one.select(
        "a",
        "b",
        u_arr.alias("u"),
    )
    kk = F.size(F.col("u"))
    union_est = F.when(
        kk >= k, F.lit(k - 1) / (F.element_at(F.col("u"), kk) / F.lit(_SPACE))
    ).otherwise(kk.cast("double"))
    inter_frac = (
        F.size(
            F.filter(
                F.col("u"),
                lambda x: F.array_contains(F.col("a"), x) & F.array_contains(F.col("b"), x),
            )
        ).cast("double")
        / kk
    )
    return merged.select(
        F.lit(k).cast("bigint").alias("k"),
        F.round(est(F.col("a")), 6).alias("n_a_est"),
        F.round(est(F.col("b")), 6).alias("n_b_est"),
        F.round(union_est, 6).alias("union_est"),
        F.round(inter_frac * union_est, 6).alias("inter_est"),
        F.round(inter_frac, 6).alias("jaccard_est"),
    )
