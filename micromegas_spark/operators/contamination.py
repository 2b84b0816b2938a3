"""Benchmark-contamination screening: n-gram overlap between a training
corpus and a (much smaller) held-out evaluation/benchmark set.

Standard decontamination (GPT-3 appendix C; Dodge et al. 2021 C4 audit)
flags a training document when it shares any long-enough word n-gram with
any benchmark document. Semantics here:

    corpus ⨝ benchmark on distinct word n-grams
    → per corpus doc: #shared distinct n-grams, #benchmark docs hit

Shape at scale: the benchmark side is eval sets — MBs, not TBs — so its
exploded distinct n-gram table broadcasts and the 100 TB corpus side
streams through a map-side hash join with NO shuffle of corpus text. Only
the per-doc count aggregation shuffles, keyed on doc id, after the join
has already discarded every non-overlapping gram. Set ``broadcast_bench=
False`` if the benchmark side ever outgrows the broadcast limit (falls
back to a plain shuffled equi-join on the gram hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from micromegas_spark.operators.text import word_shingles


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(corpus doc_id, n_shared_grams, n_bench_docs) for every corpus doc
    sharing ≥1 distinct word n-gram with the benchmark set.

    ``word_shingles`` (distinct word n-grams, whole-text fallback for short
    docs) keeps both sides' gram sets identical to the dedup operators', so
    one definition serves dedup and decontamination."""
    from micromegas_spark.operators.util import spread

    bid = bench_id_col or id_col
    c_grams = spread(corpus).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("g")
    )
    b_grams = benchmark.select(
        F.col(bid).alias("_bench_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("g"),
    )
    if broadcast_bench:
        b_grams = F.broadcast(b_grams)
    return (
        c_grams.join(b_grams, "g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("g").alias("n_shared_grams"),
            F.countDistinct("_bench_id").alias("n_bench_docs"),
        )
    )
