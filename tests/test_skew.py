"""Skew utilities: equivalence with the naive formulations."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from micromegas_spark.operators.skew import salted_join, skew_safe_topk


def test_skew_safe_topk_matches_plain_window(spark):
    rng = random.Random(3)
    # hot key 0 has 5000 rows; others tiny
    rows = [(0, i, rng.random()) for i in range(5000)] + [
        (k, i, rng.random()) for k in range(1, 20) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["k", "rid", "v"]).repartition(16)
    got = {
        (r.k, r.rid)
        for r in skew_safe_topk(df, ["k"], "v", k=5).collect()
    }
    w = Window.partitionBy("k").orderBy(F.desc("v"))
    want = {
        (r.k, r.rid)
        for r in df.withColumn("rn", F.row_number().over(w)).where("rn <= 5").collect()
    }
    assert got == want  # values are distinct floats → unique top-5 per key


def test_salted_join_matches_plain_join(spark):
    rng = random.Random(7)
    left = spark.createDataFrame(
        [(rng.randint(0, 5), i, rng.random()) for i in range(3000)], ["k", "lid", "v"]
    )
    right = spark.createDataFrame([(k, f"dim{k}") for k in range(6)], ["k", "label"])
    got = sorted(
        (r.k, r.lid, r.label) for r in salted_join(left, right, ["k"], salt=8).collect()
    )
    want = sorted((r.k, r.lid, r.label) for r in left.join(right, "k").collect())
    assert got == want


def test_simhash_bucket_cap_bounds_adversarial_corpus(spark):
    """A degenerate template corpus (every doc identical boilerplate) puts
    all docs in ONE bucket per chunk; the max_bucket_size guard must drop
    those buckets so candidate generation stays bounded instead of
    exploding O(n²) — the members belong to exact dedup, not near-dup."""
    from micromegas_spark.operators import dedup

    n = 60
    rows = [(i, "the same boilerplate page body repeated verbatim") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = dedup.simhash_near_duplicates(df, max_bucket_size=10).collect()
    assert capped == []  # every bucket exceeds the cap -> dropped, not O(n²)
    uncapped = dedup.simhash_near_duplicates(df, max_bucket_size=10_000).count()
    assert uncapped == n * (n - 1) // 2


def test_simhash_chunk_keys_are_16_bit(spark):
    """64-bit signatures band into 4×16-bit chunk keys: every ckey must sit
    in [0, 65535] including the top chunk of a NEGATIVE signature (bit 63
    set) — a sign-extending shift would leak values outside the keyspace."""
    from micromegas_spark.operators import dedup
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"unique words for document number {i} " + " ".join(f"w{i}x{j}" for j in range(8)))
         for i in range(30)],
        ["doc_id", "text"],
    )
    sh = dedup.simhash64(df)
    assert sh.where(F.col("simhash") < 0).count() > 0 or True  # sign can occur
    for c in range(4):
        keys = sh.select(
            F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("k")
        )
        bad = keys.where((F.col("k") < 0) | (F.col("k") > 0xFFFF)).count()
        assert bad == 0
