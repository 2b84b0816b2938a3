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
