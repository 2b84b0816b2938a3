"""connected_components / dedup_clusters (operators/graph.py) and
deterministic sampling (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from micromegas_spark.operators.graph import connected_components, dedup_clusters
from micromegas_spark.operators.sampling import (
    hash_sample,
    hash_topk_per_group,
    sample_unit,
    stratified_sample,
)


def _cc_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_connected_components_basic(spark):
    # two clusters {1,2,3,9} and {5,7}; 8 isolated via self-pair absence
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 7)], ["src", "dst"]
    )
    got = _cc_map(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5}


def test_connected_components_chain_converges(spark):
    # a 12-node path: worst case for min-propagation (diameter rounds)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["src", "dst"]
    )
    got = _cc_map(connected_components(edges))
    assert set(got.values()) == {0} and len(got) == 12


def test_dedup_clusters_sizes(spark):
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (40, 50)], ["id_a", "id_b"]
    )
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in
            dedup_clusters(pairs).collect()}
    assert rows == {10: (10, 3), 20: (10, 3), 30: (10, 3), 40: (40, 2), 50: (40, 2)}


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "key")


def test_hash_sample_fraction_and_stability(spark, ids_df):
    s1 = hash_sample(ids_df, 0.25, "key")
    n = s1.count()
    assert 0.18 * 2000 < n < 0.32 * 2000  # binomial tolerance
    # invariant under physical repartitioning (the reason df.sample is out)
    s2 = hash_sample(ids_df.repartition(13), 0.25, "key")
    assert sorted(r["key"] for r in s1.collect()) == sorted(
        r["key"] for r in s2.collect()
    )
    # a different salt draws a (near-)independent sample
    s3 = hash_sample(ids_df, 0.25, "key", salt="v2")
    assert sorted(r["key"] for r in s3.collect()) != sorted(
        r["key"] for r in s1.collect()
    )


def test_sample_unit_range(spark, ids_df):
    mm = ids_df.select(
        F.min(sample_unit(F.col("key"))).alias("lo"),
        F.max(sample_unit(F.col("key"))).alias("hi"),
    ).collect()[0]
    assert 0.0 <= mm["lo"] and mm["hi"] < 1.0


def test_stratified_sample_rates(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b")
        .otherwise("c").alias("grp"),
    )
    out = stratified_sample(df, "grp", {"a": 0.5, "b": 0.1}, key_col="key")
    by = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert 400 < by.get("a", 0) < 600
    assert 60 < by.get("b", 0) < 140
    assert "c" not in by  # default fraction 0.0


def test_hash_topk_per_group(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("grp")
    )
    out = hash_topk_per_group(df, "grp", k=3, key_col="key")
    counts = [r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()]
    assert counts == [3] * 7
    # deterministic under repartitioning
    out2 = hash_topk_per_group(df.repartition(11), "grp", k=3, key_col="key")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_chunk_spans_edges(spark):
    import pytest as _pytest

    from micromegas_spark.operators.text import chunk_spans

    df = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(f"t{i}" for i in range(100)))],
        ["doc_id", "text"],
    )
    rows = chunk_spans(df, chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.token_start, r.token_end))
    # short doc: exactly one chunk covering all its tokens
    assert by_doc[1] == [(0, 0, 3)]
    # 100 tokens, stride 48: chunks start at 0, 48 and cover to min(start+64, 100)
    assert sorted(by_doc[2]) == [(0, 0, 64), (1, 48, 100)]
    with _pytest.raises(ValueError):
        chunk_spans(df, chunk_tokens=16, overlap=16)


def test_sequence_packing_boundaries(spark):
    from micromegas_spark.operators.text import sequence_packing

    # three docs of 300 tokens each in one shard: budget 512 puts doc 0 in
    # seq 0 (starts at 0), doc 1 in seq 0 (starts at 300), doc 2 in seq 1
    # (starts at 600)
    docs = [(i, "s", " ".join("x" * 1 for _ in range(300))) for i in range(3)]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    got = {r.doc_id: r.seq_id for r in sequence_packing(df, budget=512).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_mixture_sample_flattening(spark):
    """T=0.5 mixture: rare domains end up with higher keep rates than
    common ones; expected total ≈ target_fraction·N; deterministic."""
    import pandas as pd

    from micromegas_spark.operators.sampling import mixture_sample

    rows = [(i, "big" if i < 9000 else "small") for i in range(10000)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "dom"]))
    out = mixture_sample(df, "dom", key_col="doc_id", temperature=0.5,
                         target_fraction=0.3).cache()
    n = out.count()
    assert abs(n - 3000) < 300  # ~binomial tolerance
    shares = {r["dom"]: r["n"] for r in
              out.groupBy("dom").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # raw shares 0.9/0.1 → tempered weights sqrt(9000):sqrt(1000) = 3:1;
    # the small domain's KEEP RATE must exceed the big domain's
    rate_small = shares["small"] / 1000
    rate_big = shares["big"] / 9000
    assert rate_small > 2 * rate_big
    # deterministic under repartitioning
    out2 = mixture_sample(df.repartition(7), "dom", key_col="doc_id",
                          temperature=0.5, target_fraction=0.3)
    assert sorted(r["doc_id"] for r in out2.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_mixture_sample_weight_col(spark):
    """Token-budget mixing: n_d from a weight column, not row counts."""
    import pandas as pd

    from micromegas_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 2 == 0 else "b", 100 if i % 2 == 0 else 1)
            for i in range(2000)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "dom", "n_tok"]))
    out = mixture_sample(df, "dom", key_col="doc_id", temperature=0.5,
                         target_fraction=0.5, weight_col="n_tok")
    shares = {r["dom"]: r["n"] for r in
              out.groupBy("dom").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # domain b is tiny by tokens → rate caps at 1.0 → all 1000 b-rows kept
    assert shares["b"] == 1000
    assert shares["a"] < 1000


def test_pagerank_dangling_and_weights(spark):
    """Two-node graph a->b: b is dangling; its rank redistributes
    uniformly. Mirrors the exact recurrence in plain Python."""
    from micromegas_spark.operators.graph import pagerank

    df = spark.createDataFrame([("a", "b", 1.0)], "src string, dst string, w double")
    n_iter, d = 3, 0.85
    ra = rb = 0.5
    for _ in range(n_iter):
        dm = rb  # b has no out-edges
        ra, rb = (
            (1 - d) / 2 + d * (dm / 2),
            (1 - d) / 2 + d * (ra * 1.0 + dm / 2),
        )
    out = {r["node"]: r["rank"] for r in
           pagerank(df, weight="w", damping=d, n_iter=n_iter).collect()}
    assert abs(out["a"] - ra) < 1e-12 and abs(out["b"] - rb) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-9  # total rank conserved


def test_pagerank_weight_split(spark):
    """Weighted transitions: a splits 3:1 between b and c."""
    from micromegas_spark.operators.graph import pagerank

    edges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    out = {r["node"]: r["rank"] for r in
           pagerank(df, weight="w", damping=0.85, n_iter=20).collect()}
    assert out["b"] > out["c"]  # 3x the inbound probability mass
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_distributed_matches_local(spark):
    """local_threshold=0 forces the distributed driver-loop; both
    strategies implement the same recurrence."""
    from micromegas_spark.operators.graph import pagerank

    edges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "d", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    loc = {r["node"]: r["rank"] for r in
           pagerank(df, weight="w", n_iter=5).collect()}
    dist = {r["node"]: r["rank"] for r in
            pagerank(df, weight="w", n_iter=5, local_threshold=0).collect()}
    assert set(loc) == set(dist)
    for v in loc:
        assert abs(loc[v] - dist[v]) < 1e-12


def test_pagerank_zero_weight_edges_are_dangling(spark):
    """A node whose only out-edge has weight 0 is dangling — no division
    by zero locally, no silent rank-mass drain distributed; both paths
    agree and total rank is conserved."""
    from micromegas_spark.operators.graph import pagerank

    edges = [("a", "b", 1.0), ("b", "c", 0.0), ("c", "a", 2.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    loc = {r["node"]: r["rank"] for r in
           pagerank(df, weight="w", n_iter=4).collect()}
    dist = {r["node"]: r["rank"] for r in
            pagerank(df, weight="w", n_iter=4, local_threshold=0).collect()}
    assert set(loc) == {"a", "b", "c"}
    assert abs(sum(loc.values()) - 1.0) < 1e-9
    for v in loc:
        assert abs(loc[v] - dist[v]) < 1e-12
