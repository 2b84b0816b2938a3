"""k-means: objective decreases, assignments are total and deterministic,
clusters feed the IVF search path."""

from __future__ import annotations

from micromegas_spark.operators.clustering import inertia, kmeans
from micromegas_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_kmeans_objective_and_determinism(spark):
    e = load_table(spark, SF_SMOKE, "embeddings").cache()
    a1, c1 = kmeans(e, k=6, max_iter=1)
    a3, c3 = kmeans(e, k=6, max_iter=4)
    assert a3.count() == e.count()
    # more iterations never worsen the objective
    assert inertia(a3) <= inertia(a1) + 1e-9
    # deterministic: same inputs → same assignments
    a3b, c3b = kmeans(e, k=6, max_iter=4)
    assert c3 == c3b
    assert sorted(map(tuple, a3.collect())) == sorted(map(tuple, a3b.collect()))
    # clusters are a partition of the ids into ≤ k groups
    clusters = {r.cluster for r in a3.select("cluster").distinct().collect()}
    assert clusters <= set(range(6)) and len(clusters) >= 2


def test_kmeans_centroids_feed_ivf(spark):
    from micromegas_spark.operators.similarity import ivf_topk

    e = load_table(spark, SF_SMOKE, "embeddings")
    assigned, _ = kmeans(e, k=5, max_iter=3)
    clustered = e.join(assigned.select("vec_id", "cluster"), "vec_id")
    out = ivf_topk(clustered, query_id=0, k=5, nprobe=2, cluster_col="cluster")
    rows = out.collect()
    assert len(rows) == 5
    assert all(-1.0 <= r.cos_sim <= 1.0 for r in rows)


def test_sq8_quantize_roundtrip(spark):
    """Dequantized values stay within half a quantization step of the
    input; constant vectors reconstruct exactly."""
    import pandas as pd
    from pyspark.sql import functions as F

    from micromegas_spark.operators.similarity import scalar_quantize

    rows = [(1, [0.0, 1.0, 2.0, 4.0]), (2, [3.0, 3.0, 3.0, 3.0])]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = {r["vec_id"]: r for r in scalar_quantize(df).collect()}
    r1 = out[1]
    step = r1["span"] / 255.0
    recon = [r1["mn"] + c * step for c in r1["codes"]]
    for x, xhat in zip([0.0, 1.0, 2.0, 4.0], recon):
        assert abs(x - xhat) <= step / 2 + 1e-12
    r2 = out[2]
    assert r2["span"] == 0.0 and all(c == 0 for c in r2["codes"])
    assert r2["mn"] == 3.0


def test_sq8_topk_recall(spark):
    """SQ8 asymmetric top-10 must recover most of the exact float top-10
    (8-bit quantization error is far below typical neighbor gaps)."""
    from micromegas_spark.operators.similarity import cosine_topk, sq8_topk
    from micromegas_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    exact = {r["vec_id"] for r in cosine_topk(e, query_id=0, k=10).collect()}
    sq8 = {r["vec_id"] for r in sq8_topk(e, query_id=0, k=10).collect()}
    assert len(exact & sq8) >= 6


def test_pq_topk_better_than_random_and_deterministic(spark):
    """PQ(m=4, 8 label codewords) is a coarse quantizer: winners must
    score well above the corpus average under the EXACT dot product
    (better-than-random retrieval), and the ranking must be stable under
    repartitioning. (Exact-top-k recall is a codebook-quality property,
    not a mechanism property — the oracle query pins the mechanism.)"""
    from pyspark.sql import functions as F

    from micromegas_spark.operators.similarity import pq_label_topk
    from micromegas_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("_qv"))
    dot = F.aggregate(
        F.zip_with("embedding", "_qv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda a, x: a + x,
    )
    dots = e.where("vec_id <> 0").crossJoin(F.broadcast(q)).select(
        "vec_id", dot.alias("d")
    ).cache()
    pq = [r["vec_id"] for r in pq_label_topk(e, query_id=0, k=10, m=4).collect()]
    mean_all = dots.agg(F.avg("d")).collect()[0][0]
    mean_pq = dots.where(F.col("vec_id").isin(pq)).agg(F.avg("d")).collect()[0][0]
    assert mean_pq > mean_all + 0.02
    pq2 = [r["vec_id"] for r in
           pq_label_topk(e.repartition(13), query_id=0, k=10, m=4).collect()]
    assert pq == pq2


def test_lsh_partitioned_ann_prunes(spark, tmp_path):
    """SCALE.md's 'bucketed LSH read prunes' made real: the corpus is
    hive-partitioned by sign-LSH bucket; the bucket filter must appear in
    the scan's PartitionFilters (directory pruning, not row filtering),
    and results must equal the in-memory lsh_ann_topk."""
    from pyspark.sql import functions as F

    from micromegas_spark.operators.similarity import (
        DEFAULT_LSH_DIMS,
        lsh_ann_topk,
        lsh_ann_topk_pruned,
        sign_bucket,
        write_lsh_partitioned,
    )
    from micromegas_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "emb_lsh")
    write_lsh_partitioned(e, path)
    qrow = e.where(F.col("vec_id") == 0).select(
        "embedding", sign_bucket(F.col("embedding"), DEFAULT_LSH_DIMS).alias("b")
    ).collect()[0]
    out = lsh_ann_topk_pruned(
        spark, path, qrow["embedding"], qrow["b"], k=10, exclude_id=0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan.replace("#", "").replace(
        "bucket)", "bucket"
    ) or "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:80]
    got = [(r["vec_id"], r["cos_sim"]) for r in out.collect()]
    expect = [
        (r["vec_id"], r["cos_sim"])
        for r in lsh_ann_topk(e, query_id=0, k=10).collect()
        if r["vec_id"] != 0
    ]
    assert got == expect


def test_semdedup_drops_planted_near_duplicate(spark):
    """Two clusters of well-separated vectors; one pair inside a cluster
    is near-identical → exactly the centroid-closer member drops."""
    import numpy as np

    from micromegas_spark.operators.clustering import semdedup

    rng = np.random.default_rng(7)
    rows = []
    # two spatial clusters at ±3 in dim 0 — far enough to cluster, small
    # enough that intra-cluster cosines stay well under the threshold
    # (a dominant shared spike would make ALL members near-parallel)
    for i in range(20):
        v = rng.normal(0, 1, 8)
        v[0] = 3.0 if i < 10 else -3.0
        rows.append((i, [float(x) for x in v]))
    # plant a near-duplicate of vector 0 inside cluster A
    dup = list(rows[0][1])
    dup[1] += 1e-3
    rows.append((100, dup))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: (r["cluster"], r["keep"])
           for r in semdedup(df, k=2, threshold=0.95, max_iter=4).collect()}
    assert len(out) == 21
    # the planted pair shares a cluster; exactly one of the two dropped
    assert out[0][0] == out[100][0]
    assert {out[0][1], out[100][1]} == {True, False}
    # everything else survives (random gaussians don't hit cos >= 0.95)
    dropped = [i for i, (_, kp) in out.items() if not kp]
    assert len(dropped) == 1 and dropped[0] in (0, 100)


def test_semdedup_oversized_cluster_passthrough(spark):
    """Clusters above max_cluster_size skip pruning entirely (keep=True)
    instead of building a |c|^2 matrix — the explicit-cap contract."""
    import numpy as np

    from micromegas_spark.operators.clustering import semdedup

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 4)]) for i in range(30)]
    rows.append((100, list(rows[0][1])))  # exact dup that WOULD be pruned
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = semdedup(df, k=1, threshold=0.99, max_iter=1, max_cluster_size=10)
    assert out.count() == 31
    assert out.where(~out.keep).count() == 0  # nothing pruned: over the cap


def test_mmr_rerank_defers_redundant_neighbor(spark):
    """MMR's defining property: with two near-identical top candidates,
    the second is deferred in favor of a diverse lower-relevance one."""
    from micromegas_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),          # query
        (1, [0.99, 0.14, 0.0, 0.0]),        # most relevant
        (2, [0.985, 0.17, 0.0, 0.0]),       # near-duplicate of 1
        (3, [0.7, 0.0, 0.71, 0.0]),         # less relevant, diverse
        (4, [0.7, 0.0, 0.0, 0.71]),         # less relevant, diverse
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    out = mmr_rerank(df, query_id=0, k=3, pool_n=4, lam=0.5).orderBy("rank").collect()
    order = [r["vec_id"] for r in out]
    assert order[0] == 1                      # pure relevance first
    assert order[1] in (3, 4)                 # diversity beats the near-dup
    assert 2 not in order[:2]
    # plain relevance ranking would have put 2 second
    assert len(out) == 3 and all(out[i]["rank"] == i + 1 for i in range(3))
