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
