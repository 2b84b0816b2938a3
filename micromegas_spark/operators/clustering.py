"""Iterative clustering: Lloyd's k-means over embedding columns.

The 'iterative algorithm' capability class (driver loop of declarative
jobs): each iteration is one assignment pass (map-side distance argmin
against driver-broadcast centroids — no join, no shuffle) plus one centroid
recomputation ((cluster, dim)-keyed aggregate with map-side combine, so the
shuffle carries ≤ partitions·k·dim rows). Centroids are tiny (k × dim
doubles) so they round-trip through the driver — the classic Spark
iterative shape. The input is persisted for the duration of the loop.

Assignment is a vectorized pandas UDF: per Arrow batch, one NumPy matmul
against the broadcast centroid matrix (‖x‖² − 2·X·Cᵀ + ‖c‖², clamped at 0)
— one pass per batch regardless of k, vs k CodegenFallback higher-order
folds (which Spark does not common-subexpression-eliminate).

Deterministic: init = farthest-point (k-center) over a hash-ordered sample
(one TakeOrdered job, then a driver-side NumPy sweep): the seed is the
lowest-id sampled vector, each next centroid maximizes its distance to the
chosen set. np.argmin breaks distance ties toward the lower cluster index.
Output feeds ivf_topk as a trained coarse quantizer.
"""

from __future__ import annotations

from micromegas_spark.cachereg import track

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(df: DataFrame, centroids: list[list[float]], id_col: str, vec_col: str) -> DataFrame:
    """[id_col, vec_col, cluster, sq_dist]: argmin squared distance to the
    driver-broadcast centroid matrix, evaluated batch-at-a-time via NumPy."""
    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf("struct<cluster:int, sq_dist:double>")
    def assign_udf(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"cluster": pd.array([], dtype="int32"),
                                 "sq_dist": pd.array([], dtype="float64")})
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        D = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
        np.maximum(D, 0.0, out=D)
        idx = D.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": idx.astype("int32"), "sq_dist": D[np.arange(len(idx)), idx]}
        )

    # identical PythonUDF expressions are deduplicated into one Arrow eval
    a = assign_udf(F.col(vec_col))
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        a["cluster"].alias("cluster"),
        a["sq_dist"].alias("sq_dist"),
    )


def _farthest_point_init(
    df: DataFrame, k: int, id_col: str, vec_col: str, sample_size: int = 4096
) -> list[list[float]]:
    """Farthest-point init over a deterministic hash-ordered sample.

    One Spark job (TakeOrdered by md5(id) — a fixed pseudo-random order,
    so the sample is stable and distribution-independent of the id
    assignment; md5 rather than xxhash64 so external engines can mirror
    the exact sample, which keeps the unrolled DuckDB oracle valid even
    when the table outgrows the sample); the k-center sweep then runs
    driver-side in NumPy over ≤ ``sample_size`` vectors. This is the
    k-means‖-style 'oversample then refine locally' shape — init cost
    does not grow with the table."""
    # toPandas, not collect: the sample is sample_size × dim floats — the
    # Arrow path moves it in columnar batches instead of py4j row objects
    pdf = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(max(sample_size, k))
        .toPandas()
    )
    if len(pdf) == 0:
        return []
    pdf = pdf.sort_values(id_col)  # lowest id first ⇒ deterministic seed point
    X = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
    cents = [0]
    d = ((X - X[0]) ** 2).sum(axis=1)
    for _ in range(min(k, len(X)) - 1):
        far = int(d.argmax())  # argmax ties break toward the lower position
        if d[far] <= 0.0:
            break  # every remaining sample point coincides with a centroid
        cents.append(far)
        d = np.minimum(d, ((X - X[far]) ** 2).sum(axis=1))
    return [[float(x) for x in X[i]] for i in cents]


def kmeans(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Returns (assignments DataFrame [id_col, cluster, sq_dist], final
    centroids). Centroid recomputation is exact (mean of members)."""
    # NOT spread before the persist, deliberately (r11 A/B): widening the
    # single-split embeddings scan to core width measured 1.33 -> 2.20 s
    # on emb_kmeans — the vector-array repartition exchange plus 32-task
    # scheduling per iteration round costs more than the 2-task
    # starvation; the per-round jobs are latency-, not compute-bound at
    # bench scale (at 100 TB the scan has >= cores splits natively).
    df = df.select(id_col, vec_col).persist()
    try:
        centroids = _farthest_point_init(df, k, id_col, vec_col)
        for _ in range(max_iter):
            assigned = _assign(df, centroids, id_col, vec_col)
            new_rows = (
                assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("dim", "x"))
                .groupBy("cluster", "dim")
                .agg(F.avg(F.col("x").cast("double")).alias("c"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
                .select("cluster", F.col("dc.c").alias("cvec"))
                .collect()
            )
            new_centroids = list(centroids)
            for r in new_rows:
                new_centroids[r["cluster"]] = [float(x) for x in r["cvec"]]
            if new_centroids == centroids:
                break
            centroids = new_centroids

    finally:
        df.unpersist()
    # final assignment against the converged centroids; lazy, so a caller
    # collecting it pays one source scan + one assignment pass
    final = _assign(df, centroids, id_col, vec_col).drop(vec_col)
    return final, centroids


def inertia(assignments: DataFrame) -> float:
    """Σ sq_dist — the k-means objective."""
    return assignments.agg(F.sum("sq_dist")).collect()[0][0]


def semdedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.7,
    max_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering then within-cluster cosine
    pruning. A vector is DROPPED iff some same-cluster vector is
    cosine-similar above ``threshold`` AND more keepable — farther from
    the centroid (the paper keeps low-centroid-similarity examples to
    preserve diversity), ties broken toward the smaller id. Output:
    (id, cluster, keep).

    Scale shape — this is WHY SemDeDup clusters first: the O(n²) cosine
    comparison is confined to clusters (k grows with the corpus, cluster
    size stays bounded), so the pair space is Σ|cluster|² not |corpus|².
    The pruning is the paper's per-cluster gram matrix: applyInPandas
    groups on the cluster id, so each vector shuffles ONCE (a pair join
    would duplicate every vector per pair — measured 3 GB shuffled vs
    2 MB on 5k×64f vectors), and the O(|c|²·dim) work is a NumPy matmul
    per cluster, the exact memory contract the paper's clustering step
    exists to guarantee. The memory contract is ENFORCED, not assumed:
    clusters above ``max_cluster_size`` pass through unpruned (keep=True)
    instead of OOMing a worker on a |c|² matrix — the same explicit-cap
    pattern as the LSH bucket guard. At corpus scale k must grow with n
    (the paper sizes clusters to ~thousands); the cap converts a
    mis-sized k into a visible no-op, never a crash."""
    import numpy as np
    import pandas as pd

    assigned, _ = kmeans(df, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col)
    # persisted: the assigned relation is consumed THREE times below (the
    # oversized-cluster count, the passthrough semi-join, and the pruned
    # anti-join side) and its lineage contains the Python assign UDF over
    # every embedding — without the persist that UDF stage executes once
    # per consumer (measured: 7 ArrowEvalPython nodes in the final plan;
    # guide §1.2/§4 — don't pay the Python boundary twice for one result)
    a = (
        assigned.join(df.select(id_col, vec_col), id_col)
        .select(F.col(id_col), F.col("cluster").cast("int"), "sq_dist", F.col(vec_col))
        .persist()
    )
    track(a)
    # EAGER: the oversized-cluster broadcast subquery races the two join
    # consumers for the lazy cache's first materialization (measured four
    # racing assign-UDF jobs in one emb_semdedup run — the nb_classify
    # race); one count materializes the assign stage once
    a.count()
    oversized = (
        a.groupBy("cluster")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_cluster_size)
        .select("cluster")
    )
    passthrough = (
        a.join(F.broadcast(oversized), "cluster", "left_semi")
        .select(id_col, "cluster", F.lit(True).alias("keep"))
    )
    a = a.join(F.broadcast(oversized), "cluster", "left_anti")

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.sqrt((V * V).sum(axis=1))
        cos = (V @ V.T) / np.outer(nrm, nrm)
        d = pdf["sq_dist"].to_numpy()
        ids = pdf[id_col].to_numpy()
        # keepable[i, j]: j survives over i — farther from the centroid,
        # ties toward the smaller id
        kb = (d[None, :] > d[:, None]) | (
            (d[None, :] == d[:, None]) & (ids[None, :] < ids[:, None])
        )
        sim = cos >= threshold
        np.fill_diagonal(sim, False)
        dropped = (sim & kb).any(axis=1)
        return pd.DataFrame(
            {id_col: ids, "cluster": pdf["cluster"].to_numpy(), "keep": ~dropped}
        )

    id_t = df.schema[id_col].dataType.simpleString()
    pruned = a.groupBy("cluster").applyInPandas(
        prune, schema=f"{id_col} {id_t}, cluster int, keep boolean"
    )
    return pruned.unionByName(passthrough)
