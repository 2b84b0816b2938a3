"""Iterative clustering: Lloyd's k-means over embedding columns.

The 'iterative algorithm' capability class (driver loop of declarative
jobs): each iteration is one assignment pass (map-side distance argmin
against driver-broadcast centroids — k·dim literals, no join, no shuffle)
plus one centroid recomputation ((cluster, dim)-keyed aggregate). Centroids
are tiny (k × dim doubles) so they round-trip through the driver — the
classic Spark iterative shape.

Deterministic: init = the k lowest-id vectors; ties in argmin break toward
the lower cluster index. Output feeds ivf_topk as a trained coarse
quantizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec, centroid: list[float]):
    lits = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec, lits, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Returns (assignments DataFrame [id_col, cluster, sq_dist], final
    centroids). Centroid recomputation is exact (mean of members)."""
    init_rows = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init_rows]

    assigned = None
    for _ in range(max_iter):
        dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
        assigned = df.select(
            F.col(id_col),
            F.col(vec_col),
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
            F.array_min(dists).alias("sq_dist"),
        )
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

    # final assignment against the converged centroids
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    final = df.select(
        F.col(id_col),
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
        F.array_min(dists).alias("sq_dist"),
    )
    return final, centroids


def inertia(assignments: DataFrame) -> float:
    """Σ sq_dist — the k-means objective."""
    return assignments.agg(F.sum("sq_dist")).collect()[0][0]
