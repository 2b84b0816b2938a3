"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against a query vector — the
  correctness baseline. One broadcast of the query vector, one map-side
  pass, one TakeOrdered: at 100 TB this is a full scan but no shuffle.
- ``lsh_ann_topk``: sign-LSH bucketed approximate search — hyperplane signs
  (here: fixed coordinate subsets, deterministic and engine-portable) bucket
  the corpus; only the query's bucket is scanned. The scale path: candidate
  generation is a partition-pruned read when the table is written bucketed
  by ``bucket``.
- ``centroids``: per-label mean vectors (posexplode + avg — the IVF
  coarse-quantizer training step).

Dot products stay JVM-side via higher-order functions (zip_with +
aggregate) with explicit float→double casts so results are deterministic
and oracle-comparable.
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument
from micromegas_spark.cachereg import track

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Exact top-k by cosine to the vector with ``query_id``. The query row
    is a 1-row broadcast cross join; ranking is TakeOrderedAndProject (no
    full sort). Ties broken by id for determinism."""
    q = df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("_qv"))
    return (
        df.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            *(extra_cols or []),
            F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched multi-query exact top-k: one corpus scan serves all queries
    (vs one scan per query). The query set broadcasts; ranking is a
    per-query window. At very large query batches the pandas-UDF matmul
    path wins — this is the built-in-operator shape up to ~100s of
    queries."""
    from pyspark.sql import Window

    q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    scored = (
        df.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def sign_bucket(vec: Column, dims: list[int]) -> Column:
    """Deterministic sign-LSH bucket: bit j = (vec[dims[j]] >= 0).
    1-based dims (Spark element_at). Engine-portable: the oracle recomputes
    it with list indexing."""
    out = F.lit(0).cast("bigint")
    for j, d in enumerate(dims):
        out = out + F.when(F.element_at(vec, d) >= 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


DEFAULT_LSH_DIMS = [1, 17, 33, 49]


def lsh_ann_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    dims: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only vectors sharing the query's sign-LSH
    bucket. With the table bucketed/partitioned by the bucket value this
    becomes a pruned read of 1/2^|dims| of the corpus."""
    dims = dims or DEFAULT_LSH_DIMS
    with_b = df.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), dims).alias("bucket")
    )
    q = with_b.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qv"), F.col("bucket").alias("_qb")
    )
    return (
        with_b.where(F.col(id_col) != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("_qb"))
        .select(id_col, F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """IVF-style approximate search: probe the nprobe clusters whose
    centroids are nearest the query, then exact-rank only their members.

    The coarse quantizer here is the per-``cluster_col`` mean (``centroids``)
    — with a trained k-means the pipeline is identical: assign → probe →
    in-cluster scan. At 100 TB, write the table partitioned/bucketed by the
    cluster id and the in-cluster scan becomes a pruned read of
    nprobe/n_clusters of the corpus.

    Fully deterministic (rounded centroid similarity, id tie-breaks), so
    the DuckDB oracle reproduces it exactly (queries/llm.py emb_ivf_topk).
    """
    cent = (
        df.select(F.col(cluster_col), F.posexplode(F.col(vec_col)).alias("dim", "x"))
        .groupBy(cluster_col, "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
        .groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(F.col(cluster_col), F.col("dc.c").alias("cvec"))
    )
    q = df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("_qv"))
    probed = (
        cent.crossJoin(F.broadcast(q))
        .select(
            cluster_col,
            F.round(cosine(F.col("cvec"), F.col("_qv")), 6).alias("csim"),
        )
        .orderBy(F.desc("csim"), F.asc(cluster_col))
        .limit(nprobe)
        .select(cluster_col)
    )
    return (
        df.join(F.broadcast(probed), cluster_col)
        .where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.col(cluster_col),
            F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.9,
    dims: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates restricted to the
    same sign-LSH bucket (near-identical vectors share all hyperplane
    signs with high probability), then exact cosine ≥ threshold.

    The bucket self-join is the same shape as MinHash banding — the pair
    space shrinks from O(n²) to per-bucket; more planes → smaller buckets
    at the cost of recall near the decision boundary.

    Scale shape: a plain shuffled self-join on the bucket key — both sides
    hash-partition on bucket, so each executor only holds its buckets'
    vectors (no unconditional broadcast of the corpus, which would hit the
    8GB broadcast limit at any real scale; AQE may still pick a broadcast
    at runtime when the MEASURED build side is under the threshold, which
    is exactly the safe case). The bucketed relation is persisted so the
    sign-LSH + norm pass runs once, not once per join side. Per-bucket
    pair expansion is the documented memory bound; more LSH planes
    shrink it.

    ``cache=True`` persists the bucketed relation for the result's
    lifetime so the sign-LSH + norm pass runs once, not per join side.
    Spark's CacheManager is plan-keyed, so repeated calls over the SAME
    input reuse one entry; distinct corpora accumulate until the caller
    unpersists or clears the cache — pass cache=False for one-shot
    pipelines that prefer recompute over a pinned corpus-sized cache."""
    from pyspark import StorageLevel

    dims = dims or DEFAULT_LSH_DIMS
    # norms precompute BELOW the join (once per vector, not per pair —
    # per-pair cosine would run three HOF folds; this leaves one dot fold)
    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
        F.sqrt(norm2(F.col(vec_col))).alias("_norm"),
    )
    if cache:
        b = track(b.persist(StorageLevel.MEMORY_AND_DISK))
    a_ = b.alias("a")
    # shuffle_hash: sort-merge would sort rows carrying the full embedding
    # arrays; a hash build per bucket partition skips that (AQE still
    # upgrades to broadcast when the measured side is small enough)
    b_ = b.alias("b").hint("shuffle_hash")
    pairs = (
        a_.join(b_, "bucket")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a._norm") * F.col("b._norm")),
                6,
            ).alias("cos_sim"),
        )
    )
    return pairs.where(F.col("cos_sim") >= threshold)


def centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Per-label mean vector, exploded form: (label, dim, centroid).
    posexplode → one (label, dim)-keyed shuffle of scalars; re-assembly to
    array form is a collect_list sorted by dim when needed."""
    return (
        df.select(F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "x"))
        .groupBy(label_col, "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), round_digits).alias("centroid"))
    )


def scalar_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-vector 8-bit scalar quantization (SQ8): each embedding becomes
    an int code array plus its own (mn, span) dequantization scale —
    4x smaller than float32 at rest, the standard first rung of the
    ANN memory-ladder (SQ8 → PQ → binary). Per-vector scales need no
    training pass, so quantization is a pure map-side projection that
    parallelizes with the scan; constant vectors (span 0) get all-zero
    codes and dequantize back to mn exactly.

        code_i = round(255 · (x_i − mn) / span),  x̂_i = mn + code_i·span/255

    The cast array and the (mn, span) scales are BOUND once via _let
    before the code lambda uses them: HOFs are CodegenFallback with no
    common-subexpression elimination, so a lambda body referencing the
    array_min/max SUBTREES would re-evaluate them per element — O(d²)
    per vector instead of O(d)."""
    from micromegas_spark.operators.text import _let

    def _qstruct(vec: Column) -> Column:
        return _let(
            F.transform(vec, lambda x: x.cast("double")),
            lambda v: _let(
                F.struct(
                    F.array_min(v).alias("mn"),
                    (F.array_max(v) - F.array_min(v)).alias("span"),
                ),
                lambda ms: F.struct(
                    F.when(
                        ms.getField("span") == 0,
                        F.transform(v, lambda x: F.lit(0).cast("int")),
                    )
                    .otherwise(
                        F.transform(
                            v,
                            lambda x: F.round(
                                F.lit(255.0)
                                * (x - ms.getField("mn"))
                                / ms.getField("span")
                            ).cast("int"),
                        )
                    )
                    .alias("codes"),
                    ms.getField("mn").alias("mn"),
                    ms.getField("span").alias("span"),
                ),
            ),
        )

    # explode(array(q)) is a Generate-node BARRIER (same trick as the
    # minhash signature fold): unpacking the struct via three getFields in
    # ONE projection would embed three copies of the whole quantization
    # expression — CodegenFallback HOFs get no subexpression elimination,
    # so the transform/min/max work would run three times per row
    q = _qstruct(F.col(vec_col))
    inner = df.select(
        F.col(id_col), *(extra_cols or []), F.explode(F.array(q)).alias("_q")
    )
    return inner.select(
        F.col(id_col),
        *(extra_cols or []),
        F.col("_q").getField("codes").alias("codes"),
        F.col("_q").getField("mn").alias("mn"),
        F.col("_q").getField("span").alias("span"),
    )


def sq8_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over SQ8 codes: the float query scores
    against dequantized corpus codes (the faiss-style asymmetric scheme —
    only the stored side loses precision). One corpus scan of int codes +
    TakeOrderedAndProject; at 100 TB the working set is the 4x-smaller
    code table, and the scan stays a map-side fold (no shuffle).

    Output: (id, dot8) — dot8 rounded to 6 dp like every similarity
    score here, which also absorbs cross-engine summation-order ulps in
    the oracle comparison."""
    q = df.where(F.col(id_col) == query_id).select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qv")
    )
    c = scalar_quantize(df.where(F.col(id_col) != query_id), id_col, vec_col)
    recon_dot = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("_qv"),
            lambda ci, y: y * (F.col("mn") + (ci * F.col("span")) / F.lit(255.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        c.crossJoin(F.broadcast(q))
        .select(F.col(id_col), F.round(recon_dot, 6).alias("dot8"))
        .orderBy(F.desc("dot8"), F.asc(id_col))
        .limit(k)
    )


def pq_label_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 5,
) -> DataFrame:
    """Product-quantization ANN (the memory-ladder rung under SQ8): split
    each vector into ``m`` subspaces, encode every subvector as its
    nearest per-subspace codeword, then rank by asymmetric distance — the
    query scores against a per-(subspace, code) dot-product lookup table
    of size m·|codes|, never against raw vectors. At 64 dims / m=4 /
    8 codes a vector is 4 bytes at rest (16x vs float32).

    Codebooks here are per-label subvector means (the same
    deterministic 'trained quantizer stand-in' as ``ivf_topk``'s coarse
    quantizer — with k-means-trained codebooks the encode/ADC pipeline is
    unchanged), rounded to ``round_digits`` so the DuckDB oracle
    reproduces code assignment exactly.

    Scale shape: everything is (sub, dim)- or (id, sub)-keyed scalar
    shuffles; encode joins against the broadcast codebook table; ADC is a
    broadcast lookup-table join + per-id sum. The raw corpus is scanned
    once (codebook training) and the search path touches only codes."""
    # exploded (id, label, sub, dim, x) — the shape every stage shares
    e = (
        df.select(
            F.col(id_col),
            F.col(label_col),
            F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
                "dim", "x"
            ),
            F.size(F.col(vec_col)).alias("_d"),
        )
        .withColumn("sub", F.floor(F.col("dim") * m / F.col("_d")).cast("bigint"))
        .drop("_d")
    )
    cb = (
        e.groupBy("sub", F.col(label_col).alias("code"), "dim")
        .agg(F.round(F.avg("x"), round_digits).alias("c"))
    )
    corpus = e.where(F.col(id_col) != query_id)
    dist = (
        corpus.join(F.broadcast(cb), ["sub", "dim"])
        .groupBy(id_col, "sub", "code")
        .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d2"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col, "sub").orderBy("d2", "code")
    enc = (
        dist.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "sub", "code")
    )
    q = e.where(F.col(id_col) == query_id).select("sub", "dim", F.col("x").alias("qx"))
    adc = (
        cb.join(F.broadcast(q), ["sub", "dim"])
        .groupBy("sub", "code")
        .agg(F.sum(F.col("qx") * F.col("c")).alias("dot"))
    )
    return (
        enc.join(F.broadcast(adc), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("dot"), 6).alias("pq_score"))
        .orderBy(F.desc("pq_score"), F.asc(id_col))
        .limit(k)
    )


def write_lsh_partitioned(
    df: DataFrame,
    path: str,
    dims: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus hive-partitioned by its sign-LSH bucket
    (`bucket=<n>/` directories): the physical layout that turns
    ``lsh_ann_topk``'s bucket filter into a partition-PRUNED read — at
    100 TB the query touches 1/2^|dims| of the files, before any row is
    decoded (the ANN analogue of the reference's partition_cache pruning)."""
    dims = dims or DEFAULT_LSH_DIMS
    df.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), dims).alias("bucket")
    ).write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_ann_topk_pruned(
    spark,
    path: str,
    query_vec,
    query_bucket: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """ANN search over an LSH-partitioned corpus: the bucket equality
    lands in the scan's PartitionFilters, so only the query's bucket
    directory is read. ``query_vec`` is a Python list (broadcast as a
    literal array), so the search itself never scans for the query row;
    pass ``exclude_id`` when the query vector is itself a corpus member."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    df = spark.read.parquet(path).where(F.col("bucket") == query_bucket)
    if exclude_id is not None:
        df = df.where(F.col(id_col) != exclude_id)
    return (
        df.select(id_col, F.round(cosine(F.col(vec_col), qv), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of N ranked
    lists — the standard combiner for hybrid retrieval (sparse BM25 +
    dense ANN): rrf(d) = Σ_lists 1/(k + rank_list(d)); documents missing
    from a list simply contribute nothing.

    Input: DataFrames carrying (id_col, rank_col) with 1-based ranks.
    Output: (id, n_lists, rrf_score) ordered by (score DESC, id).

    Scale shape: a unionByName of the per-list contributions and ONE
    aggregation on the id — no outer-join chain, so fusing N lists stays
    one shuffle regardless of N, and the inputs are typically already
    tiny (top-k lists)."""
    if not rankings:
        raise InvalidArgument("rrf_fuse: rankings must be a non-empty list")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "_c"
            ),
        )
        for r in rankings
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    out = (
        allp.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_lists"),
            F.round(F.sum("_c"), 6).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), id_col)
    )
    return out.limit(topk) if topk is not None else out


def mmr_rerank(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    pool_n: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily select k of the top-``pool_n`` candidates,
    each round maximizing ``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c,s)``
    — relevance traded against redundancy, the standard diversified
    retrieval step after ANN. Output: (rank, vec_id, rel, mmr_score).

    Scale shape: candidate generation is the distributed exact top-k
    (one corpus scan, TakeOrderedAndProject — swap in lsh_ann_topk_pruned
    for the partition-pruned 100 TB path); the greedy selection runs on
    the collected pool — a k-bounded collect of ``pool_n`` rows like the
    kmeans/IVF centroid steps, never the corpus. Determinism: rel comes
    from cosine_topk already rounded to 6; pairwise sims and the mmr
    combination are rounded to 6 with id tie-breaks, so the DuckDB
    oracle's unrolled greedy recomputes the identical selection."""
    import numpy as np

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = df.sparkSession
    out_schema = StructType(
        [
            StructField("rank", LongType()),
            StructField(id_col, df.schema[id_col].dataType),
            StructField("rel", DoubleType()),
            StructField("mmr_score", DoubleType()),
        ]
    )
    pool = cosine_topk(df, query_id, k=pool_n, id_col=id_col, vec_col=vec_col)
    # broadcast the pool_n-row pool into the vector fetch: the bare join
    # planned sort-merge and shuffled the ENTIRE embeddings table to
    # attach 20 rows (measured: two 0.47 s 32-task jobs per run — the
    # shuffle map + reduce of the corpus). The pool is k-bounded by
    # construction, so the broadcast is safe at any corpus size and the
    # fetch is one scan with no exchange (guide §3.1).
    rows = (
        df.select(id_col, vec_col)
        .join(F.broadcast(pool), id_col)
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .collect()
    )
    if not rows:  # unknown query id / singleton corpus → empty result
        return spark.createDataFrame([], out_schema)
    ids = [r[id_col] for r in rows]
    rel = {r[id_col]: float(r["cos_sim"]) for r in rows}
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(mat @ mat.T, 6)
    idx = {v: i for i, v in enumerate(ids)}

    selected: list[tuple[int, int, float, float]] = []  # (rank, id, rel, mmr)
    remaining = list(ids)
    while remaining and len(selected) < k:
        best = None
        for c in remaining:
            if selected:
                ms = float(max(sims[idx[c], idx[s]] for _, s, _, _ in selected))
            else:
                ms = 0.0
            score = round(lam * rel[c] - (1.0 - lam) * ms, 6)
            # maximize score; ties broken by the SMALLER id (mirrors the
            # oracle's ORDER BY mmr DESC, vec_id LIMIT 1)
            if best is None or score > best[0] or (score == best[0] and c < best[1]):
                best = (score, c)
        score, c = best
        selected.append((len(selected) + 1, c, rel[c], score))
        remaining.remove(c)

    # one slice, not defaultParallelism: createDataFrame parallelizes the
    # local list into cores-many near-empty partitions, and the caller's
    # output sort then pays a 32-task sample + a 32-task sort for k≈5
    # rows (measured: two identical 0.32 s jobs — pure task-scheduling
    # overhead). The selection is k-bounded, one slice is its real size.
    return spark.createDataFrame(
        spark.sparkContext.parallelize(selected, 1), out_schema
    )
