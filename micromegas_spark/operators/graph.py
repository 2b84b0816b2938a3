"""Distributed connected components — dedup cluster resolution.

Near-duplicate detection (MinHash/SimHash/Jaccard, operators/dedup.py)
emits PAIRS; an actual dedup pass needs CLUSTERS: the transitive closure
of the pair graph, so one canonical document survives per cluster.

Implementation: iterative min-label propagation + pointer jumping as a
driver loop of declarative jobs (the same shape as
operators/clustering.py k-means). Each round every node adopts the
smallest label among itself and its neighbours, then follows its label
one more hop (component ids are node ids, so the label table doubles as
the parent pointer table) — the jump makes the covered distance grow
superlinearly, so long chains close in O(log diameter) rounds while LSH
near-clique dedup graphs (diameter 2-3) still close in 2-3. Comparable
round complexity to large-star/small-star (Kiveris et al., "Connected
Components in MapReduce") with simpler rounds.

Every round ends in ``localCheckpoint(eager=True)``: without lineage
truncation the logical plan doubles per round and analysis itself OOMs
the driver after ~15 rounds (measured) — checkpointing keeps the plan
constant-size and materializes only the (node, component) table, which
is bounded by the vertex count. No collect of nodes or edges — only the
per-round convergence counter (one scalar) reaches the driver.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_threshold: int = 200_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    is the smallest node id in the connected cluster. Undirected: edges
    are symmetrized internally.

    Two physical strategies behind one contract:

    - ``|edges| <= local_threshold``: union-find over the collected edge
      list. Near-dup pair graphs are duplicate-density-bound — usually
      thousands of edges even for huge corpora — and a distributed round
      costs 2 actions (checkpoint + convergence count); the local solve is
      one. The threshold bounds driver memory to ~MBs of id pairs.
    - otherwise: the min-label-propagation + pointer-jumping loop below —
      vertex-bound memory, O(log diameter) rounds, the 100 TB path.

    Dispatch is a single ``limit(threshold+1).collect()`` over the edge
    lineage: when the graph is small (the near-dup common case) that one
    execution already delivers every edge to the union-find — no separate
    count job, no persist round-trip. Only when the limit tops out do we
    persist and run the distributed loop (one wasted bounded prefix scan,
    irrelevant at that scale). The probe runs on the RAW (un-symmetrized)
    edges — union-find is direction-blind, so symmetrizing before the
    probe would halve the effective threshold and double the collect
    (exactly the cliff the sf1 scale step hit: 115k real edges → 231k
    symmetrized rows → a needless distributed loop)."""
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    probe = raw.limit(local_threshold + 1).collect()
    if len(probe) <= local_threshold:
        return _local_components_from_rows(raw, probe)
    del probe
    # symmetrize via explode, not union-of-two-projections: a union would
    # execute the (possibly expensive) edge lineage once per branch when
    # the persist materializes — explode reads it once and fans out 1→2
    e = (
        raw.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    e.count()  # materialize once; every loop round reads the cache
    # init = the first propagation round for free: one aggregation (no
    # join) gives every node min(self, direct neighbours) — near-clique
    # dedup graphs then converge in a single confirming loop round
    labels = (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.min(F.least(F.col("a"), F.col("b"))).alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = e.join(labels, e["b"] == labels["node"]).select(
            F.col("a").alias("node"), "component"
        )
        cand = (
            nbr.unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: look up the component's own component and keep the min
        parent = cand.select(
            F.col("node").alias("component"), F.col("component").alias("_pc")
        )
        # the old label rides along so the convergence check is a filter
        # over the checkpointed result, not an extra shuffle join per round
        merged = (
            cand.join(parent, "component", "left")
            .join(labels.withColumnRenamed("component", "_old"), "node")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_pc"), F.col("component"))
                ).alias("component"),
                "_old",
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.where(F.col("component") != F.col("_old")).count()
        labels = merged.drop("_old")
        if changed == 0:
            break
    e.unpersist()
    return labels


def _local_components_from_rows(e: DataFrame, rows_in) -> DataFrame:
    """Union-find over an already-collected edge list (small-graph
    strategy; unions are direction-blind so the input need not be
    symmetrized). Output schema matches the distributed loop exactly:
    (node, component) with the node column's own type."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows_in:
        a, b = row["a"], row["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    rows = [
        (n, min(members)) for members in comp.values() for n in members
    ]
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    node_t = e.schema["a"].dataType
    schema = StructType(
        [StructField("node", node_t), StructField("component", node_t)]
    )
    # pandas + Arrow: the result scans as a JVM-local Arrow batch instead
    # of a Python-RDD-backed plan (whose every downstream action spins the
    # Python runner; measured 3x on the tiny result)
    pdf = pd.DataFrame(rows, columns=["node", "component"])
    # coalesce(1): Arrow createDataFrame slices even a tiny pandas frame
    # into cores-many near-empty partitions, and every downstream sort/
    # window then schedules cores-many tasks for a driver-bounded result
    # (measured ~0.2 s of 32-task jobs per dedup_clusters consumer)
    return e.sparkSession.createDataFrame(pdf, schema).coalesce(1)


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Resolve near-dup pairs into clusters: (doc_id, cluster_id,
    cluster_size). cluster_id = min doc id in the cluster (the canonical
    survivor under keep-min dedup); singleton docs (no pair) are not
    emitted — they are trivially their own cluster."""
    from pyspark.sql import Window

    cc = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    w = Window.partitionBy("component")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count("*").over(w).alias("cluster_size"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    n_iter: int = 10,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution: (node, rank)
    after ``n_iter`` power iterations from the uniform vector —

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u) * w(u,v)/out_w(u)
                                  + dangling_mass / N)

    where dangling_mass is the rank held by nodes with no out-edges.
    Fixed iteration count (no convergence test) keeps the run — and any
    differential oracle that unrolls the same recurrence — exactly
    reproducible.

    Scale shape (the k-means/connected-components driver-loop template):
    multi-edges collapse once into a (src, dst, p) transition table
    (edge-bound, shuffles on src for the out-weight normalization); each
    round is one join of the vertex-bound rank vector with the
    transitions + one aggregation on dst; the dangling mass rides as a
    broadcast single-row aggregate inside the same plan — no per-round
    collect. Lineage is cut per round with an eager localCheckpoint
    (constant-size plan, one job per iteration).

    Small-graph fast path (the connected_components dispatch): the
    collapsed edge list is edge-bound, so when it fits
    ``local_threshold`` rows the power iteration runs driver-side off
    ONE action — each distributed round costs a job, pure overhead for
    the dimension-level graphs (nations, domains, class labels) this is
    typically applied to."""
    w_col = (F.col(weight) if weight else F.lit(1.0)).cast("double")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    # persist BEFORE the size probe: the probe executes the collapsed-edge
    # aggregation, and without the persist the distributed path would run
    # that expensive upstream build a second time. The post-cache coalesce
    # merges cache blocks ~8:1 for every consumer (the collapse groupBy
    # leaves the session's scale shuffle partitioning and the persist pins
    # it — measured 277-task probe jobs for a 25-node dimension graph,
    # nations_trade_pagerank). It sits BETWEEN the persist and the
    # consumers, NOT below the persist: coalescing before the persist
    # concentrates the agg state per task (the sf10 OOM lesson,
    # OPTIMIZATION_r11 #12) — this way the agg materializes at full width
    # and only the cached-block reads merge.
    par = edges.sparkSession.sparkContext.defaultParallelism
    e_cached = e.persist(StorageLevel.MEMORY_AND_DISK)
    e = e_cached.coalesce(par)
    # probe via e_cached, not the coalesced view (ADVICE r11 #4): on the
    # small-graph fast path the limit short-circuits before the cache fully
    # materializes, and probing the coalesced view left partial blocks
    # pinned until the unpersist; the distributed path below still reads e.
    probe = e_cached.limit(local_threshold + 1).collect()
    if len(probe) <= local_threshold:
        e_cached.unpersist()
        return _local_pagerank(e, probe, damping, n_iter)
    del probe
    # zero-total-out-weight nodes are DANGLING, not divisors: build the
    # transition table from positive out-weight only (a 0/0 would make p
    # NULL and silently drain rank mass each round)
    pos = e.where(F.col("w") > 0)
    outw = pos.groupBy("src").agg(F.sum("w").alias("outw"))
    trans_cached = pos.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # post-cache coalesce, same pattern as e above
    trans = trans_cached.coalesce(par)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    srcs = outw.select(F.col("src").alias("node"))
    for _ in range(n_iter):
        contrib = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("cm"))
        )
        dangling = (
            ranks.join(srcs, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(dangling))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("cm"), F.lit(0.0)) + F.col("dm") / F.lit(float(n)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e_cached.unpersist()
    trans_cached.unpersist()
    nodes.unpersist()
    return ranks


def _local_pagerank(
    e: DataFrame, rows_in, damping: float, n_iter: int
) -> DataFrame:
    """Power iteration over an already-collected collapsed edge list
    (small-graph strategy). Same recurrence as the distributed loop;
    result schema matches: (node, rank) with the node column's type."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    # zero/negative-weight edges carry no transition: nodes whose total
    # positive out-weight is 0 are dangling (mirrors the distributed loop)
    outw: dict = {}
    nodes_set = set()
    for r in rows_in:
        if r["w"] > 0:
            outw[r["src"]] = outw.get(r["src"], 0.0) + r["w"]
        nodes_set.add(r["src"])
        nodes_set.add(r["dst"])
    trans = [
        (r["src"], r["dst"], r["w"] / outw[r["src"]])
        for r in rows_in
        if r["w"] > 0
    ]
    nodes = sorted(nodes_set)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dm = sum(rank[v] for v in nodes if v not in outw)
        contrib = {v: 0.0 for v in nodes}
        for s_, d_, p in trans:
            contrib[d_] += rank[s_] * p
        rank = {
            v: (1.0 - damping) / n + damping * (contrib[v] + dm / n)
            for v in nodes
        }
    node_t = e.schema["src"].dataType
    schema = StructType(
        [StructField("node", node_t), StructField("rank", DoubleType())]
    )
    pdf = pd.DataFrame([(v, rank[v]) for v in nodes], columns=["node", "rank"])
    # coalesce(1): see _local_components_from_rows — one slice for a
    # driver-bounded result instead of cores-many near-empty partitions
    return e.sparkSession.createDataFrame(pdf, schema).coalesce(1)
