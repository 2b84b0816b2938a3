"""Contract queries for engine machinery that the plain-SQL oracle can't
express (rows-only driver checks — the unit/property tests in tests/ carry
the exact-semantics burden), plus the color_scale oracle query (F16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micromegas_spark.functions.color import _COLORMAPS, color_scale
from micromegas_spark.queries.registry import ordered, query
from micromegas_spark.cachereg import track
from micromegas_spark.sources.tables import load_table


def _viridis_channel_sql(ci: int) -> str:
    anchors = _COLORMAPS["viridis"]
    arr = "[" + ", ".join(str(float(a[ci])) for a in anchors) + "]"
    # idx = least(floor(pos), 6); frac = pos - idx; linear interp + round-half-up
    return (
        f"CAST(FLOOR(({arr})[idx + 1] + (({arr})[idx + 2] - ({arr})[idx + 1]) * frac + 0.5) AS BIGINT)"
    )


@query(
    "events_color_scale",
    oracle=f"""
    WITH t AS (
        SELECT event_id,
               LEAST(GREATEST(value / 327.53, 0.0), 1.0) * 7 AS pos
        FROM events WHERE event_type = 'view'
    ),
    i AS (
        SELECT event_id, pos,
               LEAST(CAST(FLOOR(pos) AS INTEGER), 6) AS idx
        FROM t
    ),
    f AS (SELECT event_id, idx, pos - idx AS frac FROM i)
    SELECT event_id,
           {_viridis_channel_sql(0)} * 16777216
         + {_viridis_channel_sql(1)} * 65536
         + {_viridis_channel_sql(2)} * 256
         + 255 AS color
    FROM f
    ORDER BY event_id
    """,
)
def events_color_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """color_scale('viridis', t): sample the 8-anchor colormap LUT with
    linear interpolation (SURVEY §2.8 F16; color/color_scale.rs:161) —
    pure expression tree, mirrored anchor-for-anchor in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "view")
        .select(
            "event_id",
            color_scale("viridis", F.col("value") / 327.53).alias("color"),
        )
        .orderBy("event_id")
    )


@query(
    "events_jsonb_each",
    oracle="""
    WITH k AS (
        SELECT event_id, props, unnest(json_keys(props)) AS key FROM events
    )
    SELECT event_id, key,
           json_extract_string(props, '$."' || key || '"') AS value
    FROM k
    """,
)
def events_jsonb_each(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonb_each UDTF: JSON object → (key, value) rows (SURVEY §2.10;
    jsonb/each.rs:273, functions-reference.md:598-641). Explode-based, no
    Python (functions/jsonb.jsonb_each)."""
    from micromegas_spark.functions.jsonb import jsonb_each
    from micromegas_spark.operators.util import spread as _spread

    # no ORDER BY: the driver's comparison is order-insensitive and a
    # global sort of the exploded rows would dominate the query.
    # _spread: the JSON parse is CPU-bound and the scan has few splits at
    # bench scale (no-op when the source already has enough partitions)
    ev = _spread(load_table(spark, sf_dir, "events").select("event_id", "props"))
    return jsonb_each(ev, "props", ["event_id"])


_THREAD_SPANS_ORACLE = """
    WITH numbered AS (
        SELECT CAST(user_id AS VARCHAR) AS stream_id, event_id,
               epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
    ),
    marked AS (
        SELECT stream_id, ts_us, rn,
               CASE WHEN (rn - 1) % 8 IN (0, 1, 3, 6) THEN 1 ELSE -1 END AS delta
        FROM numbered WHERE rn <= 8 * (cnt // 8)
    ),
    depths AS (
        SELECT *, CAST(SUM(delta) OVER (PARTITION BY stream_id ORDER BY rn) AS BIGINT) AS c
        FROM marked
    ),
    begins AS (
        SELECT stream_id, ts_us AS begin_ts, c AS d,
               ROW_NUMBER() OVER (PARTITION BY stream_id, c ORDER BY rn) AS k
        FROM depths WHERE delta = 1
    ),
    ends AS (
        SELECT stream_id, ts_us AS end_ts, c + 1 AS d,
               ROW_NUMBER() OVER (PARTITION BY stream_id, c ORDER BY rn) AS k
        FROM depths WHERE delta = -1
    ),
    spans AS (
        SELECT b.stream_id, b.d, e.end_ts - b.begin_ts AS duration
        FROM begins b JOIN ends e USING (stream_id, d, k)
    )
    SELECT stream_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(MAX(d) - 1 AS INT) AS max_depth,
           CAST(MIN(duration) AS BIGINT) AS min_duration,
           CAST(SUM(duration) AS BIGINT) AS total_duration
    FROM spans GROUP BY stream_id ORDER BY stream_id
    """


def _synth_nested_events(ev: DataFrame) -> DataFrame:
    """Well-formed nested begin/end stream per user (shared by the batch
    and streaming thread-span queries — identical input is what makes the
    streaming≡batch≡oracle triangle meaningful): the period-8 marker
    pattern B B E B E E B E, hash = frame depth, trailing partial periods
    dropped so every stream is balanced."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    numbered = ev.select(
        F.col("user_id").cast("string").alias("stream_id"),
        F.col("event_id"),
        F.col("ts_us").alias("time_ns"),
        F.row_number().over(w).alias("rn"),
        # full-frame count on the SAME ordered spec as row_number: one
        # Window node computes both (a separate unordered spec planned a
        # second Window pass over the partition; identical rows verified)
        F.count("*")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("cnt"),
    ).where(F.col("rn") <= (F.col("cnt") / 8).cast("bigint") * 8)
    delta = F.when(((F.col("rn") - 1) % 8).isin(0, 1, 3, 6), F.lit(1)).otherwise(
        F.lit(-1)
    )
    wc = Window.partitionBy("stream_id").orderBy("rn")
    marked = numbered.withColumn("delta", delta).withColumn(
        "c", F.sum("delta").over(wc)
    )
    return marked.select(
        "stream_id",
        "event_id",
        F.when(F.col("delta") == 1, F.lit("begin")).otherwise(F.lit("end")).alias("event_type"),
        "time_ns",
        # hash = depth of the frame being opened/closed: every end matches
        # the open top (same depth), so the stack machine never heals here
        F.when(F.col("delta") == 1, F.col("c")).otherwise(F.col("c") + 1)
        .cast("bigint")
        .alias("hash"),
        F.concat(
            F.lit("d"),
            F.when(F.col("delta") == 1, F.col("c")).otherwise(F.col("c") + 1).cast("bigint"),
        ).alias("name"),
        F.lit("events").alias("target"),
        F.lit("synth").alias("filename"),
        F.lit(0).alias("line"),
    )


def _span_stats(spans: DataFrame) -> DataFrame:
    """Per-stream span statistics — the shared SELECT of the batch and
    streaming thread-span queries, matching _THREAD_SPANS_ORACLE."""
    return (
        spans.groupBy("stream_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.max("depth").alias("max_depth"),
            F.min("duration").alias("min_duration"),
            F.sum("duration").alias("total_duration"),
        )
        .transform(ordered, "stream_id")
    )


@query(
    "events_thread_spans",
    oracle=_THREAD_SPANS_ORACLE,
)
def events_thread_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thread-span call-tree building exercised on driver data.

    Synthesizes a well-formed NESTED begin/end stream per user from the
    events table — each user's time-ordered rows take the period-8 marker
    pattern B B E B E E B E (frame depths 1,2,·,2,·,·,1,·; balanced per
    period, trailing partial periods dropped) with hash = frame depth, a
    LIFO-consistent discipline — then operators/spans.build_thread_spans
    runs the real call-tree stack machine and the query reports per-user
    span statistics.

    Oracle: LIFO matching of a well-formed stream IS SQL-expressible —
    after a running ±1 depth sum, the k-th begin at depth d pairs with the
    k-th end at depth d within a stream (the classic balanced-parentheses
    matching identity), so DuckDB rebuilds the same spans with two window
    passes and an equi-join; exact tree semantics (healing, hash
    mismatches, parent links) stay covered by tests/test_spans.py +
    hypothesis invariants."""
    from micromegas_spark.operators.spans import build_thread_spans

    ev = load_table(spark, sf_dir, "events")
    events = _synth_nested_events(ev)
    spans = build_thread_spans(events, 0, 2**62)
    return _span_stats(spans)


@query(
    "events_thread_spans_stream",
    oracle=_THREAD_SPANS_ORACLE,
)
def events_thread_spans_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING thread-span assembly ≡ batch ≡ SQL oracle (the
    end-to-end wiring of streaming/stateful.streaming_thread_spans):
    the SAME synthesized begin/end stream as events_thread_spans lands
    as two time-split micro-batches; applyInPandasWithState keeps each
    stream's open-span stack as keyed state across the batch boundary,
    so a span whose begin and end arrive in DIFFERENT micro-batches is
    still assembled exactly once, and the per-stream statistics match
    the batch query's DuckDB oracle bit-for-bit. Batch order is pinned
    (one_shot_stream_table mtime ordering) because the stack machine is
    order-sensitive — the one *_stream query where that matters."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from micromegas_spark.streaming.incremental import one_shot_stream_table
    from micromegas_spark.streaming.stateful import streaming_thread_spans

    ev = load_table(spark, sf_dir, "events")
    events = _synth_nested_events(ev).select(
        "stream_id", "event_id", "event_type", "time_ns", "hash", "name"
    )
    # the split boundary comes from the RAW events scan, not the synth
    # relation: computing it over `events` re-ran the two synth window
    # passes just to pick a midpoint (guide §1.2). ANY time boundary
    # yields the identical final result — cross-batch span assembly is
    # exactly what the stateful machine guarantees (and what this query
    # certifies) — so the cheap raw extrema are as good a split as the
    # kept-row extrema (verified: output identical at sf0.1, 1500 rows).
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    mid = (int(lo) + int(hi)) // 2
    schema = StructType(
        [
            StructField("stream_id", StringType()),
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("time_ns", LongType()),
            StructField("hash", LongType()),
            StructField("name", StringType()),
        ]
    )
    spans = one_shot_stream_table(
        spark,
        [events.where(F.col("time_ns") < mid), events.where(F.col("time_ns") >= mid)],
        schema,
        streaming_thread_spans,
        "thread_spans_stream_tbl",
        output_mode="append",
    )
    return _span_stats(spans)


_JIT_THREAD_SPANS_ORACLE = _THREAD_SPANS_ORACLE.replace(
    "FROM events\n",
    "FROM events WHERE user_id IN "
    "(SELECT user_id FROM events GROUP BY user_id ORDER BY user_id LIMIT 4)\n",
    1,
)


def _jit_thread_spans_setup(spark: SparkSession, sf_dir: str):
    """Shared JIT fixture for the thread-span JIT queries (Python-API and
    SQL-spelled variants must exercise the SAME engine state): synthesizes
    4 nested streams, splits each into 3 event-time blocks registered in
    reverse insert order, and registers the block-aware JitViewSet on an
    Engine with a content-keyed warehouse. Returns (engine, sorted stream
    ids, the persisted block table to unpersist, the synthesized events
    for the degenerate fallback)."""
    import hashlib
    import os
    import tempfile

    from pyspark.sql import Window

    from micromegas_spark.engine import Engine, JitViewSet
    from micromegas_spark.operators.spans import build_thread_spans

    ev = load_table(spark, sf_dir, "events")
    ids = [
        r[0]
        for r in ev.select("user_id").distinct().orderBy("user_id").limit(4).collect()
    ]
    events = _synth_nested_events(ev.where(F.col("user_id").isin(ids)))
    w = Window.partitionBy("stream_id").orderBy("time_ns", "event_id")
    # post-window coalesce before the persist: the ntile window leaves the
    # session's scale shuffle partitioning, the persist pins it (AQE cannot
    # coalesce a cached plan), and every consumer job (meta collect, each
    # view_instance's build_blocks scan) would pay one task per shuffle
    # partition for a 4-stream fixture (measured: 261-task jobs at bench
    # scale). Shuffle-free merge to core width; the window itself keeps
    # its full partition count.
    evb = (
        events.withColumn("blk", F.ntile(3).over(w))
        .coalesce(spark.sparkContext.defaultParallelism)
        .persist()
    )
    meta = evb.groupBy("stream_id", "blk").agg(
        F.min("time_ns").alias("lo"),
        F.max("time_ns").alias("hi"),
        F.count("*").alias("n"),
    ).collect()  # bounded: 4 streams x 3 blocks
    blocks: dict[str, list[dict]] = {}
    for r in meta:
        blocks.setdefault(r["stream_id"], []).append(
            {
                "block_id": f"{r['stream_id']}/{r['blk']}",
                "begin_ns": r["lo"],
                "end_ns": r["hi"] + 1,
                # REVERSED: the latest event-time block inserts first -
                # the exact out-of-order registration #1429 fixes
                "insert_ns": 4 - r["blk"],
                "nb_objects": r["n"],
            }
        )

    def list_blocks(instance, b, e):
        return [
            m
            for m in blocks.get(instance, [])
            if m["begin_ns"] < e and m["end_ns"] > b
        ]

    def build_blocks(instance, block_ids):
        blks = [int(bid.split("/")[-1]) for bid in block_ids]
        src = evb.where(
            (F.col("stream_id") == instance) & F.col("blk").isin(blks)
        )
        return build_thread_spans(src, 0, 2**62)

    # deterministic per-corpus warehouse: repeat runs (bench repeats,
    # driver + oracle passes) hit the manifest cache instead of
    # rebuilding - the warm-JIT behavior the reference has - and /tmp
    # doesn't accumulate one orphan dir per call. Reuse is safe:
    # partition identity is content-based (block ids + counts) and
    # writes are tmp-dir + atomic rename.
    wh = os.path.join(
        tempfile.gettempdir(),
        f"jit_thread_spans_{hashlib.sha1(sf_dir.encode()).hexdigest()[:12]}",
    )
    eng = Engine(spark, warehouse=wh)
    eng.register_jit_view_set(
        JitViewSet(
            "jit_thread_spans",
            source_count=lambda *_: 0,
            build=lambda *_: None,
            time_column="begin_ns",
            list_blocks=list_blocks,
            build_blocks=build_blocks,
        )
    )
    return eng, sorted(blocks), evb, events


@query(
    "events_jit_thread_spans",
    oracle=_JIT_THREAD_SPANS_ORACLE,
)
def events_jit_thread_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thread spans built THROUGH the event-time JIT path (reference #1429,
    jit_partitions.rs group_blocks_into_partitions): the same synthesized
    nested streams as events_thread_spans, but each stream's events are
    split into 3 event-time blocks REGISTERED IN REVERSE insert order, fed
    through Engine.view_instance's block-aware grouping (event-time sort,
    insert-safe cuts, manifest-cached parquet partitions), and read back.

    The oracle is the SAME balanced-parentheses SQL as the direct batch
    query (restricted to the 4 streams materialized) — passing proves JIT
    materialization is semantically invisible: spans whose begin and end
    live in DIFFERENT blocks still assemble, because event-time grouping
    puts out-of-insert-order blocks into one event-contiguous partition
    where the stack machine sees a time-sorted whole. Insert-order
    bucketing (the pre-#1429 behavior) would fragment these call trees."""
    from micromegas_spark.operators.spans import build_thread_spans

    eng, ids, evb, events = _jit_thread_spans_setup(spark, sf_dir)
    try:
        parts = [
            eng.view_instance("jit_thread_spans", sid, 0, 2**62) for sid in ids
        ]
        if not parts:
            return _span_stats(
                build_thread_spans(events, 0, 2**62)
            )  # degenerate tiny-SF fallback: no balanced streams at all
        spans = parts[0]
        for p in parts[1:]:
            spans = spans.unionByName(p)
        return _span_stats(spans)
    finally:
        evb.unpersist(blocking=False)


@query(
    "events_jit_sql_view_instance",
    oracle=_JIT_THREAD_SPANS_ORACLE,
)
def events_jit_sql_view_instance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PRIMARY documented JIT UX — ``SELECT ... FROM
    view_instance('thread_spans', id)`` as SQL TEXT
    (view_instance_table_function.rs:49-70; python-api.md's query_spans
    examples) — through Engine.resolve's plan-time rewrite: literal
    view_instance() calls materialize via the existing Python JIT path
    (block-aware grouping, manifest cache) and substitute as temp views,
    so a reference user's query runs VERBATIM with zero data through
    Python. Exercises multiple instances in one statement via UNION ALL
    and proves the result identical to the Python-API variant's oracle
    (the same balanced-parentheses SQL)."""
    from micromegas_spark.operators.spans import build_thread_spans

    eng, ids, evb, events = _jit_thread_spans_setup(spark, sf_dir)
    try:
        if not ids:
            return _span_stats(build_thread_spans(events, 0, 2**62))
        union = "\nUNION ALL\n".join(
            f"SELECT * FROM view_instance('jit_thread_spans', '{sid}')"
            for sid in ids
        )
        spans = eng.query(
            "SELECT stream_id, begin_ns, duration, depth"
            f" FROM ({union})"
        )
        return _span_stats(spans)
    finally:
        evb.unpersist(blocking=False)


def _kmeans_oracle_parts(k: int = 8, n_iter: int = 2) -> list[str]:
    """CTE chain for fully-unrolled Lloyd's k-means: farthest-point init
    (k-1 argmax sweeps) + n_iter assignment/update rounds + final
    assignment (``assign_f``: id, cluster, d). The init sweeps run over
    the operator's deterministic md5-ordered 4096-row sample (``samp`` —
    mirrored exactly here, so the oracle stays valid at every scale
    factor, not just while the table fits the sample), making the whole
    iterative algorithm differentially checkable. Tie-breaks mirror
    numpy: argmax → ORDER BY d DESC, id;
    argmin → ORDER BY d, cluster. Shared by the emb_kmeans and
    emb_semdedup oracles.

    Every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and the
    mind_j/cent_i chains reference their predecessor twice — inlining
    makes the plan tree EXPONENTIAL in k and the solo kmeans oracle took
    138 s (semdedup's three assign_f references never finished);
    materialization brings both to ~1 s."""
    parts = [
        "pts AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        "px AS (SELECT id, unnest(v) AS x, unnest(range(0, len(v))) AS dim FROM pts)",
        # the operator's init sample: top-4096 by (md5(id), id) — identical
        # expression on both engines, so the sweep inputs match at any SF
        "samp AS (SELECT id FROM pts ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 4096)",
        "pxs AS (SELECT px.* FROM px JOIN samp USING (id))",
        "c_0 AS (SELECT dim, x FROM pxs WHERE id = (SELECT MIN(id) FROM samp))",
        "mind_0 AS (SELECT p.id, SUM((p.x - c.x) * (p.x - c.x)) AS d"
        "           FROM pxs p JOIN c_0 c USING (dim) GROUP BY p.id)",
    ]
    for j in range(1, k):
        parts += [
            f"far_{j} AS (SELECT id FROM mind_{j-1} ORDER BY d DESC, id LIMIT 1)",
            f"c_{j} AS (SELECT dim, x FROM pxs WHERE id = (SELECT id FROM far_{j}))",
            f"nd_{j} AS (SELECT p.id, SUM((p.x - c.x) * (p.x - c.x)) AS d"
            f"           FROM pxs p JOIN c_{j} c USING (dim) GROUP BY p.id)",
            f"mind_{j} AS (SELECT a.id, LEAST(a.d, b.d) AS d"
            f"             FROM mind_{j-1} a JOIN nd_{j} b USING (id))",
        ]
    init_union = " UNION ALL ".join(
        f"SELECT {j} AS cluster, dim, x FROM c_{j}" for j in range(k)
    )
    parts.append(f"cent_0 AS ({init_union})")
    for i in range(1, n_iter + 1):
        parts += [
            f"dist_{i} AS (SELECT p.id, c.cluster, SUM((p.x - c.x) * (p.x - c.x)) AS d"
            f"             FROM px p JOIN cent_{i-1} c USING (dim)"
            f"             GROUP BY p.id, c.cluster)",
            f"assign_{i} AS (SELECT id, cluster FROM ("
            f"  SELECT id, cluster, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cluster) AS rn"
            f"  FROM dist_{i}) WHERE rn = 1)",
            f"newc_{i} AS (SELECT a.cluster, p.dim, AVG(p.x) AS x"
            f"             FROM assign_{i} a JOIN px p ON p.id = a.id"
            f"             GROUP BY a.cluster, p.dim)",
            # empty clusters keep their previous centroid (operator contract)
            f"cent_{i} AS (SELECT o.cluster, o.dim, COALESCE(n.x, o.x) AS x"
            f"             FROM cent_{i-1} o LEFT JOIN newc_{i} n USING (cluster, dim))",
        ]
    parts += [
        f"dist_f AS (SELECT p.id, c.cluster, SUM((p.x - c.x) * (p.x - c.x)) AS d"
        f"           FROM px p JOIN cent_{n_iter} c USING (dim)"
        f"           GROUP BY p.id, c.cluster)",
        "assign_f AS (SELECT id, cluster, d FROM ("
        "  SELECT id, cluster, d, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cluster) AS rn"
        "  FROM dist_f) WHERE rn = 1)",
    ]
    return [p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts]


def _kmeans_oracle_sql(k: int = 8, n_iter: int = 2) -> str:
    return (
        "WITH " + ",\n".join(_kmeans_oracle_parts(k, n_iter)) + "\n"
        "SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,"
        " ROUND(AVG(d), 4) AS avg_sq_dist"
        " FROM assign_f GROUP BY cluster ORDER BY cluster"
    )


@query("emb_kmeans", oracle=_kmeans_oracle_sql())
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embeddings table — the iterative-algorithm
    capability class (driver loop of declarative jobs,
    operators/clustering.py). Reports per-cluster size and mean squared
    distance.

    Oracle: the run is deterministic (farthest-point init over a
    hash-ordered sample that COVERS the table at correctness SF, numpy
    tie-breaks mirrored by ORDER BY), so the whole algorithm — init
    sweeps, 2 Lloyd rounds, final assignment — unrolls into one generated
    DuckDB query (_kmeans_oracle_sql). Objective-decrease and large-input
    determinism stay covered by tests/test_clustering.py."""
    from micromegas_spark.operators.clustering import kmeans

    e = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(e, k=8, max_iter=2)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("sq_dist"), 4).alias("avg_sq_dist"),
        )
        .transform(ordered, "cluster")
    )


@query(
    "docs_media_pipeline",
    oracle="""
    WITH f AS (
        SELECT source, md5(text) AS h, strlen(text) AS nb,
               -- feature vector = md5 digest bytes, float32 arithmetic
               -- mirrored via ::FLOAT so the norm matches the fake decoder
               sqrt(list_sum(list_transform(range(0, 16),
                    i -> pow(((('0x' || substr(md5(text), 2*i + 1, 2))::BIGINT::FLOAT
                               - 127.5::FLOAT) / 73.9::FLOAT)::DOUBLE, 2)))) AS norm
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(nb) AS BIGINT) AS total_bytes,
           ROUND(AVG(norm), 4) AS avg_feature_norm,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct
    FROM f GROUP BY source ORDER BY source
    """,
)
def docs_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing exercised on driver data. The decode backend is
    a deterministic fake (no image libs in the environment; real-decoder
    swap changes no plan shape) — and BECAUSE it is deterministic
    (md5-derived dims/features), the whole pipeline is differentially
    checkable: the DuckDB oracle recomputes the digest features with
    float32 arithmetic mirrored via ::FLOAT casts.
    Schema/batching semantics covered by tests/test_streaming_multimodal.

    Treats each document's utf-8 bytes as an opaque media payload:
    mapInPandas decode (dims + content hash) then feature extraction into
    an embedding column, aggregated per source."""
    from micromegas_spark.operators.multimodal import decode_media, extract_features

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("metadata"),
    )
    decoded = decode_media(media)
    feats = extract_features(media)
    joined = (
        decoded.join(feats, "media_id")
        .join(d.select(F.col("doc_id").alias("media_id"), "source"), "media_id")
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("features"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg(norm), 4).alias("avg_feature_norm"),
            F.countDistinct("content_hash").alias("n_distinct"),
        )
        .transform(ordered, "source")
    )


def _semdedup_oracle_sql(k: int = 8, n_iter: int = 2, threshold: float = 0.3) -> str:
    """SemDeDup oracle: the unrolled kmeans assignment CTEs + exact
    within-cluster cosine pruning recomputed in DuckDB."""
    parts = _kmeans_oracle_parts(k, n_iter)
    parts += [
        "norms AS MATERIALIZED (SELECT id, sqrt(SUM(x * x)) AS nrm FROM px GROUP BY id)",
        "cpairs AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib, a.cluster, a.d AS da, b.d AS db"
        "           FROM assign_f a JOIN assign_f b"
        "             ON a.cluster = b.cluster AND a.id <> b.id"
        "           WHERE b.d > a.d OR (b.d = a.d AND b.id < a.id))",
        "dots AS MATERIALIZED (SELECT cp.ia, cp.ib, SUM(pa.x * pb.x) AS dot"
        "         FROM cpairs cp"
        "         JOIN px pa ON pa.id = cp.ia"
        "         JOIN px pb ON pb.id = cp.ib AND pb.dim = pa.dim"
        "         GROUP BY cp.ia, cp.ib)",
        f"dropped AS MATERIALIZED (SELECT DISTINCT cp.ia AS id"
        f"            FROM cpairs cp"
        f"            JOIN dots dt ON dt.ia = cp.ia AND dt.ib = cp.ib"
        f"            JOIN norms na ON na.id = cp.ia"
        f"            JOIN norms nb ON nb.id = cp.ib"
        f"            WHERE dt.dot / (na.nrm * nb.nrm) >= {threshold})",
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT a.cluster, CAST(COUNT(*) AS BIGINT) AS n,"
        "       CAST(SUM(CASE WHEN d.id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped\n"
        "FROM assign_f a LEFT JOIN dropped d ON d.id = a.id\n"
        "GROUP BY a.cluster ORDER BY a.cluster"
    )


@query("emb_semdedup", oracle=_semdedup_oracle_sql())
def emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means clustering confines the
    O(n²) cosine comparison to clusters, then within-cluster pairs above
    the threshold drop the centroid-closer member (keep-diverse rule).
    Threshold 0.3 on this corpus (random synthetic embeddings top out
    near cos 0.5 — same rationale as emb_cosine_neardup). Differentially
    checked end-to-end: the oracle unrolls the kmeans assignment and
    recomputes the exact pairwise pruning (operators/clustering.semdedup)."""
    from micromegas_spark.operators.clustering import semdedup

    e = load_table(spark, sf_dir, "embeddings")
    marked = semdedup(e, k=8, threshold=0.3, max_iter=2)
    return (
        marked.groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
        )
        .transform(ordered, "cluster")
    )


@query(
    "media_ppm_roundtrip",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id // 16) % 16 AS h
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h, UNNEST(RANGE(w * h * 3)) AS k FROM dims
    )
    SELECT doc_id AS media_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(w * h * 3 AS BIGINT) AS n_px,
           FLOOR(AVG(CAST((doc_id * 31 + k) % 256 AS DOUBLE)) * 1000000) / 1000000 AS mean_px
    FROM px
    GROUP BY doc_id, w, h
    ORDER BY media_id
    """,
)
def media_ppm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, differentially checked: per document a
    deterministic RGB image (w = 8 + id%16, h = 8 + (id//16)%16, pixel k
    = (id*31 + k) % 256) is ENCODED to binary PPM (P6) bytes, shipped as
    an opaque BINARY column, and decoded back by the pure-numpy codec
    (operators/imagecodec via multimodal.pixel_stats) — no Pillow, no
    fake backend. The oracle recomputes dims and the exact mean pixel
    value from the closed form, so one wrong header byte, stride, or
    channel order in the codec fails the hash. Both stages are Arrow-
    batched mapInPandas, map-side only — no shuffle at any width."""
    import pandas as _pd

    from micromegas_spark.operators.multimodal import pixel_stats
    from micromegas_spark.operators.util import spread as _spr

    d = _spr(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        import numpy as np

        from micromegas_spark.operators.imagecodec import encode_ppm

        for pdf in batches:
            rows = {"media_id": [], "media_type": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 16, 8 + (did // 16) % 16
                vals = (did * 31 + np.arange(w * h * 3)) % 256
                rows["media_id"].append(did)
                rows["media_type"].append("image")
                rows["payload"].append(encode_ppm(vals.astype("uint8").reshape(h, w, 3)))
            yield _pd.DataFrame(rows)

    media = d.mapInPandas(
        gen, schema="media_id bigint, media_type string, payload binary"
    )
    # shuffle barrier before the output sort — same rationale and A/B as
    # media_avi_roundtrip: the sort's range-sampling job would otherwise
    # re-run the whole map-only encode+decode chain a second time
    return pixel_stats(media).repartition("media_id").orderBy("media_id")


_WAV_STATS_ORACLE = """
    WITH dims AS (
        SELECT doc_id, 200 + doc_id % 300 AS n FROM documents
    ),
    sm AS (
        SELECT doc_id, n, ((doc_id * 37 + k * 97) % 4001) - 2000 AS v
        FROM (SELECT doc_id, n, UNNEST(RANGE(n)) AS k FROM dims)
    )
    SELECT doc_id AS media_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(n AS BIGINT) AS n_frames,
           CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
           ROUND(SQRT(AVG(CAST(v * v AS DOUBLE))), 6) AS rms,
           CAST(MAX(ABS(v)) AS INT) AS peak,
           FLOOR(CAST(SUM(CASE WHEN ABS(v) < 64 THEN 1 ELSE 0 END) AS DOUBLE)
                 / n * 1000000) / 1000000 AS silence_ratio
    FROM sm
    GROUP BY doc_id, n
    ORDER BY media_id
    """


def _gen_wav_media(d: DataFrame) -> DataFrame:
    """documents doc_ids → deterministic WAV media rows (shared by the
    batch and streaming audio queries so their oracle stays one SQL)."""
    import pandas as _pd

    def gen(batches):
        import numpy as np

        from micromegas_spark.operators.audiocodec import encode_wav

        for pdf in batches:
            rows = {"media_id": [], "media_type": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                n = 200 + did % 300
                v = ((did * 37 + np.arange(n, dtype=np.int64) * 97) % 4001) - 2000
                rows["media_id"].append(did)
                rows["media_type"].append("audio")
                rows["payload"].append(encode_wav(v.astype(np.int16), 8000))
            yield _pd.DataFrame(rows)

    return d.mapInPandas(
        gen, schema="media_id bigint, media_type string, payload binary"
    )


@query("media_wav_roundtrip", oracle=_WAV_STATS_ORACLE)
def media_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, differentially checked: per document a
    deterministic mono PCM16 waveform (n = 200 + id%300 frames at
    8 kHz, sample k = ((id*37 + k*97) % 4001) - 2000) is ENCODED to
    RIFF/WAVE bytes (operators/audiocodec.encode_wav), shipped as an
    opaque BINARY column, and decoded back by the pure-numpy WAV codec
    via multimodal.audio_stats — real header walk, endianness, and
    sample interleave under test, no audio libraries. The oracle
    recomputes frame counts, duration, RMS, peak, and silence ratio from
    the closed form, so one wrong fmt-chunk offset or sign convention
    fails the hash. Both stages are Arrow-batched mapInPandas, map-side
    only — no shuffle at any corpus width (the reference stores audio
    payloads as the same opaque binary rows, SURVEY §1.3)."""
    from micromegas_spark.operators.multimodal import audio_stats
    from micromegas_spark.operators.util import spread as _spr

    media = _gen_wav_media(
        _spr(load_table(spark, sf_dir, "documents").select("doc_id"))
    )
    # shuffle barrier before the output sort — same rationale and A/B as
    # media_avi_roundtrip: the sort's range-sampling job would otherwise
    # re-run the whole map-only encode+decode chain a second time
    return audio_stats(media).repartition("media_id").orderBy("media_id")


@query("media_wav_stream", oracle=_WAV_STATS_ORACLE)
def media_wav_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING multimodal decode ≡ batch ≡ SQL oracle: the SAME
    deterministic WAV corpus as media_wav_roundtrip arrives as two
    micro-batches (split by doc_id parity) and flows through the
    pure-numpy decoder — audio_stats is a stateless Arrow-batched
    mapInPandas stage, so it runs unchanged on the streaming DataFrame
    (append mode, no state, no watermark) exactly as a production
    ingest-time feature-extraction stage would. The complete result is
    hash-checked against the batch query's closed-form oracle,
    pinning streaming≡batch equivalence for the media pipeline the way
    events_sessionize_stream does for windowed aggregation."""
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    from micromegas_spark.operators.multimodal import audio_stats
    from micromegas_spark.streaming.incremental import one_shot_stream_table

    media = _gen_wav_media(load_table(spark, sf_dir, "documents").select("doc_id"))
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    stats = one_shot_stream_table(
        spark,
        [
            media.where(F.col("media_id") % 2 == 0),
            media.where(F.col("media_id") % 2 == 1),
        ],
        schema,
        audio_stats,
        "media_wav_stream_tbl",
        output_mode="append",
    )
    return stats.orderBy("media_id")


@query(
    "events_cbor_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_id,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_value_micros
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_cbor_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block wire-format round trip, differentially checked end-to-end:
    events are packed into per-bucket blocks ENCODED as CBOR envelopes
    (sources/payload.encode_block_cbor — the reference's outer framing is
    CBOR too, payload.rs:33-37: tag-55799 envelope over zlib'd buffers,
    objects as an RFC 8742 CBOR Sequence), shipped as opaque BINARY rows,
    then decoded back by parse_block (auto-detecting the magic prefix)
    and re-aggregated from the JSON value column. The oracle aggregates
    the raw events directly, so any encode/decode byte error — int heads,
    float encoding, zlib layer, sequence framing — shifts a count or sum
    and fails the hash. Values sum as floor-scaled micros (exact int64)
    so double summation order cannot perturb the result. Block packing is
    applyInPandas per hash bucket; parsing is Arrow-batched mapInPandas —
    both shuffle-bounded by the bucket count, corpus-width independent."""
    import pandas as _pd

    from micromegas_spark.sources.payload import encode_block_cbor, parse_block

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )

    def pack(pdf: _pd.DataFrame) -> _pd.DataFrame:
        bid = f"blk-{int(pdf['bucket'].iloc[0]):04d}"
        objs = [
            {
                "__type": "event",
                "event_id": int(r.event_id),
                "event_type": r.event_type,
                "value": float(r.value),
            }
            for r in pdf.itertuples()
        ]
        return _pd.DataFrame(
            {"block_id": [bid], "payload": [bytearray(encode_block_cbor(objs))]}
        )

    blocks = (
        ev.withColumn("bucket", F.pmod(F.hash("user_id"), F.lit(64)))
        # NOTE (r11, measured): AQE coalesces this exchange to ~11 tasks
        # by shuffle bytes while the stage cost is per-event Python CBOR
        # work — but pinning the full 64-bucket width with an explicit
        # repartition measured WORSE interleaved (2.37 vs 2.18 s min-of-4;
        # the extra user exchange costs more than the widened stage buys
        # under worker-pool reuse). Left on the AQE path deliberately.
        .groupBy("bucket")
        .applyInPandas(pack, schema="block_id string, payload binary")
    )
    parsed = parse_block(blocks)
    fields = F.from_json(
        F.col("value"), "event_id bigint, event_type string, value double"
    )
    return (
        parsed.select(fields.alias("e"))
        .groupBy(F.col("e.event_type").alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("e.event_id").alias("sum_id"),
            F.sum(F.floor(F.col("e.value") * 1000000).cast("long")).alias(
                "sum_value_micros"
            ),
        )
        .transform(ordered, "event_type")
    )


@query(
    "media_avi_roundtrip",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 2 + doc_id % 4 AS nf, 8 + doc_id % 8 AS w,
               6 + (doc_id // 8) % 8 AS h
        FROM documents
    ),
    fx AS (SELECT doc_id, nf, w, h, UNNEST(RANGE(nf)) AS f FROM dims),
    px AS (SELECT doc_id, nf, w, h, f, UNNEST(RANGE(w * h * 3)) AS k FROM fx)
    SELECT doc_id AS media_id,
           CAST(nf AS INT) AS n_frames,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(10 AS INT) AS fps,
           FLOOR(AVG(CAST((doc_id * 13 + f * 101 + k) % 256 AS DOUBLE)) * 1000000)
               / 1000000 AS mean_px,
           CAST(SUM(((doc_id * 13 + f * 101 + k) % 256)
                    * (f * (w * h * 3) + k + 1)) AS BIGINT) AS weighted_px
    FROM px
    GROUP BY doc_id, nf, w, h
    ORDER BY media_id
    """,
)
def media_avi_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, differentially checked: per document a
    deterministic multi-frame clip (nf = 2 + id%4 frames of
    w = 8 + id%8 by h = 6 + (id//8)%8, pixel k of frame f =
    (id*13 + f*101 + k) % 256) is ENCODED as an uncompressed 24-bit AVI
    container (operators/videocodec.encode_avi — RIFF hdrl/strl/movi
    tree, bottom-up BGR DIB frames with 4-byte row padding), shipped as
    an opaque BINARY column, and decoded back by the pure-numpy codec
    via multimodal.video_stats — no ffmpeg, no optional deps. The
    order-weighted checksum Σ v·(idx+1) over (frame, row, col, channel)
    order makes the hash sensitive to row-flip, channel-swap, padding,
    and frame-order mistakes a plain mean would forgive. Both stages are
    Arrow-batched mapInPandas, map-side only — no shuffle at any corpus
    width (the reference stores media payloads as the same opaque binary
    rows, SURVEY §1.3)."""
    import pandas as _pd

    from micromegas_spark.operators.multimodal import video_stats
    from micromegas_spark.operators.util import spread as _spr

    d = _spr(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        import numpy as np

        from micromegas_spark.operators.videocodec import encode_avi

        for pdf in batches:
            rows = {"media_id": [], "media_type": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                nf, w, h = 2 + did % 4, 8 + did % 8, 6 + (did // 8) % 8
                frames = [
                    (
                        (did * 13 + f * 101 + np.arange(w * h * 3, dtype=np.int64))
                        % 256
                    ).astype("uint8").reshape(h, w, 3)
                    for f in range(nf)
                ]
                rows["media_id"].append(did)
                rows["media_type"].append("video")
                rows["payload"].append(encode_avi(frames, fps=10))
            yield _pd.DataFrame(rows)

    media = d.mapInPandas(
        gen, schema="media_id bigint, media_type string, payload binary"
    )
    # shuffle barrier between the Python chain and the output sort:
    # orderBy's range-partitioner SAMPLING job executes the sort's child,
    # and with a map-only Python chain below there is no materialized
    # shuffle stage for it to reuse — the whole encode+decode ran TWICE
    # (measured: two identical 0.86 s jobs). A keyed repartition of the
    # narrow one-row-per-clip stats makes AQE materialize the chain ONCE
    # as a shuffle stage that both the sampler and the sort read
    # (guide §1.2/§2.4). Interleaved min-of-6: none 1.69 / persist 1.18 /
    # this 1.01 s — the barrier beats a cache (no materialization job,
    # no memory pinned).
    return video_stats(media).repartition("media_id").orderBy("media_id")


@query(
    "events_gapfill",
    oracle="""
    WITH b AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS sv,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM b GROUP BY 1),
    dense AS (SELECT user_id, UNNEST(RANGE(lo, hi + 1)) AS day FROM bounds),
    j AS (
        SELECT d.user_id, d.day, CAST(b.sv AS DOUBLE) / b.cnt AS v
        FROM dense d LEFT JOIN b ON b.user_id = d.user_id AND b.day = d.day
    ),
    w AS (
        SELECT user_id, day, v,
               last_value(v IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
               first_value(v IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        FROM j
    )
    SELECT user_id, CAST(day AS BIGINT) AS day,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * ((day - pb) / (nb - pb))
                 END, 6) AS value,
           CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS interpolated
    FROM w ORDER BY user_id, day
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with linear interpolation
    (operators/timeseries.gapfill_linear) — the lerp family (SURVEY §2.8
    F18, math/lerp.rs) applied across missing samples, the dashboard
    densify-and-interpolate operator: per-user daily value averages are
    densified over each user's own [first, last] day and interior gaps
    are lerped between nearest observed neighbors. Exactly one shuffle
    on the series key (the dense explode, the observation join, and both
    IGNORE-NULLS window passes share the user_id partitioning). The
    per-day average is built from floor-scaled-micros integer sums so
    both engines interpolate identical correctly-rounded doubles; the
    oracle mirrors the lerp term-for-term."""
    from micromegas_spark.operators.timeseries import gapfill_linear

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.expr("ts_us DIV 86400000000").alias("day"),
            F.floor(F.col("value") * 1000000).cast("bigint").alias("_micros"),
        )
        .groupBy("user_id", "day")
        .agg(
            (F.sum("_micros").cast("double") / F.count("*")).alias("value")
        )
    )
    out = gapfill_linear(daily, "user_id", "day", "value")
    return out.select(
        "user_id",
        "day",
        F.round("value", 6).alias("value"),
        "interpolated",
    ).orderBy("user_id", "day")


_SPAN_SELFTIME_ORACLE = """
    WITH numbered AS (
        SELECT CAST(user_id AS VARCHAR) AS stream_id, event_id,
               epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
    ),
    marked AS (
        SELECT stream_id, ts_us, rn,
               CASE WHEN (rn - 1) % 8 IN (0, 1, 3, 6) THEN 1 ELSE -1 END AS delta
        FROM numbered WHERE rn <= 8 * (cnt // 8)
    ),
    depths AS (
        SELECT *, CAST(SUM(delta) OVER (PARTITION BY stream_id ORDER BY rn) AS BIGINT) AS c
        FROM marked
    ),
    begins AS (
        SELECT stream_id, ts_us AS begin_ts, c AS d,
               ROW_NUMBER() OVER (PARTITION BY stream_id, c ORDER BY rn) AS k
        FROM depths WHERE delta = 1
    ),
    ends AS (
        SELECT stream_id, ts_us AS end_ts, c + 1 AS d,
               ROW_NUMBER() OVER (PARTITION BY stream_id, c ORDER BY rn) AS k
        FROM depths WHERE delta = -1
    ),
    spans AS (
        SELECT b.stream_id, b.d, b.begin_ts, e.end_ts,
               e.end_ts - b.begin_ts AS duration
        FROM begins b JOIN ends e USING (stream_id, d, k)
    ),
    kids AS (
        SELECT p.stream_id, p.d, p.begin_ts,
               CAST(SUM(c.duration) AS BIGINT) AS child_dur
        FROM spans p JOIN spans c
          ON c.stream_id = p.stream_id AND c.d = p.d + 1
         AND c.begin_ts >= p.begin_ts AND c.end_ts <= p.end_ts
        GROUP BY 1, 2, 3
    )
    SELECT s.stream_id, CAST(s.d - 1 AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(s.duration) AS BIGINT) AS total_duration,
           CAST(SUM(s.duration - COALESCE(k.child_dur, 0)) AS BIGINT) AS total_self
    FROM spans s LEFT JOIN kids k USING (stream_id, d, begin_ts)
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@query("events_span_selftime", oracle=_SPAN_SELFTIME_ORACLE)
def events_span_selftime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flamegraph EXCLUSIVE time — the profiler rollup every tracing UI
    renders (reference: span trees feed Perfetto; self time = duration −
    Σ direct children): the stack machine's parent links make it one
    aggregate on parent id + one left join, both partition-local to the
    stream key. The oracle recomputes parenthood independently via
    depth-containment (the unique d−1 span enclosing each span), so the
    parent links themselves are what's being checked, not just durations.
    Output: per (stream, depth) span counts, inclusive and exclusive
    totals."""
    from pyspark import StorageLevel

    from micromegas_spark.operators.spans import build_thread_spans, span_self_times

    ev = load_table(spark, sf_dir, "events")
    # persisted: span_self_times self-joins spans against its own child-sum
    # aggregate — without the persist the applyInPandas stack machine (and
    # the three synth windows feeding it) executes on BOTH sides of the
    # join (measured: 2 FlatMapGroupsInPandas + 6 Window nodes in the plan;
    # guide §1.2 — don't compute the expensive subtree twice)
    spans = track(
        build_thread_spans(_synth_nested_events(ev), 0, 2**62).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    s = span_self_times(spans, key_cols=["stream_id"]).select(
        "stream_id", "depth", "duration", "self_time"
    )
    return (
        s.groupBy("stream_id", "depth")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum("duration").cast("bigint").alias("total_duration"),
            F.sum("self_time").cast("bigint").alias("total_self"),
        )
        .transform(ordered, "stream_id", "depth")
    )


_JIT_NET_SPANS_ORACLE = """
    WITH numbered AS (
        SELECT CAST(user_id AS VARCHAR) AS conn, event_id,
               epoch_us(ts) AS off,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
        WHERE user_id IN
          (SELECT user_id FROM events GROUP BY user_id ORDER BY user_id LIMIT 4)
    ),
    marked AS (
        SELECT conn, event_id, off, rn,
               CASE WHEN (rn - 1) % 8 IN (0, 1, 3, 6) THEN 1 ELSE -1 END AS delta
        FROM numbered WHERE rn <= 8 * (cnt // 8)
    ),
    depths AS (
        SELECT *, CAST(SUM(delta) OVER (PARTITION BY conn ORDER BY rn) AS BIGINT) AS c
        FROM marked
    ),
    begins AS (
        SELECT conn, event_id, off AS b_off, c AS d,
               ROW_NUMBER() OVER (PARTITION BY conn, c ORDER BY rn) AS k
        FROM depths WHERE delta = 1
    ),
    ends AS (
        SELECT conn, off AS e_off, c + 1 AS d,
               ROW_NUMBER() OVER (PARTITION BY conn, c ORDER BY rn) AS k
        FROM depths WHERE delta = -1
    ),
    spans AS (
        SELECT b.conn, b.d - 1 AS depth, b.event_id % 2 = 0 AS is_outgoing,
               e.e_off - b.b_off AS bits
        FROM begins b JOIN ends e USING (conn, d, k)
    )
    SELECT conn AS connection_name,
           CASE WHEN depth = 0 THEN 'connection' WHEN depth = 1 THEN 'object'
                WHEN depth = 2 THEN 'property' ELSE 'rpc' END AS kind,
           is_outgoing,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(bits) AS BIGINT) AS total_bits
    FROM spans GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """


@query(
    "events_jit_net_spans",
    oracle=_JIT_NET_SPANS_ORACLE,
)
def events_jit_net_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """net_spans bit-offset trees built THROUGH the event-time JIT path —
    the second view the reference's #1429 fix covers (CHANGELOG.md:8 names
    BOTH thread_spans and net_spans; net_span_tree.rs:19-50 is the tree
    builder): the thread-span synthesis re-labeled onto the bit axis
    (offset_bits = the synthesized cumulative offsets; the stack machine
    only needs a non-decreasing axis), each connection's events split into
    3 event-time blocks REGISTERED IN REVERSE insert order and fed through
    Engine.view_instance's block-aware grouping with the NEW write-time
    ensure_begin_non_decreasing check enabled.

    Reversed insert order makes every interior cut insert-UNSAFE, so all
    3 blocks land in ONE JIT partition and spans whose begin and end live
    in different blocks still assemble — insert-order bucketing (the
    pre-#1429 behavior) would fragment these trees. The result is the
    bandwidth_rollup view (connection x kind x direction), proving both
    the tree shape (depth -> kind) and the bit accounting survive the JIT
    round-trip against the balanced-parentheses SQL oracle."""
    import hashlib
    import os
    import tempfile

    from pyspark.sql import Window

    from micromegas_spark.engine import Engine, JitViewSet
    from micromegas_spark.views.netspans import bandwidth_rollup, build_net_spans

    ev = load_table(spark, sf_dir, "events")
    ids = [
        r[0]
        for r in ev.select("user_id").distinct().orderBy("user_id").limit(4).collect()
    ]
    events = _synth_nested_events(ev.where(F.col("user_id").isin(ids))).select(
        F.col("stream_id").alias("connection_name"),
        "event_id",
        "event_type",
        F.col("time_ns").alias("offset_bits"),
        (F.col("event_id") % 2 == 0).alias("is_outgoing"),
        "name",
    )
    w = Window.partitionBy("connection_name").orderBy("offset_bits", "event_id")
    # post-window coalesce before the persist — same rationale as the
    # jit_thread_spans fixture: don't pin the scale shuffle partitioning
    # into a 4-connection cached relation
    evb = (
        events.withColumn("blk", F.ntile(3).over(w))
        .coalesce(spark.sparkContext.defaultParallelism)
        .persist()
    )
    try:
        meta = evb.groupBy("connection_name", "blk").agg(
            F.min("offset_bits").alias("lo"),
            F.max("offset_bits").alias("hi"),
            F.count("*").alias("n"),
        ).collect()  # bounded: 4 connections x 3 blocks
        blocks: dict[str, list[dict]] = {}
        for r in meta:
            blocks.setdefault(r["connection_name"], []).append(
                {
                    "block_id": f"{r['connection_name']}/{r['blk']}",
                    "begin_ns": r["lo"],
                    "end_ns": r["hi"] + 1,
                    # REVERSED: latest bit-offset block inserts first
                    "insert_ns": 4 - r["blk"],
                    "nb_objects": r["n"],
                }
            )

        def list_blocks(instance, b, e):
            return [
                m
                for m in blocks.get(instance, [])
                if m["begin_ns"] < e and m["end_ns"] > b
            ]

        def build_blocks(instance, block_ids):
            blks = [int(bid.split("/")[-1]) for bid in block_ids]
            src = evb.where(
                (F.col("connection_name") == instance) & F.col("blk").isin(blks)
            )
            return build_net_spans(src)

        # content-keyed warehouse: repeat runs hit the manifest cache
        # (see events_jit_thread_spans for the reuse-safety argument)
        wh = os.path.join(
            tempfile.gettempdir(),
            f"jit_net_spans_{hashlib.sha1(sf_dir.encode()).hexdigest()[:12]}",
        )
        eng = Engine(spark, warehouse=wh)
        eng.register_jit_view_set(
            JitViewSet(
                "jit_net_spans",
                source_count=lambda *_: 0,
                build=lambda *_: None,
                time_column="begin_bits",
                list_blocks=list_blocks,
                build_blocks=build_blocks,
                ensure_begin_non_decreasing=True,
            )
        )
        parts = [
            eng.view_instance("jit_net_spans", cid, 0, 2**62)
            for cid in sorted(blocks)
        ]
        if not parts:  # degenerate tiny-SF fallback: no balanced streams
            return ordered(
                bandwidth_rollup(build_net_spans(events)),
                "connection_name", "kind", "is_outgoing",
            )
        spans = parts[0]
        for p in parts[1:]:
            spans = spans.unionByName(p)
        return ordered(
            bandwidth_rollup(spans), "connection_name", "kind", "is_outgoing"
        )
    finally:
        evb.unpersist(blocking=False)


_OTEL_HIERARCHY_ORACLE = """
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us
        FROM events WHERE user_id % 29 = 0
    ),
    numbered AS (
        SELECT user_id, event_id, ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn,
               FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS root_eid
        FROM ev
    ),
    spans AS (
        SELECT lower(printf('%016x', user_id)) AS trace_id,
               lower(printf('%016x', event_id)) AS span_id,
               CASE WHEN rn = 1 THEN NULL
                    ELSE lower(printf('%016x', root_eid)) END AS parent_span_id,
               'span_' || CAST(event_id % 10 AS VARCHAR) AS name,
               (event_id % 1000) + 1 AS dur,
               event_id % 5 AS code,
               event_id % 3 AS retries
        FROM numbered
    )
    SELECT c.trace_id, c.span_id,
           p.name AS parent_name,
           CAST(c.code AS BIGINT) AS code,
           CASE WHEN c.code >= 3 THEN '[' || CAST(c.retries AS VARCHAR) || ']'
                ELSE '[]' END AS hot_retries,
           ROUND(CAST(c.dur AS DOUBLE) / p.dur, 6) AS parent_share
    FROM spans c JOIN spans p ON c.parent_span_id = p.span_id
    ORDER BY c.trace_id, c.span_id
    """


@query(
    "events_otel_hierarchy",
    oracle=_OTEL_HIERARCHY_ORACLE,
)
def events_otel_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """otel_spans driver-oracle coverage (reference
    rust/analytics/src/lakehouse/otel/spans_table.rs:1-77,
    schema-reference.md:527-540): synthesizes OTel-shaped spans from the
    events table (each sampled user = a trace; the first event is the
    SERVER root, later events are INTERNAL children; events_json carries
    an attributes object derived from event_id so the oracle can recompute
    the JSON extraction arithmetically), then runs the REAL view pipeline:
    otel_spans_view normalization -> span_children hierarchy join ->
    jsonb_path_query/jsonb_path_query_first over the span's OTel event
    attributes, including the documented [*] ? (@.f >= lit) filter form.

    Scale shape: the hierarchy join is a self equi-join on span ids (one
    shuffle, no pair blowup — every child has exactly one parent); the
    JSONB hops are the function surface's single Arrow-batched UDF."""
    from pyspark.sql import Window

    from micromegas_spark.functions.jsonb import (
        jsonb_path_query,
        jsonb_path_query_first,
    )
    from micromegas_spark.views.otel import otel_spans_view, span_children

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 29 == 0)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    n = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.row_number().over(w).alias("rn"),
        F.first("event_id").over(w).alias("root_eid"),
    )
    raw = n.select(
        F.format_string("%016x", F.col("user_id")).alias("trace_id"),
        F.format_string("%016x", F.col("event_id")).alias("span_id"),
        F.when(F.col("rn") == 1, F.lit(None).cast("string"))
        .otherwise(F.format_string("%016x", F.col("root_eid")))
        .alias("parent_span_id"),
        F.concat(F.lit("span_"), (F.col("event_id") % 10).cast("string")).alias("name"),
        F.when(F.col("rn") == 1, F.lit("SERVER"))
        .otherwise(F.lit(None).cast("string"))
        .alias("kind"),
        F.when(F.col("event_id") % 7 == 0, F.lit("ERROR"))
        .otherwise(F.lit(None).cast("string"))
        .alias("status"),
        F.col("ts_us").alias("start_time_ns"),
        (F.col("ts_us") + F.col("event_id") % 1000 + 1).alias("end_time_ns"),
        F.to_json(
            F.array(
                F.struct(
                    F.lit("evt").alias("name"),
                    F.struct(
                        (F.col("event_id") % 5).alias("code"),
                        (F.col("event_id") % 3).alias("retries"),
                    ).alias("attributes"),
                )
            )
        ).alias("events_json"),
        F.lit("[]").alias("links_json"),
    )
    spans = otel_spans_view(raw)
    kids = span_children(spans)
    ej = spans.select(F.col("span_id").alias("c_span_id"), "events_json")
    return (
        kids.join(ej, kids.span_id == ej.c_span_id)
        .select(
            "trace_id",
            "span_id",
            "parent_name",
            jsonb_path_query_first(F.col("events_json"), "$[0].attributes.code")
            .cast("bigint")
            .alias("code"),
            jsonb_path_query(
                F.col("events_json"),
                "$[*] ? (@.attributes.code >= 3).attributes.retries",
            ).alias("hot_retries"),
            F.round("parent_share", 6).alias("parent_share"),
        )
        # NOTE (r11, measured): a pre-sort shuffle barrier (the media-
        # roundtrip pattern) measured 3x WORSE here (2.5 vs 0.8 s warm) —
        # the jsonb hops above the join are cheap relative to the extra
        # exchange, and the sampler's re-run starts from the join's
        # already-materialized shuffle stages. Left barrier-free.
        .orderBy("trace_id", "span_id")
    )


_TRANSIT_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_time,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_time,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events WHERE user_id % 31 = 0
    GROUP BY event_type ORDER BY event_type
    """


def _transit_event_blocks(spark: SparkSession, sf_dir: str):
    """Shared fixture for the transit parity queries: each sampled user's
    events encoded into one real transit block (see
    events_transit_roundtrip docstring for the wire layout) → (blocks
    DataFrame of block_id/payload/dependencies_metadata/objects_metadata,
    user_id carried for wave splitting; the UDT metadata bytes)."""
    import struct as _struct

    import pandas as pd

    from micromegas_spark.sources.transit import (
        Member,
        UserDefinedType,
        encode_block_payload,
        udts_to_cbor,
    )
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    udts = [
        UserDefinedType("StaticString", 0),
        UserDefinedType(
            "MeasureEvent",
            24,
            [
                Member("etype", "ref", 0, 8, True),
                Member("time", "i64", 8, 8, False),
                Member("value", "f64", 16, 8, False),
            ],
        ),
    ]
    meta = udts_to_cbor(udts)
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("block_id", StringType()),
            StructField("payload", BinaryType()),
            StructField("dependencies_metadata", BinaryType()),
            StructField("objects_metadata", BinaryType()),
        ]
    )

    def encode(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        types = sorted(pdf["event_type"].unique())
        tid = {t: i + 1 for i, t in enumerate(types)}
        deps = b"".join(
            bytes([0])
            + _struct.pack("<I", 8 + len(t.encode()))
            + _struct.pack("<Q", tid[t])
            + t.encode()
            for t in types
        )
        objs = b"".join(
            bytes([1]) + _struct.pack("<Qqd", tid[t], int(ts), float(v))
            for t, ts, v in zip(pdf["event_type"], pdf["ts_us"], pdf["value"])
        )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "block_id": [str(pdf["user_id"].iloc[0])],
                "payload": [encode_block_payload(deps, objs)],
                "dependencies_metadata": [meta],
                "objects_metadata": [meta],
            }
        )

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 31 == 0)
    blocks = (
        ev.select("user_id", "event_id", "ts_us", "event_type", "value")
        .groupBy("user_id")
        .applyInPandas(encode, out_schema)
    )
    return blocks, meta


def _transit_agg(parsed: DataFrame) -> DataFrame:
    """The shared tail of the transit parity queries: decoded JSON rows →
    the per-type extrema the plain-SQL oracle computes from raw events."""
    return (
        parsed.select(
            F.get_json_object("value", "$.etype").alias("event_type"),
            F.get_json_object("value", "$.time").cast("bigint").alias("t"),
            F.get_json_object("value", "$.value").cast("double").alias("v"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            # min/max, not SUM: epoch-µs times summed over a large SF
            # overflow int64 (measured at sf1) — and extrema prove the
            # same per-field decode fidelity without the overflow regime
            F.min("t").alias("min_time"),
            F.max("t").alias("max_time"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
        )
        .transform(ordered, "event_type")
    )


@query("events_transit_roundtrip", oracle=_TRANSIT_ORACLE)
def events_transit_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native transit binary decode, end-to-end through Spark (reference
    rust/transit/src/parser.rs + rust/analytics/src/payload.rs — the
    VERDICT-r6 'missing #3' parity edge): each sampled user's events are
    ENCODED into a real transit block (StaticString dependencies for the
    event types; 24-byte POD MeasureEvent objects with a reference member,
    an i64 time and an f64 value; both buffers lz4-framed inside the CBOR
    BlockPayload envelope — the exact wire layout the reference's
    ingestion writes, modulo block-level compression choice), then
    DECODED by sources.transit.parse_transit_blocks with the UDT metadata
    carried as the CBOR binary column the reference's streams table
    stores. Matching the plain-SQL oracle proves byte-level format
    fidelity: a wrong offset, endianness, string codec, or lz4 frame
    field would corrupt every aggregate.

    Scale shape: encode and decode are both per-block mapInPandas /
    applyInPandas stages — blocks are the unit of parallelism, zero
    driver involvement; the final aggregate is an ordinary hash agg."""
    from micromegas_spark.sources.transit import parse_transit_blocks

    blocks, _ = _transit_event_blocks(spark, sf_dir)
    return _transit_agg(parse_transit_blocks(blocks.drop("user_id")))


@query("events_transit_stream", oracle=_TRANSIT_ORACLE)
def events_transit_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING native-transit blob ingestion ≡ batch ≡ SQL oracle: the
    SAME encoded blocks as events_transit_roundtrip land as real blob
    FILES in the reference's blob-storage layout (``blobs/{process_id}/
    {stream_id}/{block_id}``, rust/analytics/src/payload.rs:25-27) over
    TWO waves, each drained by a separate checkpointed
    stream_transit_blobs run (readStream binaryFile → stream-static join
    to the streams metadata table for the CBOR UDT columns →
    parse_transit_blocks → append parquet sink, trigger availableNow —
    the reference's ingestion maintenance tick). The second run shares
    the first's checkpoint, so exactly-once file tracking across
    restarts is what the oracle hash actually certifies: a re-ingested
    wave-1 blob would double a count; a dropped wave-2 blob would lose
    one.

    Scale shape: ingest parallelism is the file-scan parallelism
    (stateless projection + stream-static join + mapInPandas; no state
    store); blob files are written from EXECUTORS via foreachPartition —
    on a cluster that is the object store the producers already wrote
    to, here a shared local tree."""
    import os

    from micromegas_spark.sources.transit import (
        stream_transit_blobs,
        write_transit_blobs,
    )
    from micromegas_spark.streaming.incremental import process_scratch_dir

    blocks, meta = _transit_event_blocks(spark, sf_dir)
    # NOT persisted, deliberately (measured this round): the per-wave
    # filter is on the encode's GROUPING key, so Catalyst pushes it below
    # the applyInPandas — each wave encodes only its own half (no
    # duplicated work to cache away), AQE coalesces the fused
    # encode+write to a handful of tasks, and a persist would both pin
    # the scale shuffle partitioning into the cache (260 pickled-row
    # Python tasks per wave write, measured 1.8 s vs 0.4 s) and add a
    # blocking materialization pass.

    # per-pid scratch with dead-pid reaping (no unbounded /tmp growth
    # across crashed runs; concurrent sessions keep their own trees)
    scratch = process_scratch_dir("transit_stream")
    blob_root = os.path.join(scratch, "blobs")
    out_dir = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")
    # two streams under one process, same UDT metadata — the stream-static
    # join has to route each blob to ITS stream's metadata row
    streams_meta = spark.createDataFrame(
        [("s-even", bytearray(meta), bytearray(meta)),
         ("s-odd", bytearray(meta), bytearray(meta))],
        "stream_id STRING, dependencies_metadata BINARY, "
        "objects_metadata BINARY",
    )

    def write_wave(wave_df) -> None:
        # URI-addressed executor-side writes (transit.write_transit_blobs):
        # the same call works against file://, s3a:// or hdfs:// roots,
        # with atomicity delegated to the FS contract (PUT on object
        # stores, tmp+rename where creates are observable mid-write)
        write_transit_blobs(
            wave_df.select(
                F.when(F.col("user_id") % 2 == 0, F.lit("s-even"))
                .otherwise(F.lit("s-odd"))
                .alias("stream_id"),
                "block_id",
                "payload",
            ),
            blob_root,
            "proc-1",
        )

    os.makedirs(blob_root, exist_ok=True)
    # wave split on a hash of the user id so both waves hit both streams
    for wave in (0, 1):
        write_wave(blocks.where(F.abs(F.hash("user_id")) % 2 == wave))
        q = stream_transit_blobs(spark, blob_root, streams_meta, out_dir, ckpt)
        q.awaitTermination()
    return _transit_agg(spark.read.parquet(out_dir))


@query(
    "events_perfetto_roundtrip",
    oracle="""
    WITH spans AS (
        SELECT 'thread' AS sub,
               'thread-' || CAST(user_id % 8 AS VARCHAR) AS stream_id,
               'op-' || CAST(event_id % 5 AS VARCHAR) AS name,
               epoch_us(ts) AS b,
               epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT) + 1 AS e
        FROM events WHERE event_type = 'click' AND user_id % 31 = 0
        UNION ALL
        SELECT 'async',
               'async-' || CAST(user_id % 8 AS VARCHAR),
               'op-' || CAST(event_id % 5 AS VARCHAR),
               epoch_us(ts),
               epoch_us(ts) + 2 * CAST(round(value * 1000000) AS BIGINT) + 1
        FROM events WHERE event_type = 'view' AND user_id % 31 = 0
    ),
    sel AS (
        SELECT 'thread' AS span_type, stream_id, name, b, e
        FROM spans WHERE sub = 'thread'
        UNION ALL
        SELECT 'async', stream_id, name, b, e FROM spans WHERE sub = 'async'
        UNION ALL
        SELECT 'both', stream_id, name, b, e FROM spans
    ),
    begins AS (
        SELECT span_type, stream_id, name,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               MIN(b) AS min_begin_us, MAX(b) AS max_begin_us
        FROM sel GROUP BY span_type, stream_id, name
    ),
    ends AS (
        SELECT span_type, stream_id,
               CAST(COUNT(*) AS BIGINT) AS n_ends, MAX(e) AS max_end_us
        FROM sel GROUP BY span_type, stream_id
    )
    SELECT b.span_type AS span_type, b.stream_id AS stream_id, b.name AS name,
           b.n_spans AS n_spans, b.min_begin_us AS min_begin_us,
           b.max_begin_us AS max_begin_us, e.n_ends AS n_ends,
           e.max_end_us AS max_end_us
    FROM begins b
    JOIN ends e ON b.span_type = e.span_type AND b.stream_id = e.stream_id
    ORDER BY span_type, stream_id, name
    """,
)
def events_perfetto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perfetto trace export, decoded BACK and differentially checked —
    the reference's perfetto_trace_chunks UDTF
    (perfetto_trace_execution_plan.rs:584; functions-reference.md:85-136)
    covering all three span_type arguments: 'thread' (click events as
    nested-track slices), 'async' (view events as async-track slices) and
    'both' (the union, exactly like the reference's combined export).
    Each set flows through trace_chunks(serializer='perfetto') — the
    hand-rolled protobuf wire writer, globally-numbered bounded chunks —
    and the chunks are decoded back by the independent wire reader
    (sources/perfetto.decode_trace) inside an Arrow-batched mapInPandas:
    TrackDescriptor packets rebuild the uuid→stream map per chunk (the
    writer re-emits descriptors idempotently, the property Perfetto's
    trace processor relies on), TrackEvents yield (stream, type, ts,
    name) rows. Grouping those per (span_type, stream, name) for
    SLICE_BEGIN and per (span_type, stream) for SLICE_END and matching
    the plain-SQL oracle computed from raw events proves byte-level wire
    fidelity end-to-end: a wrong varint, field tag, uuid hash routing, or
    a dropped/duplicated chunk shifts a count or timestamp and fails the
    hash. (ENDs carry no name on the wire — per-name stats come from
    BEGINs, per-track END counts/extrema prove the other half.)

    Scale shape: chunking is trace_chunks' fully-parallel bucket
    numbering (no global window); decode is per-chunk mapInPandas —
    chunks are the unit of parallelism, zero driver involvement."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import Window

    from micromegas_spark.operators.spans import trace_chunks
    from micromegas_spark.sources.perfetto import (
        TYPE_SLICE_BEGIN,
        TYPE_SLICE_END,
        decode_trace,
    )

    # persist the (tiny) sampled-event slice: the three exports read their
    # span inputs SIX times between them (trace_chunks materializes its
    # input for the boundary/count jobs, then the final numbering pass
    # recomputes the lineage; 'both' additionally re-derives thread+async)
    # and user_id % 31 cannot push down to parquet, so each execution was
    # a full events.parquet scan — measured 8 scan stanzas in the plan.
    # One cache of the 1/31 slice serves every consumer (guide §1.2/§5).
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 31 == 0)
        .where(F.col("event_type").isin("click", "view"))
        .select("event_id", "user_id", "event_type", "ts_us", "value")
        .persist()
    )
    track(ev)
    # EAGER: the three export threads below would otherwise race the lazy
    # cache's first materialization and each re-run the 1/31 sampled scan
    # (the nb_classify/fuzzyjoin broadcast-thread race; ADVICE r11 #1) —
    # one blocking count materializes the slice once.
    ev.count()

    def spanify(etype: str, prefix: str, dur_mult: int) -> DataFrame:
        dur = F.round(F.col("value") * 1000000).cast("bigint")
        return ev.where(F.col("event_type") == etype).select(
            F.col("event_id").alias("span_id"),
            F.concat(F.lit(prefix + "-"), (F.col("user_id") % 8).cast("string")).alias("stream_id"),
            F.concat(F.lit("op-"), (F.col("event_id") % 5).cast("string")).alias("name"),
            (F.col("event_id") % 3).cast("int").alias("depth"),
            F.col("ts_us").alias("begin_ns"),
            (F.col("ts_us") + dur_mult * dur + 1).alias("end_ns"),
        )

    thread = spanify("click", "thread", 1)
    asyncs = spanify("view", "async", 2)

    def dec(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = {"stream_id": [], "etype": [], "ts": [], "name": []}
            for data in pdf["chunk_data"]:
                uuid2name: dict = {}
                for p in decode_trace(bytes(data)):
                    if "track_descriptor" in p:
                        td = p["track_descriptor"]
                        uuid2name[td["uuid"]] = td["name"]
                    elif "track_event" in p:
                        te = p["track_event"]
                        rows["stream_id"].append(uuid2name[te["track_uuid"]])
                        rows["etype"].append(int(te["type"]))
                        rows["ts"].append(int(p["timestamp"]))
                        rows["name"].append(te.get("name"))
            yield pd.DataFrame(rows)

    def roundtrip(spans: DataFrame, span_type: str) -> DataFrame:
        chunks = trace_chunks(spans, chunk_rows=512)
        return chunks.select("chunk_data").mapInPandas(
            dec, schema="stream_id string, etype int, ts long, name string"
        ).withColumn("span_type", F.lit(span_type))

    # build the three exports from a 3-thread pool (guide §2.6): each
    # trace_chunks runs two small driver actions (boundary quantiles +
    # per-bucket counts) before returning, and the three exports are
    # independent until the final union — serially those six jobs ran
    # back-to-back on an otherwise idle cluster. The pool only overlaps
    # the prep jobs; the timed save still executes the union as one job.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(roundtrip, thread, "thread"),
            pool.submit(roundtrip, asyncs, "async"),
            pool.submit(roundtrip, thread.unionByName(asyncs), "both"),
        ]
        parts = [f.result() for f in futs]
    decoded = parts[0].unionByName(parts[1]).unionByName(parts[2])
    # ONE pass over the decoded stream: begins and ends previously hung off
    # `decoded` as two separate aggregations, which re-executed the whole
    # encode+decode chain (3 exports x 2 mapInPandas each) on both sides of
    # the final join — 12 Python stages instead of 6 (guide §1.2 "don't
    # compute things twice"). ENDs carry no name on the wire (name IS NULL),
    # BEGINs always do, so a single (span_type, stream_id, name) aggregate
    # with etype-conditioned measures separates the two exactly; the ends
    # rollup then re-aggregates that already-tiny relation.
    g = decoded.groupBy("span_type", "stream_id", "name").agg(
        F.count(F.when(F.col("etype") == TYPE_SLICE_BEGIN, 1)).alias("n_spans"),
        F.min(F.when(F.col("etype") == TYPE_SLICE_BEGIN, F.col("ts"))).alias("min_begin_us"),
        F.max(F.when(F.col("etype") == TYPE_SLICE_BEGIN, F.col("ts"))).alias("max_begin_us"),
        F.count(F.when(F.col("etype") == TYPE_SLICE_END, 1)).alias("_n_end"),
        F.max(F.when(F.col("etype") == TYPE_SLICE_END, F.col("ts"))).alias("_max_end"),
    )
    # the per-track END rollup rides a window over the already-tiny grouped
    # relation instead of a second aggregation + join — a begins.join(ends)
    # spelling re-executes g's whole lineage (the decode chain) on both
    # sides; the window keeps it one pass and one extra exchange of ~100
    # rows. Every decoded span emits BEGIN and END in the same chunk, so
    # per-stream END totals over all name groups equal the old inner join.
    w = Window.partitionBy("span_type", "stream_id")
    return (
        g.withColumn("n_ends", F.sum("_n_end").over(w).cast("bigint"))
        .withColumn("max_end_us", F.max("_max_end").over(w))
        .where(F.col("n_spans") > 0)
        .select(
            "span_type", "stream_id", "name", "n_spans",
            "min_begin_us", "max_begin_us", "n_ends", "max_end_us",
        )
        .transform(ordered, "span_type", "stream_id", "name")
    )
