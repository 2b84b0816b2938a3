"""Contract queries for engine machinery that the plain-SQL oracle can't
express (rows-only driver checks — the unit/property tests in tests/ carry
the exact-semantics burden), plus the color_scale oracle query (F16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micromegas_spark.functions.color import _COLORMAPS, color_scale
from micromegas_spark.queries.registry import query
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

    # no ORDER BY: the driver's comparison is order-insensitive and a
    # global sort of the exploded rows would dominate the query
    ev = load_table(spark, sf_dir, "events").select("event_id", "props")
    return jsonb_each(ev, "props", ["event_id"])


@query(
    "events_thread_spans",
    oracle="""
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
    """,
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
    from pyspark.sql import Window

    from micromegas_spark.operators.spans import build_thread_spans

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    numbered = ev.select(
        F.col("user_id").cast("string").alias("stream_id"),
        F.col("event_id"),
        F.col("ts_us").alias("time_ns"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("cnt"),
    ).where(F.col("rn") <= (F.col("cnt") / 8).cast("bigint") * 8)
    delta = F.when(((F.col("rn") - 1) % 8).isin(0, 1, 3, 6), F.lit(1)).otherwise(
        F.lit(-1)
    )
    wc = Window.partitionBy("stream_id").orderBy("rn")
    marked = numbered.withColumn("delta", delta).withColumn(
        "c", F.sum("delta").over(wc)
    )
    events = marked.select(
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
    spans = build_thread_spans(events, 0, 2**62)
    return (
        spans.groupBy("stream_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.max("depth").alias("max_depth"),
            F.min("duration").alias("min_duration"),
            F.sum("duration").alias("total_duration"),
        )
        .orderBy("stream_id")
    )


@query("emb_kmeans", oracle=None)
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embeddings table (rows-only: iterative
    algorithm, not SQL-expressible; objective-decrease and determinism
    covered by tests/test_clustering.py). Reports per-cluster size and
    mean squared distance."""
    from micromegas_spark.operators.clustering import kmeans

    e = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(e, k=8, max_iter=2)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("sq_dist"), 4).alias("avg_sq_dist"),
        )
        .orderBy("cluster")
    )


@query("docs_media_pipeline", oracle=None)
def docs_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing exercised on driver data (rows-only: the decode
    backend is a deterministic fake — no image libs in the environment;
    schema/batching semantics covered by tests/test_streaming_multimodal).

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
        .orderBy("source")
    )
