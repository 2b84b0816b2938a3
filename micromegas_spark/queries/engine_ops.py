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


@query("events_thread_spans", oracle=None)
def events_thread_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thread-span call-tree building exercised on driver data (rows-only:
    the stack machine isn't SQL-expressible; exact semantics are covered
    by tests/test_spans.py + hypothesis invariants).

    Synthesizes a well-formed begin/end stream per user from the events
    table: each user's rows (ordered by time) alternate begin/end with a
    LIFO hash discipline, then operators/spans.build_thread_spans builds
    per-user call trees and the query reports per-user span statistics."""
    from pyspark.sql import Window

    from micromegas_spark.operators.spans import build_thread_spans

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    numbered = ev.select(
        F.col("user_id").cast("string").alias("stream_id"),
        F.col("event_id"),
        F.col("ts_us").alias("time_ns"),
        F.row_number().over(w).alias("rn"),
    )
    # depth pattern: rows pair up as begin/end of nested frames —
    # rn 1,2,3,4.. → begin(h=rn//2+1) for odd, end matching LIFO for even.
    # Simplest well-formed discipline: consecutive pairs (1,2), (3,4)...
    # are sibling spans; hash = pair index, guaranteed LIFO-consistent.
    events = numbered.select(
        "stream_id",
        "event_id",
        F.when(F.col("rn") % 2 == 1, F.lit("begin")).otherwise(F.lit("end")).alias("event_type"),
        "time_ns",
        ((F.col("rn") + 1) / 2).cast("bigint").alias("hash"),
        F.concat(F.lit("span"), ((F.col("rn") + 1) / 2).cast("bigint")).alias("name"),
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
