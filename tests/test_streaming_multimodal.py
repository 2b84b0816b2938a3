"""Structured-Streaming incremental materialization (exactly-once via
checkpoint, composable partial aggregates) and multimodal mapInPandas
plumbing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from micromegas_spark.operators import multimodal as MM
from micromegas_spark.sources.synthetic import generate
from micromegas_spark.streaming.incremental import materialize_stream, read_log_stats

LOG_SCHEMA = StructType(
    [
        StructField("process_id", StringType()),
        StructField("time_ns", LongType()),
        StructField("level", IntegerType()),
        StructField("target", StringType()),
    ]
)


def test_stream_materialize_incremental_exactly_once(spark, tmp_path):
    data = generate(seed=11)
    rows = [
        (r["process_id"], r["time_ns"], r["level"], r["target"]) for r in data["log_entries"]
    ]
    half = len(rows) // 2
    src = str(tmp_path / "landing")
    out = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")

    # batch 1 lands → one availableNow tick
    spark.createDataFrame(rows[:half], LOG_SCHEMA).write.mode("append").parquet(src)
    q = materialize_stream(spark, src, LOG_SCHEMA, out, ckpt)
    q.awaitTermination()

    # batch 2 lands → a second tick processes ONLY the new files
    spark.createDataFrame(rows[half:], LOG_SCHEMA).write.mode("append").parquet(src)
    q2 = materialize_stream(spark, src, LOG_SCHEMA, out, ckpt)
    q2.awaitTermination()

    merged = {
        (r.time_bin_ns, r.process_id, r.level, r.target): r["count"]
        for r in read_log_stats(spark, out).collect()
    }
    direct = {
        tuple(r)[:4]: r["n"]
        for r in spark.createDataFrame(rows, LOG_SCHEMA)
        .groupBy(
            (F.col("time_ns") - F.col("time_ns") % (60 * 10**9)).alias("time_bin_ns"),
            "process_id",
            "level",
            "target",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert merged == direct  # exactly-once: no double counting across ticks


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate block ids re-delivered within one tick are dropped."""
    import datetime

    from pyspark.sql.types import StructField, StructType, TimestampType

    from micromegas_spark.streaming.incremental import stream_dedup

    schema = StructType(
        [StructField("block_id", StringType()), StructField("event_time", TimestampType())]
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("b1", t0),
        ("b1", t0 + datetime.timedelta(seconds=5)),  # re-delivery
        ("b2", t0 + datetime.timedelta(seconds=10)),
        ("b2", t0 + datetime.timedelta(seconds=11)),
        ("b3", t0 + datetime.timedelta(minutes=2)),
    ]
    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_dedup(stream, ["block_id"], "event_time", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.block_id for r in spark.read.parquet(out).collect())
    assert got == ["b1", "b2", "b3"]


@pytest.fixture()
def media(spark):
    rows = [
        (i, ["image", "audio", "video"][i % 3], bytes([i % 251]) * (100 + i * 13), {"src": f"s{i%4}"})
        for i in range(30)
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_decode_media_deterministic(spark, media):
    a = {r.media_id: (r.width, r.height, r.content_hash) for r in MM.decode_media(media).collect()}
    b = {r.media_id: (r.width, r.height, r.content_hash) for r in MM.decode_media(media).collect()}
    assert a == b and len(a) == 30
    assert all(64 <= w <= 255 and 64 <= h <= 255 for w, h, _ in a.values())


def test_decode_media_pil_backend_stubbed(spark, media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        MM.decode_media(media, backend="pil")


def test_extract_features_feeds_similarity(spark, media):
    from micromegas_spark.operators.similarity import cosine_topk

    feats = MM.extract_features(media).withColumnRenamed("features", "embedding")
    out = cosine_topk(feats, query_id=0, k=5, id_col="media_id")
    rows = out.collect()
    assert len(rows) == 5
    assert all(-1.0 <= r.cos_sim <= 1.0 for r in rows)


def test_sample_frames_fanout(spark, media):
    frames = MM.sample_frames(media, n_frames=4).collect()
    vids = {r.media_id for r in frames}
    assert vids == {i for i in range(30) if i % 3 == 2}
    per = {}
    for r in frames:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())


def test_resize_images_scale(spark, media):
    out = MM.resize_images(media, max_side=100).collect()
    for r in out:
        assert max(r.new_width, r.new_height) <= 100
        if max(r.width, r.height) <= 100:
            assert (r.new_width, r.new_height) == (r.width, r.height)


DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_stream_minhash_neardup_matches_batch(spark, tmp_path):
    """Incremental LSH near-dup over two micro-batches must find exactly
    the pairs the batch operator finds on the full corpus — including
    cross-batch pairs (a doc arriving in batch 2 duplicating a batch-1
    doc), each discovered exactly once."""
    from micromegas_spark.operators.dedup import minhash_near_duplicates
    from micromegas_spark.streaming.incremental import stream_minhash_neardup

    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    docs = [
        (0, base),
        (1, base + " tonight"),                      # near-dup of 0
        (2, "completely different words in this document about spark engines"),
        (3, "another unrelated piece of text mentioning benchmarks and joins"),
        # batch 2:
        (4, base),                                   # exact dup of 0, near 1
        (5, "more unrelated filler text that matches nothing else at all ok"),
    ]
    src = str(tmp_path / "docs_landing")
    store = str(tmp_path / "mh_store")
    pairs = str(tmp_path / "mh_pairs")
    ckpt = str(tmp_path / "mh_ckpt")

    spark.createDataFrame(docs[:4], DOC_SCHEMA).write.mode("append").parquet(src)
    q = stream_minhash_neardup(spark, src, DOC_SCHEMA, store, pairs, ckpt, threshold=0.5)
    q.awaitTermination()
    spark.createDataFrame(docs[4:], DOC_SCHEMA).write.mode("append").parquet(src)
    q2 = stream_minhash_neardup(spark, src, DOC_SCHEMA, store, pairs, ckpt, threshold=0.5)
    q2.awaitTermination()

    got = sorted(
        (r.id_a, r.id_b, r.jaccard) for r in spark.read.parquet(pairs).collect()
    )
    want = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_near_duplicates(
            spark.createDataFrame(docs, DOC_SCHEMA), threshold=0.5
        ).collect()
    )
    assert got == want and len(got) >= 2  # (0,4) exact + at least one near pair
    # exactly-once: no pair appears twice in the append-only pair log
    assert len(got) == len(set(got))


# --- real PIL backend (importorskip-gated: runs in Pillow-equipped envs) ---


def _png_bytes(w, h, color=(200, 30, 30)):
    import io

    from PIL import Image

    im = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def test_decode_media_pil_real_dims(spark):
    pytest.importorskip("PIL")
    rows = [
        (1, "image", _png_bytes(320, 200), {}),
        (2, "image", _png_bytes(64, 48), {}),
        (3, "image", b"not an image at all", {}),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: (r.width, r.height) for r in MM.decode_media(df, backend="pil").collect()}
    assert got[1] == (320, 200) and got[2] == (64, 48)
    assert got[3] == (None, None)  # corrupt blob -> NULL dims, task survives


def test_decode_image_details_pil(spark):
    pytest.importorskip("PIL")
    df = spark.createDataFrame([(1, "image", _png_bytes(20, 10), {})], MM.MEDIA_SCHEMA)
    r = MM.decode_image_details(df).collect()[0]
    assert (r.width, r.height, r.mode, r.format) == (20, 10, "RGB", "PNG")
    assert isinstance(r.exif, dict)


def test_resize_images_pil_real_downscale(spark):
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    rows = [
        (1, "image", _png_bytes(400, 200), {}),  # downscaled
        (2, "image", _png_bytes(50, 40), {}),    # passthrough
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r for r in MM.resize_images(df, max_side=100, backend="pil").collect()}
    assert (got[1].new_width, got[1].new_height) == (100, 50)  # aspect kept
    with Image.open(io.BytesIO(bytes(got[1].payload))) as im:
        assert im.size == (100, 50)  # payload actually re-encoded
    assert (got[2].new_width, got[2].new_height) == (50, 40)
    assert bytes(got[2].payload) == rows[1][2]  # small image passes through


def test_resize_and_details_raise_without_pil(spark, media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        MM.resize_images(media, backend="pil")
    with pytest.raises(NotImplementedError):
        MM.decode_image_details(media)


def test_sample_frames_avi_real_extraction(spark):
    """backend='avi': REAL keyframe extraction — frames come back as PPM
    payloads that the image codec pipeline (pixel_stats) consumes with
    pixel-exact values."""
    import numpy as np

    from micromegas_spark.operators.videocodec import encode_avi

    rng = np.random.default_rng(7)
    clips = {
        1: [rng.integers(0, 256, (4, 6, 3)).astype(np.uint8) for _ in range(6)],
        2: [rng.integers(0, 256, (3, 5, 3)).astype(np.uint8) for _ in range(2)],
    }
    rows = [
        (mid, "video", bytearray(encode_avi(fr, fps=5)), {}) for mid, fr in clips.items()
    ] + [(3, "video", bytearray(b"corrupt"), {}), (4, "image", bytearray(b"x"), {})]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)

    sampled = MM.sample_frames(media, n_frames=3, backend="avi")
    got = {(r.media_id, r.frame_idx) for r in sampled.collect()}
    # clip 1: 6 frames sampled at 0,2,4; clip 2: only 2 frames exist;
    # corrupt and non-video rows yield nothing
    assert got == {(1, 0), (1, 2), (1, 4), (2, 0), (2, 1)}

    stats = MM.pixel_stats(
        sampled.select(
            F.col("media_id"), F.col("frame_payload").alias("payload")
        ).where(F.col("media_id") == 1)
    ).collect()
    import math as _math

    expect = {
        _math.floor(float(clips[1][i].astype("int64").mean()) * 1e6) / 1e6
        for i in (0, 2, 4)
    }
    assert {r.mean_px for r in stats} == expect
    assert all((r.width, r.height) == (6, 4) for r in stats)
