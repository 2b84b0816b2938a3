"""Stateful streaming span assembly: spans crossing micro-batch boundaries
are assembled exactly once via checkpointed keyed state."""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from micromegas_spark.streaming.stateful import streaming_thread_spans

EVENT_SCHEMA = StructType(
    [
        StructField("stream_id", StringType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("time_ns", LongType()),
        StructField("hash", LongType()),
        StructField("name", StringType()),
    ]
)


def _run_tick(spark, src, out_dir, ckpt):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    spans = streaming_thread_spans(stream)
    q = (
        spans.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_spans_across_batch_boundary(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: s1 opens outer(1) and inner(2), closes inner; outer stays open
    batch1 = [
        ("s1", 1, "begin", 100, 11, "outer"),
        ("s1", 2, "begin", 200, 22, "inner"),
        ("s1", 3, "end", 300, 22, "inner"),
        ("s2", 10, "begin", 150, 33, "other"),
    ]
    spark.createDataFrame(batch1, EVENT_SCHEMA).write.mode("append").parquet(src)
    _run_tick(spark, src, out, ckpt)
    first = {r.id: r for r in spark.read.parquet(out).collect()}
    assert set(first) == {2}
    assert first[2].parent == 1 and first[2].depth == 1 and first[2].duration == 100

    # batch 2: outer closes (state carried begin=100); s2 closes too
    batch2 = [
        ("s1", 4, "end", 900, 11, "outer"),
        ("s2", 11, "end", 500, 33, "other"),
    ]
    spark.createDataFrame(batch2, EVENT_SCHEMA).write.mode("append").parquet(src)
    _run_tick(spark, src, out, ckpt)
    allspans = {r.id: r for r in spark.read.parquet(out).collect()}
    assert set(allspans) == {1, 2, 10}
    assert allspans[1].begin_ns == 100 and allspans[1].end_ns == 900
    assert allspans[1].parent == -1 and allspans[1].depth == 0
    assert allspans[10].duration == 350


def test_streaming_mismatch_resets_not_crashes(spark, tmp_path):
    src = str(tmp_path / "landing2")
    out = str(tmp_path / "spans2")
    ckpt = str(tmp_path / "ckpt2")
    rows = [
        ("s1", 1, "begin", 100, 11, "a"),
        ("s1", 2, "end", 200, 99, "wrong"),  # mismatch → reset
        ("s1", 3, "begin", 300, 44, "b"),
        ("s1", 4, "end", 400, 44, "b"),
        ("s1", 5, "end", 50, 77, "orphan"),  # end-without-begin → dropped
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("append").parquet(src)
    _run_tick(spark, src, out, ckpt)
    got = {r.id for r in spark.read.parquet(out).collect()}
    assert got == {3}
