"""Streaming session windows (streaming/incremental.stream_sessionize):
gap-merge semantics match the batch lag/running-sum sessionization, and
closed sessions emit exactly once across micro-batch ticks."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from micromegas_spark.streaming.incremental import stream_sessionize

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_time", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _mk(user, minutes, value=1.0):
    return (user, T0 + dt.timedelta(minutes=minutes), value)


def test_session_merge_semantics_match_batch(spark, tmp_path):
    # u1: events at 0,10,20 (one session), then 60,65 (second session)
    # u2: single event (one session)
    rows = [
        _mk(1, 0), _mk(1, 10), _mk(1, 20),
        _mk(1, 60), _mk(1, 65, 2.5),
        _mk(2, 5),
    ]
    src = str(tmp_path / "landing")
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_sessionize(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    starts = {(r.user_id, r.sess_start): (r.n_events, r.total_value)
              for r in spark.sql("SELECT * FROM sess_complete").collect()}
    assert starts == {
        (1, T0): (3, 3.0),
        (1, T0 + dt.timedelta(minutes=60)): (2, 3.5),
        (2, T0 + dt.timedelta(minutes=5)): (1, 1.0),
    }
    # batch session_window over the same data agrees (one engine, two modes)
    batch = (
        spark.read.parquet(src)
        .groupBy(F.session_window("event_time", "30 minutes").alias("s"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    assert sorted((r.user_id, r.s.start, r.n) for r in batch.collect()) == sorted(
        (u, s, n) for (u, s), (n, _v) in starts.items()
    )


def test_append_mode_emits_closed_sessions_once(spark, tmp_path):
    src = str(tmp_path / "landing2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")

    def tick(rows):
        if rows:
            spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            stream_sessionize(stream, gap="30 minutes", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return spark.read.parquet(out).collect()
        except Exception:
            return []

    # tick 1: an early session + a much later event that pushes the
    # watermark far past the first session's end
    first = tick([_mk(1, 0), _mk(1, 10), _mk(1, 300)])
    emitted = [(r.user_id, r.sess_start, r.n_events) for r in first]
    assert (1, T0, 2) in emitted
    assert len([e for e in emitted if e[1] == T0]) == 1
    # tick 2: genuinely no new data — the emitted set must not grow or
    # re-emit already-closed sessions
    second = tick([])
    assert sorted((r.user_id, r.sess_start, r.n_events) for r in second) == sorted(emitted)


def test_sliding_window_rates_overlap(spark, tmp_path):
    from micromegas_spark.streaming.incremental import stream_sliding_rates

    # u-events at minutes 0..14: with 10-min windows sliding by 5, the
    # event at minute 7 belongs to windows [0,10) and [5,15)
    rows = [_mk(1, m) for m in (0, 3, 7, 12, 14)]
    src = str(tmp_path / "landing")
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_sliding_rates(stream, key_col="user_id")
        .writeStream.format("memory")
        .queryName("sliding_rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows_ = spark.sql(
        "SELECT win_start, n_events FROM sliding_rates ORDER BY win_start"
    ).collect()
    # windows: [-5,5): events 0,3 → 2 | [0,10): 0,3,7 → 3 |
    #          [5,15): 7,12,14 → 3 | [10,20): 12,14 → 2
    assert [r.n_events for r in rows_] == [2, 3, 3, 2]
    # overlap check: total window-event memberships = 2 per event
    assert sum(r.n_events for r in rows_) == 2 * 5
