"""Structured Streaming flavor of the materialization pipeline.

The reference is micro-batch only: cron ticks re-materialize recent
insert-time buckets (maintenance.rs:140-212,349-399; SURVEY §2.9 — no
continuous operators, no watermark row-dropping). The Spark-idiomatic
mirror is Structured Streaming over the landing zone with
``foreachBatch`` appending *partial* (composable) aggregates, exactly-once
via checkpoints; readers re-aggregate (merge query semantics, SURVEY §2.4
A2). ``trigger(availableNow=True)`` gives the reference's catch-up tick;
``processingTime`` triggers give its cadences.

``stream_log_stats`` additionally shows the native watermark+window shape
for pipelines that do want event-time finality — with the caveat the
reference semantics (late data always lands, buckets re-materialize)
are the foreachBatch path, not the watermark path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_log_stats(
    events: DataFrame, bin_seconds: int = 60, watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window pre-aggregation of a streaming event table
    (log_stats_view.rs:32-45 as a continuous query). ``events`` must carry
    an ``event_time`` TimestampType column."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", f"{bin_seconds} seconds").alias("time_bin"),
            "level",
            "target",
        )
        .agg(F.count("*").alias("count"))
    )


def materialize_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    bin_seconds: int = 60,
) -> StreamingQuery:
    """Incrementally materialize partial log_stats aggregates from a parquet
    landing zone (the raw block store analogue). Each micro-batch appends
    its own pre-aggregated rows — composable, so the reader merges with
    SUM(count). Checkpointing makes re-runs process only new files
    (exactly-once), which is precisely the reference's freshness contract
    done by Spark instead of hand-rolled source hashes."""
    stride = bin_seconds * 1_000_000_000

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy(
            (F.col("time_ns") - F.col("time_ns") % stride).alias("time_bin_ns"),
            "process_id",
            "level",
            "target",
        ).agg(F.count("*").alias("count"))
        agg.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    events: DataFrame, id_cols: list[str], watermark_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact deduplication: drop re-deliveries of the same key
    within the watermark horizon (dropDuplicatesWithinWatermark — state
    stays bounded by the watermark, unlike dropDuplicates which keeps keys
    forever). The streaming counterpart of operators/dedup.dedup_exact for
    at-least-once ingestion paths (the reference's ingestion can re-send
    blocks; its freshness hashes make re-materialization idempotent — this
    is the same guarantee applied at row level in-stream)."""
    return events.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def read_log_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read: SUM(count) re-aggregation over the appended partials
    (the merge query of LOG_STATS)."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("time_bin_ns", "process_id", "level", "target")
        .agg(F.sum("count").alias("count"))
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    time_col: str = "event_time",
    key_col: str = "user_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Native session windows over a stream: Spark's ``session_window``
    merges events of a key whose gaps stay under ``gap`` (the streaming
    counterpart of the batch lag/running-sum sessionization in
    queries/sql_surface.events_sessionize — the reference has no session
    windows at all, SURVEY §2.9). State per key is one open session that
    closes — and emits, in append mode — once the watermark passes its
    end; session count is bounded by active keys, not event volume."""
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("total_value")
        )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap).alias("sess"), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            *(["n_events"] + (["total_value"] if value_col is not None else [])),
        )
    )
