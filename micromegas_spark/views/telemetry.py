"""The reference's user-facing table/view builders (SURVEY §1.4), as
DataFrame transformations over the raw metadata/event tables.

| view        | reference schema source                              |
|-------------|-------------------------------------------------------|
| processes   | rust/analytics/src/lakehouse/processes_view.rs:17-90  |
| streams     | rust/analytics/src/lakehouse/streams_view.rs          |
| blocks      | rust/analytics/src/lakehouse/blocks_view.rs:60-71     |
| log_entries | rust/analytics/src/log_entries_table.rs:24            |
| measures    | rust/analytics/src/metrics_table.rs:18                |
| log_stats   | rust/analytics/src/lakehouse/log_stats_view.rs:32-59  |

Conventions: time columns are epoch-ns BIGINTs end-to-end (the reference is
ns-native; Spark TimestampType is µs — a `*_ts` TimestampType twin can be
derived at the edge with timestamp_micros(col div 1000)). Properties are
MAP<STRING,STRING>.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def processes_view(processes_raw: DataFrame, blocks: DataFrame) -> DataFrame:
    """processes registry enriched with per-process block stats — the
    reference computes first_value/max aggregates over blocks grouped by
    process (processes_view.rs:25-67, SURVEY §2.4 A3). Broadcast the
    (small) process registry; aggregate the (large) blocks stream."""
    stats = blocks.groupBy("process_id").agg(
        F.count("*").alias("nb_blocks"),
        F.sum("nb_objects").alias("nb_objects"),
        F.max("end_time_ns").alias("last_block_end_time_ns"),
        F.max("insert_time_ns").alias("last_update_time_ns"),
    )
    return F.broadcast(processes_raw).join(stats, "process_id", "left")


def streams_view(streams_raw: DataFrame, blocks: DataFrame) -> DataFrame:
    """streams registry with per-stream block stats (streams_view.rs)."""
    stats = blocks.groupBy("stream_id").agg(
        F.count("*").alias("nb_blocks"),
        F.sum("nb_objects").alias("nb_objects"),
        F.max("insert_time_ns").alias("last_update_time_ns"),
    )
    return F.broadcast(streams_raw).join(stats, "stream_id", "left")


def blocks_view(blocks: DataFrame, streams_raw: DataFrame, processes_raw: DataFrame) -> DataFrame:
    """The 3-way metadata equi-join, dims broadcast — blocks ⨝ streams ⨝
    processes with prefixed denormalized columns (blocks_view.rs:61-71,
    SURVEY §2.3 J1)."""
    s = streams_raw.select(
        "stream_id",
        F.col("tags").alias("streams.tags"),
        F.col("properties").alias("streams.properties"),
    )
    p = processes_raw.select(
        "process_id",
        F.col("exe").alias("processes.exe"),
        F.col("username").alias("processes.username"),
        F.col("computer").alias("processes.computer"),
        F.col("start_time_ns").alias("processes.start_time_ns"),
    )
    return blocks.join(F.broadcast(s), "stream_id").join(F.broadcast(p), "process_id")


def log_entries_view(log_raw: DataFrame, processes_raw: DataFrame) -> DataFrame:
    """log_entries enriched with process identity (schema-reference.md:
    669-685 'joining log_entries to processes'; J2). level 1..6 =
    Fatal..Trace (schema-reference.md:171-182)."""
    p = processes_raw.select("process_id", "exe", "username", "computer")
    return log_raw.join(F.broadcast(p), "process_id")


def measures_view(measures_raw: DataFrame, processes_raw: DataFrame) -> DataFrame:
    """measures enriched with process identity (metrics_table.rs:18)."""
    p = processes_raw.select("process_id", "exe", "username", "computer")
    return measures_raw.join(F.broadcast(p), "process_id")


def log_stats_extract(log_entries: DataFrame, bin_seconds: int = 60) -> DataFrame:
    """log_stats extract query: per-minute pre-aggregation of log_entries
    (log_stats_view.rs:32-45). The merge re-aggregation is SUM(count) —
    composable per the SqlBatchView contract (sql_batch_view.rs:170-175);
    see materialize.batch.LOG_STATS for the full triple."""
    stride = bin_seconds * 1_000_000_000
    return log_entries.groupBy(
        (F.col("time_ns") - F.col("time_ns") % stride).alias("time_bin_ns"),
        "process_id",
        "level",
        "target",
    ).agg(F.count("*").alias("count"))
