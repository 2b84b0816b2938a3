"""OTel span views (SURVEY §1.4 otel_spans; rust/analytics/src/lakehouse/
otel/spans_table.rs:1-77) and the span-hierarchy query shapes
(schema-reference.md:420-432, SURVEY §2.3 J4).

Columns follow the reduced engine-parity shape (FIXTURES.md §9): hex-string
trace/span ids (the reference stores FixedSizeBinary — a physical concern),
kind/status enums as strings, events/links as JSON arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def otel_spans_view(raw: DataFrame) -> DataFrame:
    """Normalize raw OTel-shaped rows: default UNSET status, ns duration,
    lowercase hex ids."""
    return raw.select(
        F.lower("trace_id").alias("trace_id"),
        F.lower("span_id").alias("span_id"),
        F.lower("parent_span_id").alias("parent_span_id"),
        "name",
        F.coalesce(F.col("kind"), F.lit("INTERNAL")).alias("kind"),
        F.coalesce(F.col("status"), F.lit("UNSET")).alias("status"),
        "start_time_ns",
        "end_time_ns",
        (F.col("end_time_ns") - F.col("start_time_ns")).alias("duration"),
        "events_json",
        "links_json",
    )


def span_children(spans: DataFrame) -> DataFrame:
    """Parent/child hierarchy join: parent.span_id = child.parent_span_id
    (schema-reference.md:420-432). Returns child rows annotated with the
    parent's name and the child's share of the parent's duration."""
    p = spans.select(
        F.col("span_id").alias("p_span_id"),
        F.col("name").alias("parent_name"),
        F.col("duration").alias("parent_duration"),
    )
    return spans.join(p, spans.parent_span_id == p.p_span_id).select(
        "trace_id",
        "span_id",
        "parent_span_id",
        "name",
        "parent_name",
        "duration",
        (F.col("duration") / F.col("parent_duration")).alias("parent_share"),
    )


def trace_summary(spans: DataFrame) -> DataFrame:
    """Per-trace rollup: span count, root span, end-to-end duration — the
    cross-process trace assembly the reference does by UNION-ing view
    instances (schema-reference.md:515, SURVEY §2.7)."""
    roots = spans.where(F.col("parent_span_id").isNull()).select(
        "trace_id", F.col("name").alias("root_name"), F.col("duration").alias("root_duration")
    )
    agg = spans.groupBy("trace_id").agg(
        F.count("*").alias("n_spans"),
        F.min("start_time_ns").alias("trace_start_ns"),
        F.max("end_time_ns").alias("trace_end_ns"),
        F.count(F.when(F.col("status") == "ERROR", 1)).alias("n_errors"),
    )
    return agg.join(roots, "trace_id", "left").withColumn(
        "trace_duration", F.col("trace_end_ns") - F.col("trace_start_ns")
    )
