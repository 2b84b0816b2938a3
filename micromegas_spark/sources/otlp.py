"""OTLP/JSON trace ingestion — the Spark-native counterpart of the
reference's OTLP ingestion path (rust/analytics/src/lakehouse/otel/
spans_block_processor.rs:56-75: ResourceSpans → scope_spans → spans;
HTTP router rust/public/src/servers/ingestion.rs:169).

The reference decodes OTLP protobuf; here we read the standard OTLP JSON
encoding (public OpenTelemetry spec: ExportTraceServiceRequest with
camelCase fields and unix-nano timestamps as strings) with a declared
schema + ``from_json`` + nested ``explode`` — fully JVM-side, no Python
crossing, so ingestion parallelizes with the file scan. Output rows are
the raw shape ``views/otel.otel_spans_view`` normalizes (hex ids,
kind/status enums, events/links JSON).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KV = (
    "array<struct<key:string,value:struct<stringValue:string,intValue:string,"
    "doubleValue:double,boolValue:boolean>>>"
)

# OTLP JSON ExportTraceServiceRequest (trace service proto, public spec)
OTLP_TRACE_SCHEMA = (
    "struct<resourceSpans:array<struct<"
    f"resource:struct<attributes:{_KV}>,"
    "scopeSpans:array<struct<"
    "scope:struct<name:string,version:string>,"
    "spans:array<struct<"
    "traceId:string,spanId:string,parentSpanId:string,name:string,"
    "kind:bigint,startTimeUnixNano:string,endTimeUnixNano:string,"
    f"attributes:{_KV},"
    "events:array<struct<timeUnixNano:string,name:string>>,"
    "links:array<struct<traceId:string,spanId:string>>,"
    "status:struct<code:bigint,message:string>"
    ">>>>>>>"
)

# span kind / status code enums (trace.proto)
_KINDS = ["UNSPECIFIED", "INTERNAL", "SERVER", "CLIENT", "PRODUCER", "CONSUMER"]
_STATUS = ["UNSET", "OK", "ERROR"]


def _enum(col, names: list[str], default: str):
    out = F.lit(default)
    for i, n in enumerate(names):
        out = F.when(col == i, F.lit(n)).otherwise(out)
    return out


def _attr_value(v):
    return F.coalesce(
        v.getField("stringValue"),
        v.getField("intValue"),
        v.getField("doubleValue").cast("string"),
        v.getField("boolValue").cast("string"),
    )


def _attrs_map(col):
    """OTLP keyValue list → MapType(String, String) — the engine's
    property shape (SURVEY §1.3: properties normalize on MapType)."""
    return F.map_from_entries(
        F.transform(col, lambda kv: F.struct(kv.getField("key"), _attr_value(kv.getField("value"))))
    )


def otlp_spans_from_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """One OTLP ExportTraceServiceRequest JSON document per input row →
    one output row per span, resource/scope context denormalized on
    (service_name via the standard ``service.name`` resource attribute,
    scope name/version), timestamps as ns BIGINTs."""
    p = df.select(F.from_json(F.col(json_col), OTLP_TRACE_SCHEMA).alias("r"))
    rs = p.select(F.explode("r.resourceSpans").alias("rs"))
    sc = rs.select(
        _attrs_map(F.col("rs.resource.attributes")).alias("_res_attrs"),
        F.explode("rs.scopeSpans").alias("ss"),
    )
    sp = sc.select(
        "_res_attrs",
        F.col("ss.scope.name").alias("scope_name"),
        F.col("ss.scope.version").alias("scope_version"),
        F.explode("ss.spans").alias("s"),
    )
    return sp.select(
        F.element_at("_res_attrs", "service.name").alias("service_name"),
        "scope_name",
        "scope_version",
        F.col("s.traceId").alias("trace_id"),
        F.col("s.spanId").alias("span_id"),
        F.col("s.parentSpanId").alias("parent_span_id"),
        F.col("s.name").alias("name"),
        _enum(F.col("s.kind"), _KINDS, "UNSPECIFIED").alias("kind"),
        _enum(F.col("s.status.code"), _STATUS, "UNSET").alias("status"),
        F.col("s.startTimeUnixNano").cast("bigint").alias("start_time_ns"),
        F.col("s.endTimeUnixNano").cast("bigint").alias("end_time_ns"),
        _attrs_map(F.col("s.attributes")).alias("attributes"),
        F.to_json("s.events").alias("events_json"),
        F.to_json("s.links").alias("links_json"),
    )


def register_otlp_json(
    spark: SparkSession, path: str, view_name: str = "otel_spans_raw"
) -> DataFrame:
    """Read OTLP/JSON line files (one request document per line — the
    firehose shape) and register the span rows as a temp view."""
    raw = spark.read.text(path)
    out = otlp_spans_from_json(raw, "value")
    out.createOrReplaceTempView(view_name)
    return out


# OTLP JSON ExportLogsServiceRequest (logs service proto, public spec)
OTLP_LOGS_SCHEMA = (
    "struct<resourceLogs:array<struct<"
    f"resource:struct<attributes:{_KV}>,"
    "scopeLogs:array<struct<"
    "scope:struct<name:string,version:string>,"
    "logRecords:array<struct<"
    "timeUnixNano:string,observedTimeUnixNano:string,"
    "severityNumber:bigint,severityText:string,"
    "body:struct<stringValue:string>,"
    f"attributes:{_KV},"
    "traceId:string,spanId:string"
    ">>>>>>>"
)

# OTLP severityNumber (1..24, 4 per level) → the reference's 1..6
# Fatal..Trace levels (log_entries level semantics, SURVEY §1.4):
# OTLP 1-4 TRACE→6, 5-8 DEBUG→5, 9-12 INFO→4, 13-16 WARN→3,
# 17-20 ERROR→2, 21-24 FATAL→1.
def _otlp_severity_to_level(col):
    return F.when(col.isNull() | (col <= 0), F.lit(None).cast("int")).otherwise(
        (F.lit(6) - F.floor((col - 1) / 4)).cast("int")
    )


def otlp_logs_from_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """OTLP/JSON log documents → one row per log record in the
    log_entries-compatible shape (otel/logs_block_processor.rs parity):
    ns time, reference 1..6 level, target = scope name, msg = body."""
    p = df.select(F.from_json(F.col(json_col), OTLP_LOGS_SCHEMA).alias("r"))
    rl = p.select(F.explode("r.resourceLogs").alias("rl"))
    sl = rl.select(
        _attrs_map(F.col("rl.resource.attributes")).alias("_res_attrs"),
        F.explode("rl.scopeLogs").alias("sl"),
    )
    rec = sl.select(
        "_res_attrs",
        F.col("sl.scope.name").alias("scope_name"),
        F.explode("sl.logRecords").alias("lr"),
    )
    return rec.select(
        F.element_at("_res_attrs", "service.name").alias("service_name"),
        F.coalesce(
            F.col("lr.timeUnixNano").cast("bigint"),
            F.col("lr.observedTimeUnixNano").cast("bigint"),
        ).alias("time_ns"),
        _otlp_severity_to_level(F.col("lr.severityNumber")).alias("level"),
        F.col("lr.severityText").alias("severity_text"),
        F.col("scope_name").alias("target"),
        F.col("lr.body.stringValue").alias("msg"),
        _attrs_map(F.col("lr.attributes")).alias("properties"),
        F.lower("lr.traceId").alias("trace_id"),
        F.lower("lr.spanId").alias("span_id"),
    )


# OTLP JSON ExportMetricsServiceRequest — gauge/sum number points (the
# measures-view shape: name/unit/value Float64, metrics_table.rs:18)
OTLP_METRICS_SCHEMA = (
    "struct<resourceMetrics:array<struct<"
    f"resource:struct<attributes:{_KV}>,"
    "scopeMetrics:array<struct<"
    "scope:struct<name:string,version:string>,"
    "metrics:array<struct<"
    "name:string,unit:string,description:string,"
    "gauge:struct<dataPoints:array<struct<timeUnixNano:string,"
    f"asDouble:double,asInt:string,attributes:{_KV}>>>,"
    "sum:struct<dataPoints:array<struct<timeUnixNano:string,"
    f"asDouble:double,asInt:string,attributes:{_KV}>>,isMonotonic:boolean>"
    ">>>>>>>"
)


def otlp_metrics_from_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """OTLP/JSON metric documents → one row per number data point
    (gauge and sum; the reference's measures shape:
    otel/metrics_block_processor.rs). asInt/asDouble unify to DOUBLE."""
    p = df.select(F.from_json(F.col(json_col), OTLP_METRICS_SCHEMA).alias("r"))
    rm = p.select(F.explode("r.resourceMetrics").alias("rm"))
    sm = rm.select(
        _attrs_map(F.col("rm.resource.attributes")).alias("_res_attrs"),
        F.explode("rm.scopeMetrics").alias("sm"),
    )
    met = sm.select(
        "_res_attrs", F.explode("sm.metrics").alias("m")
    )
    pts = met.select(
        "_res_attrs",
        F.col("m.name").alias("name"),
        F.col("m.unit").alias("unit"),
        F.explode(
            F.coalesce(F.col("m.gauge.dataPoints"), F.col("m.sum.dataPoints"))
        ).alias("dp"),
        F.when(F.col("m.gauge").isNotNull(), F.lit("gauge"))
        .otherwise(F.lit("sum"))
        .alias("metric_type"),
    )
    return pts.select(
        F.element_at("_res_attrs", "service.name").alias("service_name"),
        "name",
        "unit",
        "metric_type",
        F.col("dp.timeUnixNano").cast("bigint").alias("time_ns"),
        F.coalesce(
            F.col("dp.asDouble"), F.col("dp.asInt").cast("double")
        ).alias("value"),
        _attrs_map(F.col("dp.attributes")).alias("properties"),
    )


def stream_otlp_json(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    kind: str = "logs",
):
    """Continuous OTLP/JSON ingestion: readStream over a landing directory
    of OTLP JSON line files (the firehose shape an OTLP/HTTP collector
    writes), the same declared-schema/from_json/explode transform as the
    batch path, append sink with checkpointed exactly-once file tracking —
    the Structured Streaming mirror of the reference's ingestion service
    loop (rust/public/src/servers/ingestion.rs HTTP → block writer;
    SURVEY §2.9 trigger cadences). ``trigger(availableNow)`` drains the
    backlog and stops, i.e. one maintenance tick; swap for
    ``processingTime`` for a resident ingester.

    All transforms are stream-safe (stateless projections/explodes): the
    ingest parallelism IS the file-scan parallelism, no state store."""
    transform = {
        "spans": otlp_spans_from_json,
        "logs": otlp_logs_from_json,
        "metrics": otlp_metrics_from_json,
    }[kind]
    raw = spark.readStream.text(source_dir)
    out = transform(raw, "value")
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
