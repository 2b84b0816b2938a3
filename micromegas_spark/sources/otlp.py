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
