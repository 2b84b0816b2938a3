"""OTLP/JSON trace ingestion (sources/otlp.py) — the public OTLP JSON
encoding of ExportTraceServiceRequest parsed JVM-side into otel span
rows, then normalized/joined by views/otel.py."""

from __future__ import annotations

import json

from micromegas_spark.sources.otlp import otlp_spans_from_json, register_otlp_json
from micromegas_spark.views.otel import otel_spans_view, span_children

_DOC = {
    "resourceSpans": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "checkout"}},
                    {"key": "host.port", "value": {"intValue": "8080"}},
                ]
            },
            "scopeSpans": [
                {
                    "scope": {"name": "lib.http", "version": "1.2"},
                    "spans": [
                        {
                            "traceId": "0AF7651916CD43DD8448EB211C80319C",
                            "spanId": "B7AD6B7169203331",
                            "name": "GET /cart",
                            "kind": 2,
                            "startTimeUnixNano": "1700000000000000000",
                            "endTimeUnixNano": "1700000001500000000",
                            "attributes": [
                                {"key": "http.status_code", "value": {"intValue": "200"}}
                            ],
                            "events": [
                                {"timeUnixNano": "1700000000600000000", "name": "cache.miss"}
                            ],
                            "status": {"code": 1},
                        },
                        {
                            "traceId": "0AF7651916CD43DD8448EB211C80319C",
                            "spanId": "C0C0C0C0C0C0C0C0",
                            "parentSpanId": "B7AD6B7169203331",
                            "name": "SELECT cart",
                            "kind": 3,
                            "startTimeUnixNano": "1700000000200000000",
                            "endTimeUnixNano": "1700000000900000000",
                            "status": {"code": 2, "message": "timeout retried"},
                        },
                    ],
                }
            ],
        }
    ]
}


def test_otlp_spans_from_json(spark):
    df = spark.createDataFrame([(json.dumps(_DOC),)], "value string")
    out = {r["span_id"]: r for r in otlp_spans_from_json(df).collect()}
    assert len(out) == 2
    root = out["B7AD6B7169203331"]
    assert root["service_name"] == "checkout"
    assert root["scope_name"] == "lib.http"
    assert root["kind"] == "SERVER" and root["status"] == "OK"
    assert root["start_time_ns"] == 1_700_000_000_000_000_000
    assert root["attributes"]["http.status_code"] == "200"
    assert "cache.miss" in root["events_json"]
    child = out["C0C0C0C0C0C0C0C0"]
    assert child["parent_span_id"] == "B7AD6B7169203331"
    assert child["kind"] == "CLIENT" and child["status"] == "ERROR"
    # resource attrs fall back across value types (intValue carried)
    assert root["span_id"] == "B7AD6B7169203331"


def test_otlp_into_otel_views(spark, tmp_path):
    p = tmp_path / "otlp.jsonl"
    p.write_text(json.dumps(_DOC) + "\n")
    raw = register_otlp_json(spark, str(p), view_name="otlp_test_raw")
    spans = otel_spans_view(raw)
    rows = {r["span_id"]: r for r in spans.collect()}
    # ids lowercased by the view normalization; duration = end - start
    root = rows["b7ad6b7169203331"]
    assert root["duration"] == 1_500_000_000
    kids = span_children(spans).collect()
    assert len(kids) == 1
    k = kids[0]
    assert k["parent_name"] == "GET /cart"
    assert abs(k["parent_share"] - (700 / 1500)) < 1e-9
    # SQL spelling through the registered view
    n = spark.sql("SELECT COUNT(*) AS n FROM otlp_test_raw").collect()[0]["n"]
    assert n == 2


_LOGS_DOC = {
    "resourceLogs": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "checkout"}}
                ]
            },
            "scopeLogs": [
                {
                    "scope": {"name": "app.core"},
                    "logRecords": [
                        {
                            "timeUnixNano": "1700000000100000000",
                            "severityNumber": 17,
                            "severityText": "ERROR",
                            "body": {"stringValue": "payment failed"},
                            "attributes": [
                                {"key": "retry", "value": {"boolValue": True}}
                            ],
                            "traceId": "0AF7651916CD43DD8448EB211C80319C",
                            "spanId": "B7AD6B7169203331",
                        },
                        {
                            "observedTimeUnixNano": "1700000000200000000",
                            "severityNumber": 9,
                            "body": {"stringValue": "cart loaded"},
                        },
                    ],
                }
            ],
        }
    ]
}

_METRICS_DOC = {
    "resourceMetrics": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "checkout"}}
                ]
            },
            "scopeMetrics": [
                {
                    "scope": {"name": "app.metrics"},
                    "metrics": [
                        {
                            "name": "cpu.load",
                            "unit": "1",
                            "gauge": {
                                "dataPoints": [
                                    {"timeUnixNano": "1700000000000000000", "asDouble": 0.75}
                                ]
                            },
                        },
                        {
                            "name": "requests.total",
                            "unit": "{req}",
                            "sum": {
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "1700000001000000000",
                                        "asInt": "42",
                                        "attributes": [
                                            {"key": "route", "value": {"stringValue": "/cart"}}
                                        ],
                                    }
                                ],
                                "isMonotonic": True,
                            },
                        },
                    ],
                }
            ],
        }
    ]
}


def test_otlp_logs_from_json(spark):
    from micromegas_spark.sources.otlp import otlp_logs_from_json

    df = spark.createDataFrame([(json.dumps(_LOGS_DOC),)], "value string")
    rows = sorted(otlp_logs_from_json(df).collect(), key=lambda r: r["time_ns"])
    assert len(rows) == 2
    err, info = rows
    # OTLP severity 17 (ERROR band) → reference level 2; 9 (INFO) → 4
    assert err["level"] == 2 and err["msg"] == "payment failed"
    assert err["service_name"] == "checkout" and err["target"] == "app.core"
    assert err["properties"]["retry"] == "true"
    assert err["trace_id"] == "0af7651916cd43dd8448eb211c80319c"
    assert info["level"] == 4
    assert info["time_ns"] == 1_700_000_000_200_000_000  # observed fallback


def test_otlp_metrics_from_json(spark):
    from micromegas_spark.sources.otlp import otlp_metrics_from_json

    df = spark.createDataFrame([(json.dumps(_METRICS_DOC),)], "value string")
    rows = {r["name"]: r for r in otlp_metrics_from_json(df).collect()}
    g = rows["cpu.load"]
    assert g["metric_type"] == "gauge" and g["value"] == 0.75 and g["unit"] == "1"
    s = rows["requests.total"]
    assert s["metric_type"] == "sum" and s["value"] == 42.0
    assert s["properties"]["route"] == "/cart"
    assert s["service_name"] == "checkout"


def test_stream_otlp_json_exactly_once_matches_batch(spark, tmp_path):
    from micromegas_spark.sources.otlp import otlp_logs_from_json, stream_otlp_json

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(json.dumps(_LOGS_DOC) + "\n")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = stream_otlp_json(spark, str(src), out, ckpt, kind="logs")
    q.awaitTermination()
    got = spark.read.parquet(out)
    batch = otlp_logs_from_json(
        spark.createDataFrame([(json.dumps(_LOGS_DOC),)], "value string")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))

    # second tick with one NEW file: only the new file lands (checkpointed
    # file tracking = exactly-once), old rows are not re-ingested
    (src / "b.jsonl").write_text(json.dumps(_LOGS_DOC) + "\n")
    q2 = stream_otlp_json(spark, str(src), out, ckpt, kind="logs")
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == 2 * batch.count()
