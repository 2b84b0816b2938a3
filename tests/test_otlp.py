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
