"""Client convenience surface parity: find_process / query_streams /
query_blocks / query_spans (reference client.py:782-976), time helpers
(reference time.py), and the Perfetto chunk-file writer
(reference perfetto.py:1-95)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from micromegas_spark.client import Client
from micromegas_spark.engine import Engine, JitViewSet
from micromegas_spark.sources.synthetic import generate
from micromegas_spark.timeutils import (
    format_datetime,
    parse_datetime,
    parse_time_delta,
    to_epoch_ns,
)


def test_time_helpers():
    utc = datetime.timezone.utc
    dt = datetime.datetime(2024, 1, 1, 12, 0, 0, tzinfo=utc)
    assert format_datetime(dt) == "2024-01-01T12:00:00+00:00"
    # lowercase 'z' is valid RFC 3339 — normalized (time.py:71-97)
    assert parse_datetime("2024-01-01T12:00:00z") == dt
    assert format_datetime("2024-01-01T12:00:00Z") == "2024-01-01T12:00:00+00:00"
    assert format_datetime(None) is None
    with pytest.raises(ValueError):
        format_datetime(datetime.datetime(2024, 1, 1))  # naive → rejected

    assert parse_time_delta("30m") == datetime.timedelta(minutes=30)
    assert parse_time_delta("2h") == datetime.timedelta(hours=2)
    assert parse_time_delta("7d") == datetime.timedelta(days=7)
    assert parse_time_delta("15s") == datetime.timedelta(seconds=15)
    with pytest.raises(ValueError):
        parse_time_delta("1w")

    assert to_epoch_ns(None) is None
    assert to_epoch_ns(123) == 123
    assert to_epoch_ns(dt) == 1_704_110_400_000_000_000
    assert to_epoch_ns("2024-01-01T12:00:00Z") == 1_704_110_400_000_000_000
    import pandas as pd

    assert to_epoch_ns(pd.Timestamp(dt)) == 1_704_110_400_000_000_000


@pytest.fixture(scope="module")
def telemetry_client(spark, tmp_path_factory):
    data = generate(seed=7)
    eng = Engine(spark, warehouse=str(tmp_path_factory.mktemp("wh_helpers")))
    for name in ("processes", "streams", "blocks"):
        eng.register_table(
            name, spark.createDataFrame(data[name]), time_column="insert_time_ns"
        )
    return data, Client(eng)


def test_find_process(telemetry_client):
    data, c = telemetry_client
    pid = data["processes"][0]["process_id"]
    pdf = c.find_process(pid)
    assert len(pdf) == 1 and pdf["exe"][0] == data["processes"][0]["exe"]
    assert c.find_process("no-such-process").empty


def test_query_streams_filters(telemetry_client):
    data, c = telemetry_client
    lo = min(s["insert_time_ns"] for s in data["streams"])
    hi = max(s["insert_time_ns"] for s in data["streams"]) + 1
    all_streams = c.query_streams(lo, hi, limit=1000)
    assert len(all_streams) == len(data["streams"])

    pid = data["processes"][0]["process_id"]
    per_proc = c.query_streams(lo, hi, limit=1000, process_id=pid)
    assert set(per_proc["process_id"]) == {pid}

    logs = c.query_streams(lo, hi, limit=1000, tag_filter="log")
    assert len(logs) == sum(1 for s in data["streams"] if "log" in s["tags"])
    assert c.query_streams(lo, hi, limit=2).shape[0] == 2
    # datetime-typed range (reference signature) routes through to_epoch_ns
    utc = datetime.timezone.utc
    b = datetime.datetime.fromtimestamp(lo / 1e9 - 1, tz=utc)
    e = datetime.datetime.fromtimestamp(hi / 1e9 + 1, tz=utc)
    assert len(c.query_streams(b, e, limit=1000)) == len(all_streams)


def test_query_blocks(telemetry_client):
    data, c = telemetry_client
    sid = data["blocks"][0]["stream_id"]
    lo = min(b["insert_time_ns"] for b in data["blocks"])
    hi = max(b["insert_time_ns"] for b in data["blocks"]) + 1
    pdf = c.query_blocks(lo, hi, 1000, sid)
    assert len(pdf) == sum(1 for b in data["blocks"] if b["stream_id"] == sid)
    assert set(pdf["stream_id"]) == {sid}


def test_query_spans_via_jit(spark, tmp_path):
    from micromegas_spark.operators.spans import build_thread_spans
    from tests.test_spans import _gen_stream_events

    events = [e for i in range(2) for e in _gen_stream_events(f"s{i}", seed=60 + i)]
    edf = spark.createDataFrame(events).cache()

    def source_count(instance, b, e):
        return edf.where(
            (F.col("stream_id") == instance)
            & (F.col("time_ns") >= b) & (F.col("time_ns") < e)
        ).count()

    def build(instance, b, e):
        return build_thread_spans(edf.where(F.col("stream_id") == instance), b, e)

    eng = Engine(spark, warehouse=str(tmp_path / "wh_spans"))
    eng.register_jit_view_set(
        JitViewSet("thread_spans", source_count, build, time_column="begin_ns")
    )
    c = Client(eng)
    pdf = c.query_spans(0, 10**9, limit=5, stream_id="s0")
    assert 0 < len(pdf) <= 5
    assert {"id", "parent", "depth", "begin_ns", "end_ns"} <= set(pdf.columns)


def test_write_trace_from_chunks(spark, tmp_path):
    from micromegas_spark.operators.spans import trace_chunks
    from micromegas_spark.sources.perfetto import decode_trace, write_trace_from_chunks
    from tests.test_spans import _gen_stream_events

    events = _gen_stream_events("sA", seed=77)
    from micromegas_spark.operators.spans import build_thread_spans

    spans = build_thread_spans(spark.createDataFrame(events), 0, 10**9).withColumnRenamed(
        "id", "span_id"
    )
    chunks = trace_chunks(spans, chunk_rows=10)
    out = str(tmp_path / "trace.pftrace")
    n = write_trace_from_chunks(chunks, out)
    assert n == chunks.count() and n > 1
    with open(out, "rb") as f:
        packets = decode_trace(f.read())
    # one descriptor + one BEGIN and one END TrackEvent per span
    n_spans = spans.count()
    ev = [p for p in packets if "track_event" in p]
    assert len(ev) == 2 * n_spans

    # empty input: no file, zero chunks
    empty = chunks.where("chunk_id < 0")
    out2 = str(tmp_path / "empty.pftrace")
    assert write_trace_from_chunks(empty, out2) == 0
    import os

    assert not os.path.exists(out2)
