"""Call-tree and span-pairing semantics (reference: call_tree.rs:100-207,
span_table.rs:126-187, process_spans_table_function.rs:319-339)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from micromegas_spark.operators.spans import (
    ScopeMismatch,
    build_call_tree_rows,
    build_thread_spans,
    pair_async_spans,
    process_spans,
)


def ev(eid, etype, t, h, name="f"):
    return {
        "event_id": eid,
        "event_type": etype,
        "time_ns": t,
        "hash": h,
        "name": name,
        "target": "mod",
        "filename": "a.rs",
        "line": 1,
    }


def test_simple_nesting():
    events = [
        ev(1, "begin", 10, 100, "outer"),
        ev(2, "begin", 20, 200, "inner"),
        ev(3, "end", 30, 200, "inner"),
        ev(4, "end", 40, 100, "outer"),
    ]
    rows = build_call_tree_rows(events, 0, 1000)
    by_name = {r["name"]: r for r in rows}
    assert by_name["outer"]["parent"] == -1 and by_name["outer"]["depth"] == 0
    assert by_name["inner"]["parent"] == 1 and by_name["inner"]["depth"] == 1
    assert by_name["inner"]["begin_ns"] == 20 and by_name["inner"]["end_ns"] == 30
    assert by_name["outer"]["duration"] == 30


def test_unclosed_begin_healed_to_range_end():
    rows = build_call_tree_rows([ev(1, "begin", 10, 100)], 0, 500)
    assert rows[0]["end_ns"] == 500 and rows[0]["begin_ns"] == 10


def test_end_without_begin_healed_to_range_begin():
    rows = build_call_tree_rows([ev(1, "end", 50, 100)], 5, 500)
    assert rows[0]["begin_ns"] == 5 and rows[0]["end_ns"] == 50


def test_scope_mismatch_raises():
    with pytest.raises(ScopeMismatch):
        build_call_tree_rows(
            [ev(1, "begin", 10, 100), ev(2, "end", 20, 999)], 0, 100
        )


def test_range_clamping():
    events = [
        ev(1, "begin", 10, 100),  # before range → ignored
        ev(2, "begin", 150, 200),
        ev(3, "end", 160, 200),
        ev(4, "begin", 900, 300),  # after range → stop
    ]
    rows = build_call_tree_rows(events, 100, 800)
    assert [r["hash"] for r in rows] == [200]


def _gen_stream_events(stream_id: str, seed: int, n_frames: int = 30):
    """Deterministic well-formed begin/end stream with depth ≤ 4."""
    rng = random.Random(seed)
    events, stack = [], []
    t, eid = 1000, 0
    scopes = [(h, f"fn{h}") for h in (11, 22, 33, 44, 55)]
    for _ in range(n_frames):
        t += rng.randint(1, 50)
        if stack and (len(stack) >= 4 or rng.random() < 0.5):
            h, name = stack.pop()
            events.append(dict(ev(eid, "end", t, h, name), stream_id=stream_id))
        else:
            h, name = rng.choice(scopes)
            stack.append((h, name))
            events.append(dict(ev(eid, "begin", t, h, name), stream_id=stream_id))
        eid += 1
    while stack:  # close remaining for well-formedness
        t += rng.randint(1, 50)
        h, name = stack.pop()
        events.append(dict(ev(eid, "end", t, h, name), stream_id=stream_id))
        eid += 1
    return events


def test_thread_spans_spark_matches_pure_python(spark):
    all_events = []
    for i in range(6):
        all_events.extend(_gen_stream_events(f"s{i}", seed=100 + i))
    df = spark.createDataFrame(all_events)
    got = build_thread_spans(df, 0, 10**9).collect()

    # differential: the same pure function per stream
    want = []
    for i in range(6):
        sid = f"s{i}"
        evs = sorted(
            (e for e in all_events if e["stream_id"] == sid),
            key=lambda e: (e["time_ns"], e["event_id"]),
        )
        for r in build_call_tree_rows(evs, 0, 10**9):
            want.append((sid, r["id"], r["parent"], r["depth"], r["begin_ns"], r["end_ns"]))
    got_set = {(r.stream_id, r.id, r.parent, r.depth, r.begin_ns, r.end_ns) for r in got}
    assert got_set == set(want)


def test_thread_spans_invariants(spark):
    all_events = []
    for i in range(4):
        all_events.extend(_gen_stream_events(f"s{i}", seed=7 + i))
    df = spark.createDataFrame(all_events)
    spans = build_thread_spans(df, 0, 10**9).collect()
    by_key = {(r.stream_id, r.id): r for r in spans}
    for r in spans:
        assert r.end_ns >= r.begin_ns
        assert r.duration == r.end_ns - r.begin_ns
        if r.parent != -1:
            p = by_key[(r.stream_id, r.parent)]
            # child nested within parent; depth consistent
            assert p.begin_ns <= r.begin_ns and r.end_ns <= p.end_ns
            assert r.depth == p.depth + 1
        else:
            assert r.depth == 0
    # per-stream output sorted by begin
    for sid in {r.stream_id for r in spans}:
        begins = [r.begin_ns for r in spans if r.stream_id == sid]
        assert begins == sorted(begins)


def test_async_pairing_with_unclosed(spark):
    rows = [
        # span 1: normal pair; span 2: unclosed; span 3: two ends → min wins
        (1, -1, "a", 0, "begin", 100),
        (1, -1, "a", 0, "end", 200),
        (2, 1, "b", 1, "begin", 150),
        (3, 1, "c", 1, "begin", 160),
        (3, 1, "c", 1, "end", 300),
        (3, 1, "c", 1, "end", 400),
    ]
    df = spark.createDataFrame(
        rows, ["span_id", "parent_span_id", "name", "depth", "event_type", "time_ns"]
    )
    out = {r.span_id: r for r in pair_async_spans(df).collect()}
    assert out[1].end_ns == 200 and out[1].duration == 100
    assert out[2].end_ns is None and out[2].duration is None
    assert out[3].end_ns == 300  # earliest end after begin
    strict = {r.span_id for r in pair_async_spans(df, keep_unclosed=False).collect()}
    assert strict == {1, 3}


def test_trace_chunks_export(spark):
    from micromegas_spark.operators.spans import trace_chunks
    from micromegas_spark.sources.payload import decode_block

    tdf = build_thread_spans(
        spark.createDataFrame(
            [e for i in range(3) for e in _gen_stream_events(f"s{i}", seed=70 + i)]
        ),
        0,
        10**9,
    ).withColumnRenamed("id", "span_id")
    n_spans = tdf.count()
    chunks = sorted(
        trace_chunks(tdf, chunk_rows=10, serializer="mmsb-json").collect(),
        key=lambda r: r.chunk_id,
    )
    assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
    decoded = [rec for c in chunks for rec in decode_block(bytes(c.chunk_data))]
    assert len(decoded) == n_spans
    # deterministic order across the chunk stream
    begins = [r["begin_ns"] for r in decoded]
    assert begins == sorted(begins)
    # bounded chunk size
    assert all(len(list(decode_block(bytes(c.chunk_data)))) <= 10 for c in chunks)


def test_trace_chunks_perfetto(spark):
    from micromegas_spark.operators.spans import trace_chunks
    from micromegas_spark.sources.perfetto import (
        TYPE_SLICE_BEGIN,
        TYPE_SLICE_END,
        decode_trace,
        track_uuid,
    )

    tdf = build_thread_spans(
        spark.createDataFrame(
            [e for i in range(3) for e in _gen_stream_events(f"s{i}", seed=80 + i)]
        ),
        0,
        10**9,
    ).withColumnRenamed("id", "span_id")
    n_spans = tdf.count()
    streams = {r.stream_id for r in tdf.select("stream_id").distinct().collect()}
    chunks = sorted(trace_chunks(tdf, chunk_rows=10).collect(), key=lambda r: r.chunk_id)
    # concatenated chunk_data is ONE valid Trace (repeated-field concat)
    packets = decode_trace(b"".join(bytes(c.chunk_data) for c in chunks))
    events = [p["track_event"] for p in packets if "track_event" in p]
    assert len(events) == 2 * n_spans
    assert sum(1 for e in events if e["type"] == TYPE_SLICE_BEGIN) == n_spans
    assert sum(1 for e in events if e["type"] == TYPE_SLICE_END) == n_spans
    # every event references a declared track; descriptors map uuid → stream
    descs = {
        p["track_descriptor"]["uuid"]: p["track_descriptor"]["name"]
        for p in packets
        if "track_descriptor" in p
    }
    assert set(descs.values()) == {str(s) for s in streams}
    assert all(e["track_uuid"] in descs for e in events)
    assert all(descs[track_uuid(s)] == s for s in map(str, streams))
    # per track, begin/end balance never goes negative within a chunk
    for c in chunks:
        depth: dict = {}
        for p in decode_trace(bytes(c.chunk_data)):
            ev = p.get("track_event")
            if ev:
                d = depth.get(ev["track_uuid"], 0) + (
                    1 if ev["type"] == TYPE_SLICE_BEGIN else -1
                )
                assert d >= 0
                depth[ev["track_uuid"]] = d


def test_trace_chunks_multipartition_numbering(spark):
    """The zipWithIndex-pattern chunk numbering runs two jobs over the same
    range partitioning (counts, then enumerate); this pins (a) global
    numbering correctness across many partitions and (b) determinism of
    the recompute between those jobs and between whole runs."""
    from micromegas_spark.operators.spans import trace_chunks
    from micromegas_spark.sources.payload import decode_block

    n = 500
    spans = spark.range(n).selectExpr(
        "cast(id as string) as stream_id",
        "id as span_id",
        "cast(id % 7 as int) as depth",
        "concat('s', id) as name",
        # begin_ns deliberately NOT aligned with id order
        "(id * 37) % 1000 as begin_ns",
        "(id * 37) % 1000 + 5 as end_ns",
    )
    out1 = sorted(
        trace_chunks(spans, chunk_rows=25, num_partitions=8, serializer="mmsb-json").collect(),
        key=lambda r: r.chunk_id,
    )
    assert [c.chunk_id for c in out1] == list(range(20))  # 500/25 full chunks
    decoded = [rec for c in out1 for rec in decode_block(bytes(c.chunk_data))]
    assert len(decoded) == n
    assert all(len(list(decode_block(bytes(c.chunk_data)))) == 25 for c in out1)
    # global order across chunk boundaries follows order_cols exactly
    keys = [(r["begin_ns"], r["span_id"]) for r in decoded]
    assert keys == sorted(keys)
    # a second full run yields byte-identical chunks
    out2 = sorted(
        trace_chunks(spans, chunk_rows=25, num_partitions=8, serializer="mmsb-json").collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(c.chunk_id, bytes(c.chunk_data)) for c in out1] == [
        (c.chunk_id, bytes(c.chunk_data)) for c in out2
    ]


def test_perfetto_wire_format_roundtrip():
    from micromegas_spark.sources.perfetto import (
        decode_message,
        encode_varint,
        spans_to_trace_bytes,
        decode_trace,
    )

    # varint edge values round-trip through the decoder
    for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        data = b"\x08" + encode_varint(v)  # field 1, varint
        assert decode_message(data)[1][0] == v
    recs = [
        {"stream_id": "t1", "depth": 0, "name": "root", "begin_ns": 10, "end_ns": 90},
        {"stream_id": "t1", "depth": 1, "name": "child", "begin_ns": 20, "end_ns": 90},
    ]
    pkts = decode_trace(spans_to_trace_bytes(recs))
    evs = [p for p in pkts if "track_event" in p]
    # nesting-safe order: root opens first, child END precedes root END on tie
    assert [
        (p["timestamp"], p["track_event"]["type"], p["track_event"].get("name"))
        for p in evs
    ] == [(10, 1, "root"), (20, 1, "child"), (90, 2, None), (90, 2, None)]


def test_process_spans_union(spark):
    tdf = build_thread_spans(
        spark.createDataFrame(_gen_stream_events("s0", seed=3)), 0, 10**9
    )
    adf = pair_async_spans(
        spark.createDataFrame(
            [(1, -1, "x", 0, "begin", 10), (1, -1, "x", 0, "end", 20)],
            ["span_id", "parent_span_id", "name", "depth", "event_type", "time_ns"],
        )
    )
    both = process_spans(tdf, adf, "both")
    types = {r.span_type for r in both.collect()}
    assert types == {"thread", "async"}
    only_async = process_spans(tdf, adf, "async")
    assert {r.span_type for r in only_async.collect()} == {"async"}


def test_trace_chunks_rejects_non_numeric_order_col(spark):
    """Range bucketing needs a numeric first order column; a string column
    must raise loudly instead of silently collapsing to one bucket/task —
    and num_partitions=1 is the documented escape hatch."""
    import pytest as _pytest

    from micromegas_spark.operators.spans import trace_chunks
    from micromegas_spark.sources.payload import decode_block

    spans = spark.range(30).selectExpr(
        "concat('k', lpad(cast(id as string), 3, '0')) as skey",
        "id as span_id",
    )
    from micromegas_spark.flightsql.errors import InvalidArgument

    with _pytest.raises(InvalidArgument, match="numeric first order column"):
        trace_chunks(spans, order_cols=("skey", "span_id"), serializer="mmsb-json")
    out = sorted(
        trace_chunks(
            spans,
            chunk_rows=10,
            order_cols=("skey", "span_id"),
            num_partitions=1,
            serializer="mmsb-json",
        ).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [c.chunk_id for c in out] == [0, 1, 2]
    decoded = [rec for c in out for rec in decode_block(bytes(c.chunk_data))]
    assert [r["skey"] for r in decoded] == sorted(r["skey"] for r in decoded)


def test_thread_spans_null_stream_id_kept(spark):
    """A NULL stream_id is still a group: the mapInPandas in-worker groupby
    must not silently drop its rows (pandas groupby defaults to
    dropna=True — regression guard)."""
    events = [dict(ev(0, "begin", 10, 11, "fn11"), stream_id=None),
              dict(ev(1, "end", 20, 11, "fn11"), stream_id=None)]
    events += [dict(e, stream_id="s1") for e in
               [ev(2, "begin", 10, 22, "fn22"), ev(3, "end", 30, 22, "fn22")]]
    from pyspark.sql.types import (LongType, StringType, StructField, StructType)
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("time_ns", LongType()),
        StructField("hash", LongType()),
        StructField("name", StringType()),
        StructField("target", StringType()),
        StructField("filename", StringType()),
        StructField("line", LongType()),
        StructField("stream_id", StringType()),
    ])
    rows = [tuple(e.get(f.name) for f in schema.fields) for e in events]
    df = spark.createDataFrame(rows, schema)
    spans = build_thread_spans(df, 0, 10**6).collect()
    by_stream = {}
    for r in spans:
        by_stream.setdefault(r.stream_id, []).append(r)
    assert set(by_stream) == {None, "s1"}
    assert by_stream[None][0].duration == 10


def test_span_concurrency_sweep_line(spark):
    """Peak concurrency equals the brute-force maximum-overlap count, and
    a span ending exactly when another begins does not double-count."""
    from micromegas_spark.operators.spans import span_concurrency

    spans = [
        # user 1: [0,10) [5,15) [14,20) -> peak 2
        (1, 1, 0, 10), (1, 2, 5, 15), (1, 3, 14, 20),
        # user 2: [0,5) [5,9) adjacent -> peak 1
        (2, 4, 0, 5), (2, 5, 5, 9),
        # user 3: three nested -> peak 3
        (3, 6, 0, 100), (3, 7, 10, 90), (3, 8, 20, 30),
    ]
    df = spark.createDataFrame(spans, ["user_id", "sid", "b", "e"])
    got = {
        r.user_id: (r.peak_concurrency, r.n_spans)
        for r in span_concurrency(
            df, begin_col="b", end_col="e", key_cols=["user_id"], tie_col="sid"
        ).collect()
    }
    assert got == {1: (2, 3), 2: (1, 2), 3: (3, 3)}


def test_span_concurrency_zero_length_spans_count(spark):
    """An instantaneous span (begin == end) must register peak >= 1 — its
    close sorts AFTER its open — and never drive the running sum negative."""
    from micromegas_spark.operators.spans import span_concurrency

    df = spark.createDataFrame(
        [(1, 1, 5, 5), (2, 2, 0, 10), (2, 3, 10, 10)],
        ["user_id", "sid", "b", "e"],
    )
    got = {
        r.user_id: (r.peak_concurrency, r.n_spans)
        for r in span_concurrency(
            df, begin_col="b", end_col="e", key_cols=["user_id"], tie_col="sid"
        ).collect()
    }
    # user 1: lone instantaneous span -> peak 1
    # user 2: [0,10) closes at 10 BEFORE the zero-length [10,10] opens -> peak 1
    assert got == {1: (1, 1), 2: (1, 2)}


def test_span_self_times_basic(spark):
    from micromegas_spark.operators.spans import span_self_times

    # root(0..100) -> a(10..40), b(50..90); a -> leaf(20..30)
    rows = [
        ("s1", 1, -1, 100),
        ("s1", 2, 1, 30),
        ("s1", 3, 1, 40),
        ("s1", 4, 2, 10),
    ]
    df = spark.createDataFrame(rows, "stream_id string, id long, parent long, duration long")
    out = {
        r["id"]: r["self_time"]
        for r in span_self_times(df, key_cols=["stream_id"]).collect()
    }
    assert out == {1: 100 - 70, 2: 30 - 10, 3: 40, 4: 10}


def test_span_self_times_multi_stream_isolated(spark):
    from micromegas_spark.operators.spans import span_self_times

    # same ids in two streams — child sums must not cross streams
    rows = [
        ("a", 1, -1, 100),
        ("a", 2, 1, 60),
        ("b", 1, -1, 50),
        ("b", 2, 1, 5),
    ]
    df = spark.createDataFrame(rows, "stream_id string, id long, parent long, duration long")
    out = {
        (r["stream_id"], r["id"]): r["self_time"]
        for r in span_self_times(df, key_cols=["stream_id"]).collect()
    }
    assert out == {("a", 1): 40, ("a", 2): 60, ("b", 1): 45, ("b", 2): 5}


def test_span_self_times_from_healed_unclosed_spans(spark):
    from micromegas_spark.operators.spans import build_thread_spans, span_self_times

    # begin root, begin child, child never closed: both heal to range end
    events = spark.createDataFrame(
        [
            ("t", 1, "begin", 0, 11, "root", "m", "a.rs", 1),
            ("t", 2, "begin", 10, 22, "child", "m", "a.rs", 2),
        ],
        "stream_id string, event_id long, event_type string, time_ns long, "
        "hash long, name string, target string, filename string, line int",
    )
    spans = build_thread_spans(events, 0, 100)
    out = {
        r["hash"]: (r["duration"], r["self_time"])
        for r in span_self_times(spans, key_cols=["stream_id"]).collect()
    }
    # root 0..100 (healed), child 10..100 (healed): root self = 100-90
    assert out == {11: (100, 10), 22: (90, 90)}


def test_span_self_times_preserves_input_columns(spark):
    from micromegas_spark.operators.spans import span_self_times

    df = spark.createDataFrame(
        [("s", 1, -1, 10, "x")],
        "stream_id string, id long, parent long, duration long, name string",
    )
    out = span_self_times(df, key_cols=["stream_id"])
    assert out.columns == ["stream_id", "id", "parent", "duration", "name", "self_time"]
