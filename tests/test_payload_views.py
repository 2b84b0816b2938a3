"""Payload decode path (get_payload/parse_block), OTel span views, net-span
tree invariants, Lakehouse admin ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from micromegas_spark.sources import payload as PL
from micromegas_spark.views import netspans as NS
from micromegas_spark.views import otel as OT


@pytest.fixture(scope="module")
def payload_world(spark):
    blocks_events = {
        f"blk{b}": [
            {"__type": "LogMsgEvent" if i % 2 else "BeginScopeEvent", "seq": i, "msg": f"m{b}-{i}"}
            for i in range(20)
        ]
        for b in range(5)
    }
    payloads = PL.make_payload_table(spark, blocks_events)
    meta = spark.createDataFrame(
        [(f"blk{b}", f"stream{b % 2}", f"proc{b % 2}") for b in range(5)],
        ["block_id", "stream_id", "process_id"],
    )
    return blocks_events, payloads, meta


def test_payload_roundtrip():
    objs = [{"__type": "T", "a": 1}, {"__type": "U", "b": [1, 2], "s": "x"}]
    assert list(PL.decode_block(PL.encode_block(objs))) == objs


def test_parse_block_rows(spark, payload_world):
    blocks_events, payloads, _ = payload_world
    rows = PL.parse_block(payloads).collect()
    assert len(rows) == 100
    by_block = {}
    for r in rows:
        by_block.setdefault(r.block_id, []).append(r)
    for bid, rs in by_block.items():
        assert [r.object_index for r in sorted(rs, key=lambda r: r.object_index)] == list(range(20))
    tn = {r.type_name for r in rows}
    assert tn == {"LogMsgEvent", "BeginScopeEvent"}
    # value is the canonical JSON of the object
    import json

    r0 = next(r for r in rows if r.block_id == "blk0" and r.object_index == 0)
    assert json.loads(r0.value) == blocks_events["blk0"][0]


def test_parse_block_early_stop(spark, payload_world):
    _, payloads, _ = payload_world
    limited = PL.parse_block(payloads, limit=3).collect()
    assert len(limited) == 15  # 3 per block, decoding stopped early


def test_get_payload_join(spark, payload_world):
    _, payloads, meta = payload_world
    one = PL.get_payload(meta, payloads, "blk2").collect()
    assert len(one) == 1 and one[0].stream_id == "stream0"
    allp = PL.get_payload(meta, payloads)
    assert allp.count() == 5


# -- otel ------------------------------------------------------------------

OTEL_ROWS = [
    # trace t1: root -> (child a, child b); child b errors
    ("T1", "A1", None, "root", "SERVER", "OK", 0, 1000, "[]", "[]"),
    ("T1", "B2", "A1", "db_query", "CLIENT", "OK", 100, 400, "[]", "[]"),
    ("T1", "C3", "A1", "render", "INTERNAL", "ERROR", 500, 900, "[]", "[]"),
    # trace t2: single root, default kind/status
    ("T2", "D4", None, "job", None, None, 50, 150, "[]", "[]"),
]


@pytest.fixture(scope="module")
def otel(spark):
    raw = spark.createDataFrame(
        OTEL_ROWS,
        [
            "trace_id", "span_id", "parent_span_id", "name", "kind", "status",
            "start_time_ns", "end_time_ns", "events_json", "links_json",
        ],
    )
    return OT.otel_spans_view(raw)


def test_otel_normalization(otel):
    d4 = next(r for r in otel.collect() if r.span_id == "d4")
    assert d4.kind == "INTERNAL" and d4.status == "UNSET" and d4.duration == 100
    assert d4.trace_id == "t2"  # lowercased


def test_otel_hierarchy_join(otel):
    kids = {r.span_id: r for r in OT.span_children(otel).collect()}
    assert set(kids) == {"b2", "c3"}
    assert kids["b2"].parent_name == "root"
    assert abs(kids["b2"].parent_share - 0.3) < 1e-12


def test_otel_trace_summary(otel):
    s = {r.trace_id: r for r in OT.trace_summary(otel).collect()}
    assert s["t1"].n_spans == 3 and s["t1"].n_errors == 1
    assert s["t1"].root_name == "root" and s["t1"].trace_duration == 1000
    assert s["t2"].n_spans == 1 and s["t2"].n_errors == 0


# -- net spans --------------------------------------------------------------


def _net_rows(bad: bool = False):
    rows = [
        # span_id, parent, depth, kind, name, connection, outgoing, begin, end, size
        (1, -1, 0, "connection", "conn", "c1", True, 0, 1000, 1000),
        (2, 1, 1, "object", "objA", "c1", True, 0, 600, 600),
        (3, 1, 1, "object", "objB", "c1", True, 600, 1000, 400),
        (4, 2, 2, "property", "p1", "c1", True, 0, 300, 300),
    ]
    if bad:
        rows.append((5, 2, 2, "property", "p2", "c1", True, 100, 900, 800))  # overflows parent 2
    return rows


COLS = [
    "span_id", "parent_span_id", "depth", "kind", "name", "connection_name",
    "is_outgoing", "begin_bits", "end_bits", "bit_size",
]


def test_net_tree_invariants_ok(spark):
    df = spark.createDataFrame(_net_rows(), COLS)
    assert NS.tree_violations(df).count() == 0
    roll = {(r.kind): r.total_bits for r in NS.bandwidth_rollup(df).collect()}
    assert roll["connection"] == 1000 and roll["object"] == 1000 and roll["property"] == 300


def test_net_tree_invariants_catch_violation(spark):
    df = spark.createDataFrame(_net_rows(bad=True), COLS)
    bad = NS.tree_violations(df).collect()
    assert len(bad) == 1 and bad[0].p_id == 2


# -- admin ops ---------------------------------------------------------------


def test_partitions_df_sql_surface(spark, tmp_path):
    from micromegas_spark.materialize import LOG_STATS, Lakehouse
    from micromegas_spark.sources.synthetic import generate

    data = generate(seed=8)
    spark.createDataFrame(data["blocks"]).join(
        spark.createDataFrame(data["streams"]).select("stream_id", "tags"), "stream_id"
    ).createOrReplaceTempView("blocks")
    spark.createDataFrame(data["log_entries"]).createOrReplaceTempView("log_entries")
    lake = Lakehouse(spark, str(tmp_path / "whp"))
    HOUR = 3600 * 10**9
    ins = [b["insert_time_ns"] for b in data["blocks"]]
    lo = min(ins) - min(ins) % HOUR
    hi = max(ins) - max(ins) % HOUR + HOUR
    lake.materialize_range(LOG_STATS, lo, hi, HOUR)

    pdf = lake.partitions_df()
    pdf.createOrReplaceTempView("lakehouse_partitions")
    out = spark.sql(
        "SELECT view_set, COUNT(*) AS n FROM lakehouse_partitions GROUP BY view_set"
    ).collect()
    assert out[0].view_set == "log_stats" and out[0].n == len(lake.list_partitions("log_stats"))


def test_images_view(spark):
    from micromegas_spark.operators import multimodal as MM

    rows = [
        (1, "image", b"img-bytes-1", {"process_id": "p1"}),
        (2, "video", b"vid-bytes", {"process_id": "p1"}),
        (3, "image", b"img-bytes-3", {"process_id": "p2"}),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    procs = spark.createDataFrame([("p1", "game-client"), ("p2", "web-srv")], ["process_id", "exe"])
    out = {r.media_id: r for r in MM.images_view(media, procs).collect()}
    assert set(out) == {1, 3}  # images only
    assert out[1].exe == "game-client" and out[3].exe == "web-srv"
    assert out[1].n_bytes == len(b"img-bytes-1")


def test_admin_retire_and_regenerate(spark, tmp_path):
    from micromegas_spark.materialize import LOG_STATS, Lakehouse
    from micromegas_spark.sources.synthetic import generate

    data = generate(seed=5)
    spark.createDataFrame(data["blocks"]).join(
        spark.createDataFrame(data["streams"]).select("stream_id", "tags"), "stream_id"
    ).createOrReplaceTempView("blocks")
    spark.createDataFrame(data["log_entries"]).createOrReplaceTempView("log_entries")

    lake = Lakehouse(spark, str(tmp_path / "wh"))
    HOUR = 3600 * 10**9
    ins = [b["insert_time_ns"] for b in data["blocks"]]
    lo = min(ins) - min(ins) % HOUR
    hi = max(ins) - max(ins) % HOUR + HOUR
    lake.materialize_range(LOG_STATS, lo, hi, HOUR)
    n = len(lake.list_partitions("log_stats"))
    assert n > 0
    assert lake.list_view_sets() == ["log_stats"]

    # retire one bucket → gone from catalog; regenerate → rebuilt
    assert lake.retire_partitions("log_stats", lo, lo + HOUR) == 1
    assert len(lake.list_partitions("log_stats")) == n - 1
    stats = lake.regenerate_partitions(LOG_STATS, lo, hi, HOUR)
    assert stats.get("created", 0) == n  # freshness bypassed: all rebuilt
    assert len(lake.list_partitions("log_stats")) == n


def test_sql_udtf_spellings(spark, payload_world):
    """The SQL table-function spellings (functions/udtfs.py) must agree with
    the DataFrame analogues they share decode code with."""
    from micromegas_spark.functions import register_all

    register_all(spark)
    _, payloads, _ = payload_world
    payloads.createOrReplaceTempView("block_payloads_sql")

    sql_rows = spark.sql(
        """
        SELECT p.block_id, p.object_index, p.type_name, p.value
        FROM block_payloads_sql, LATERAL parse_block(block_id, payload) p
        """
    ).collect()
    df_rows = PL.parse_block(payloads).collect()
    key = lambda r: (r.block_id, r.object_index)  # noqa: E731
    assert sorted([tuple(r) for r in sql_rows], key=str) == sorted(
        [tuple(r) for r in df_rows], key=str
    )

    each = spark.sql("""SELECT * FROM jsonb_each('{"a": 1, "b": [2, 3]}')""").collect()
    assert {(r.key, r.value) for r in each} == {("a", "1"), ("b", "[2,3]")}
    # arrays enumerate with index keys; string values come back UNQUOTED
    # (get_json_object semantics — same as the DataFrame spelling)
    each_arr = spark.sql("""SELECT * FROM jsonb_each('[10, "x"]')""").collect()
    assert [(r.key, r.value) for r in each_arr] == [("0", "10"), ("1", "x")]
    # JSON null member → SQL NULL, matching functions/jsonb.jsonb_each
    nulls = spark.sql("""SELECT * FROM jsonb_each('{"a": null}')""").collect()
    assert [(r.key, r.value) for r in nulls] == [("a", None)]

    elems = spark.sql("""SELECT * FROM jsonb_array_elements('[1, {"k": 2}]')""").collect()
    assert [r.value for r in elems] == ["1", '{"k":2}']
    # non-array input yields no rows
    assert spark.sql("""SELECT * FROM jsonb_array_elements('{"a":1}')""").count() == 0
