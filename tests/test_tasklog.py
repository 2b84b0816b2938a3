"""S11 task-log surface: the partition-admin table functions' SQL
spelling returns the operation's progress log as a (time, msg) relation
(reference: dfext/task_log_exec_plan.rs + log_stream_table_provider.rs,
wired in lakehouse/{materialize,retire,regenerate}_partitions_table_
function.rs; our semantics and the documented streaming delta live in
micromegas_spark/materialize/tasklog.py)."""

from __future__ import annotations

import pytest

from micromegas_spark.engine import Engine, InvalidArgument

HOUR = 3_600 * 10**9


@pytest.fixture()
def admin_engine(spark, tmp_path):
    from micromegas_spark.materialize import LOG_STATS
    from micromegas_spark.sources.synthetic import generate

    data = generate(seed=11)
    spark.createDataFrame(data["blocks"]).join(
        spark.createDataFrame(data["streams"]).select("stream_id", "tags"),
        "stream_id",
    ).createOrReplaceTempView("blocks")
    spark.createDataFrame(data["log_entries"]).createOrReplaceTempView("log_entries")
    eng = Engine(spark, warehouse=str(tmp_path / "wh_tasklog"))
    eng.register_batch_view(LOG_STATS)
    ins = [b["insert_time_ns"] for b in data["blocks"]]
    lo = min(ins) - min(ins) % HOUR
    hi = max(ins) - max(ins) % HOUR + HOUR
    return eng, lo, hi


def test_materialize_sql_spelling_returns_task_log(admin_engine):
    eng, lo, hi = admin_engine
    df = eng.query(
        f"SELECT * FROM materialize_partitions('log_stats', '{lo}', '{hi}', 3600)"
    )
    # the reference's result schema: (time Timestamp, msg Utf8)
    assert [f.name for f in df.schema.fields] == ["time", "msg"]
    assert df.schema["time"].dataType.typeName() == "timestamp"
    rows = df.collect()
    # one row per bucket decision + the summary row
    n_buckets = (hi - lo) // HOUR
    assert len(rows) == n_buckets + 1
    assert sum(": created" in r.msg for r in rows) >= 1
    assert rows[-1].msg.startswith("log_stats: done,")
    # log times are non-decreasing (the stream order the reference emits)
    ts = [r.time for r in rows]
    assert ts == sorted(ts)
    # the op actually ran: partitions exist now
    assert len(eng.lakehouse.list_partitions("log_stats")) >= 1

    # second tick: everything fresh -> up_to_date rows, nothing recreated
    df2 = eng.query(
        f"SELECT msg FROM materialize_partitions('log_stats', '{lo}', '{hi}', 3600)"
    )
    msgs2 = [r.msg for r in df2.collect()]
    assert sum(": up_to_date" in m for m in msgs2) == n_buckets


def test_retire_and_regenerate_sql_spellings(admin_engine):
    eng, lo, hi = admin_engine
    eng.query(
        f"SELECT * FROM materialize_partitions('log_stats', '{lo}', '{hi}', 3600)"
    ).collect()
    n_parts = len(eng.lakehouse.list_partitions("log_stats"))
    assert n_parts >= 1

    # retire: one row per retired partition (path included) + summary,
    # and the catalog is actually empty afterwards
    msgs = [
        r.msg
        for r in eng.query(
            f"SELECT * FROM retire_partitions('log_stats', '{lo}', '{hi}')"
        ).collect()
    ]
    assert sum(m.startswith("retired partition log_stats[") for m in msgs) == n_parts
    assert msgs[-1] == f"log_stats: retired {n_parts} partition(s)"
    assert eng.lakehouse.list_partitions("log_stats") == []

    # regenerate: retire phase (nothing to drop now) + rebuild phase
    msgs = [
        r.msg
        for r in eng.query(
            f"SELECT * FROM regenerate_partitions('log_stats', '{lo}', '{hi}', 3600)"
        ).collect()
    ]
    assert "log_stats: retired 0 partition(s)" in msgs
    assert sum(": created" in m for m in msgs) >= 1
    assert len(eng.lakehouse.list_partitions("log_stats")) >= 1


def test_task_log_composes_with_plain_sql(admin_engine):
    """The log is a real relation: aggregations over it work in the same
    statement (the reference's LogStreamTableProvider is a TableProvider
    for exactly this reason)."""
    eng, lo, hi = admin_engine
    out = eng.query(
        "SELECT COUNT(*) AS n FROM "
        f"materialize_partitions('log_stats', '{lo}', '{hi}', 3600) "
        "WHERE msg LIKE '%created%'"
    ).collect()
    assert out[0].n >= 1


def test_non_admin_gets_not_found_parity(spark, tmp_path):
    """Non-admin sessions never have the admin functions registered
    (reference query.rs:150-175): the SQL spelling fails as 'not found',
    not as a permission error."""
    eng = Engine(spark, warehouse=str(tmp_path / "wh_na_tl"), admin=False)
    with pytest.raises(LookupError, match="not found"):
        eng.query(
            "SELECT * FROM materialize_partitions('log_stats', '0', '1', 3600)"
        )


def test_non_literal_args_rejected(admin_engine):
    eng, lo, hi = admin_engine
    with pytest.raises(InvalidArgument, match="literal arguments"):
        eng.query(
            "SELECT * FROM materialize_partitions(view_col, '0', '1', 3600)"
        )


def test_call_text_inside_string_literal_is_data(admin_engine):
    """Occurrences inside SQL strings are data, not calls — same lexing
    contract as view_instance (no admin op runs, no gate trips)."""
    eng, _, _ = admin_engine
    out = eng.query(
        "SELECT 'retire_partitions(''x'', ''0'', ''1'')' AS s"
    ).collect()
    assert out[0].s == "retire_partitions('x', '0', '1')"


def test_iso_timestamp_arguments(admin_engine):
    """Timestamp literals in ISO form parse via the same path as the
    client surface (timeutils.to_epoch_ns)."""
    eng, lo, hi = admin_engine
    import datetime as dt

    iso = lambda ns: dt.datetime.fromtimestamp(
        ns / 1e9, tz=dt.timezone.utc
    ).isoformat()
    rows = eng.query(
        "SELECT * FROM materialize_partitions("
        f"'log_stats', '{iso(lo)}', '{iso(hi)}', 3600)"
    ).collect()
    assert any(": created" in r.msg or ": up_to_date" in r.msg for r in rows)
