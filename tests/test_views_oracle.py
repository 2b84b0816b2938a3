"""DuckDB differential tests for the telemetry view builders — the same
rigor the driver applies to the contract queries, applied to the views
layer over the synthetic telemetry world (written to parquet so both
engines read identical bytes)."""

from __future__ import annotations

import pytest

from micromegas_spark.sources.synthetic import generate
from micromegas_spark.views import telemetry as V


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("telemetry")
    data = generate(seed=77)
    dfs = {}
    for name, rows in data.items():
        df = spark.createDataFrame(rows)
        path = str(d / f"{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        dfs[name] = spark.read.parquet(path)
    con = duckdb.connect()
    for name in data:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{d}/{name}.parquet/*.parquet')"
        )
    return dfs, con


def _norm(rows):
    return sorted([tuple(r) for r in rows], key=str)


def test_processes_view_matches_oracle(world):
    dfs, con = world
    got = V.processes_view(dfs["processes"], dfs["blocks"]).select(
        "process_id", "exe", "nb_blocks", "nb_objects", "last_block_end_time_ns"
    )
    want = con.sql(
        """
        SELECT p.process_id, p.exe, s.nb_blocks, s.nb_objects, s.last_block_end_time_ns
        FROM processes p LEFT JOIN (
            SELECT process_id, COUNT(*) AS nb_blocks, SUM(nb_objects) AS nb_objects,
                   MAX(end_time_ns) AS last_block_end_time_ns
            FROM blocks GROUP BY process_id
        ) s USING (process_id)
        """
    ).fetchall()
    assert _norm([tuple(r) for r in got.collect()]) == _norm(want)


def test_blocks_view_matches_oracle(world):
    dfs, con = world
    got = V.blocks_view(dfs["blocks"], dfs["streams"], dfs["processes"]).select(
        "block_id", "`streams.tags`", "`processes.exe`", "nb_objects"
    )
    want = con.sql(
        """
        SELECT b.block_id, s.tags, p.exe, b.nb_objects
        FROM blocks b JOIN streams s USING (stream_id) JOIN processes p ON b.process_id = p.process_id
        """
    ).fetchall()
    got_n = _norm([(r[0], list(r[1]), r[2], r[3]) for r in got.collect()])
    want_n = _norm([(r[0], list(r[1]), r[2], r[3]) for r in want])
    assert got_n == want_n


def test_log_stats_extract_matches_oracle(world):
    dfs, con = world
    got = V.log_stats_extract(dfs["log_entries"], bin_seconds=60)
    want = con.sql(
        """
        SELECT time_ns - time_ns % 60000000000 AS time_bin_ns, process_id, level, target,
               COUNT(*) AS count
        FROM log_entries GROUP BY 1, 2, 3, 4
        """
    ).fetchall()
    assert _norm([tuple(r) for r in got.collect()]) == _norm(want)


def test_log_entries_enrichment_matches_oracle(world):
    dfs, con = world
    got = V.log_entries_view(dfs["log_entries"], dfs["processes"]).select(
        "process_id", "time_ns", "level", "exe", "username"
    )
    want = con.sql(
        """
        SELECT l.process_id, l.time_ns, l.level, p.exe, p.username
        FROM log_entries l JOIN processes p USING (process_id)
        """
    ).fetchall()
    assert _norm([tuple(r) for r in got.collect()]) == _norm(want)


def test_measures_view_matches_oracle(world):
    dfs, con = world
    got = V.measures_view(dfs["measures"], dfs["processes"]).select(
        "process_id", "name", "unit", "value", "exe"
    )
    want = con.sql(
        """
        SELECT m.process_id, m.name, m.unit, m.value, p.exe
        FROM measures m JOIN processes p USING (process_id)
        """
    ).fetchall()
    assert _norm([tuple(r) for r in got.collect()]) == _norm(want)
