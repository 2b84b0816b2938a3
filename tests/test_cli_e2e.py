"""Real end-to-end network session: `cli serve` in a CHILD PROCESS, then
`cli query --uri` against it from another process — the full user path
(process boundary, real gRPC loopback, JSON formatting), not the in-process
loopback tests/test_flightsql.py drives."""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def served_uri():
    port = _free_port()
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "micromegas_spark.cli", "serve",
            "--port", str(port), "--sf-dir", SF_SMOKE, "--cpus", "4",
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        # the serve banner prints AFTER the JVM and engine come up (~20 s)
        deadline = time.monotonic() + 180
        line = ""
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if "serving FlightSQL on" in line:
                break
            if proc.poll() is not None:
                pytest.fail(f"serve exited early rc={proc.returncode}")
        else:
            pytest.fail("serve never printed its banner")
        yield line.strip().split()[-1]
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)


def _cli_query(uri: str, sql: str, *extra: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [
            sys.executable, "-m", "micromegas_spark.cli", "query",
            "--uri", uri, sql, "--all", *extra,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )


def test_cli_query_json_over_network(served_uri):
    r = _cli_query(
        served_uri,
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
        "--format", "json",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = json.loads(r.stdout)
    assert len(rows) == 5
    assert rows[0]["r_regionkey"] == 0
    assert {"r_regionkey", "r_name"} <= set(rows[0])


def test_cli_query_csv_over_network(served_uri):
    r = _cli_query(
        served_uri, "SELECT COUNT(*) AS n FROM nation", "--format", "csv"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert lines[0] == "n" and lines[1] == "25"


def test_cli_query_relative_begin_over_network(served_uri):
    # --begin 1h exercises the RFC3339 range-header path over the wire;
    # the smoke events all predate "now - 1h" so the pruned count is 0
    r = subprocess.run(
        [
            sys.executable, "-m", "micromegas_spark.cli", "query",
            "--uri", served_uri, "--begin", "1h", "--format", "csv",
            "SELECT COUNT(*) AS n FROM events",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip().splitlines()[-1] == "0"
