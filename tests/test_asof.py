"""As-of join semantics: inclusive match, tie-breaks, tolerance, no-match."""

from __future__ import annotations

from micromegas_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, ["k", "t", "lid"])
    right = spark.createDataFrame(right_rows, ["k", "t", "rid"])
    out = asof_join(
        left, right, key_cols=["k"], time_col="t", right_value_cols=["rid"],
        tie_col="rid", **kw,
    )
    return {r.lid: (r.rid_asof, r.asof_gap) for r in out.collect()}


def test_asof_basic_backward(spark):
    got = _run(
        spark,
        left_rows=[(1, 100, 10), (1, 250, 11), (2, 50, 20)],
        right_rows=[(1, 90, 1), (1, 200, 2), (2, 60, 3)],
    )
    assert got[10] == (1, 10)     # 90 ≤ 100
    assert got[11] == (2, 50)     # 200 ≤ 250 (latest)
    assert got[20] == (None, None)  # no right row at or before 50


def test_asof_inclusive_and_ties(spark):
    got = _run(
        spark,
        left_rows=[(1, 100, 10)],
        right_rows=[(1, 100, 5), (1, 100, 7), (1, 40, 1)],
    )
    # equal-time right rows match (≤); greatest tie-breaker wins
    assert got[10] == (7, 0)


def test_asof_tolerance(spark):
    got = _run(
        spark,
        left_rows=[(1, 100, 10), (1, 500, 11)],
        right_rows=[(1, 90, 1)],
        tolerance=50,
    )
    assert got[10] == (1, 10)       # within 50
    assert got[11] == (None, None)  # 410 > 50 → masked


def test_asof_key_isolation(spark):
    got = _run(
        spark,
        left_rows=[(1, 100, 10), (2, 100, 20)],
        right_rows=[(1, 50, 1)],
    )
    assert got[10] == (1, 50)
    assert got[20] == (None, None)  # other key's rights never leak
