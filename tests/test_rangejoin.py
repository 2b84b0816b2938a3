"""Range join: binned algorithm ≡ naive theta join on adversarial cases
(intervals spanning many buckets, touching boundaries, zero-length)."""

from __future__ import annotations

from micromegas_spark.operators.rangejoin import point_in_interval_join


def test_binned_equals_naive(spark):
    intervals = spark.createDataFrame(
        [
            (1, "a", 0, 1000),     # spans many buckets at width 100
            (1, "b", 950, 950),    # zero-length
            (1, "c", 100, 200),    # boundary-aligned
            (2, "d", 0, 10_000),
        ],
        ["k", "iv", "b", "e"],
    )
    points = spark.createDataFrame(
        [(1, 10, 0), (1, 11, 100), (1, 12, 200), (1, 13, 950), (1, 14, 1001), (2, 20, 9999)],
        ["k", "pid", "t"],
    )
    got = {
        (r.pid, r.iv)
        for r in point_in_interval_join(
            points, intervals, ["k"], "t", "b", "e", bucket_width=100
        ).collect()
    }
    naive = {
        (r.pid, r.iv)
        for r in points.join(intervals, "k")
        .where("t >= b AND t <= e")
        .collect()
    }
    assert got == naive
    assert (13, "b") in got        # zero-length interval matches its point
    assert (14, "a") not in got    # 1001 > 1000 excluded
    assert (11, "a") in got and (11, "c") in got  # multi-interval match
