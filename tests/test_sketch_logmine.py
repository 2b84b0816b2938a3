"""KMV sketch + log-template mining operator tests (assertion oracles;
the registry queries carry the DuckDB hash oracles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from micromegas_spark.operators.logmine import mine_templates
from micromegas_spark.operators.sketch import kmv_hashes, kmv_merge_estimates, kmv_sketches


def _sketch_pairs(spark, rows):
    return spark.createDataFrame(rows, "side string, h long")


def test_kmv_sketch_is_exactly_k_smallest_distinct(spark):
    # 1000 distinct hashes per side, known order: the sketch must be the
    # exact k smallest regardless of the pruning threshold path.
    rows = [("A", (h * 7919) % 100003 * 2_000_000_000) for h in range(1000)]
    rows += [("B", (h * 104729) % 100003 * 2_000_000_000 + 1) for h in range(1000)]
    sk = kmv_sketches(_sketch_pairs(spark, rows), k=32).collect()
    got = {r["side"]: r["ks"] for r in sk}
    for side in ("A", "B"):
        want = sorted({h for s, h in rows if s == side})[:32]
        assert got[side] == want


def test_kmv_sketch_small_side_keeps_everything(spark):
    rows = [("A", h) for h in (5, 3, 9)] + [("B", h) for h in range(100)]
    sk = kmv_sketches(_sketch_pairs(spark, rows), k=32).collect()
    got = {r["side"]: r["ks"] for r in sk}
    assert got["A"] == [3, 5, 9]
    assert got["B"] == list(range(32))


def test_kmv_estimates_identical_sides_give_jaccard_one(spark):
    # evenly spread over the FULL 48-bit space — the estimator's
    # uniformity assumption (md5 provides it in production)
    step = (1 << 48) // 400
    rows = [("A", h * step) for h in range(1, 400)]
    rows += [("B", h * step) for h in range(1, 400)]
    est = kmv_merge_estimates(kmv_sketches(_sketch_pairs(spark, rows), k=64), k=64).collect()[0]
    assert est["jaccard_est"] == 1.0
    assert est["n_a_est"] == est["n_b_est"] == est["union_est"]
    # (k-1)/u_k unbiased-ish: within 35% of the true 399 at k=64
    assert est["n_a_est"] == pytest.approx(399, rel=0.35)


def test_kmv_estimates_disjoint_sides_give_jaccard_zero(spark):
    rows = [("A", 2 * h * 1_000_000_000_000) for h in range(1, 300)]
    rows += [("B", (2 * h + 1) * 1_000_000_000_000) for h in range(1, 300)]
    est = kmv_merge_estimates(kmv_sketches(_sketch_pairs(spark, rows), k=64), k=64).collect()[0]
    assert est["jaccard_est"] == 0.0
    assert est["inter_est"] == 0.0


def test_kmv_hashes_are_48_bit(spark):
    df = spark.createDataFrame([("alpha beta gamma delta",)], "text string")
    hs = df.select(F.explode(kmv_hashes(F.col("text"))).alias("h")).collect()
    assert hs and all(0 <= r["h"] < (1 << 48) for r in hs)


def test_mine_templates_masks_variable_positions(spark):
    # slot 3 carries a unique id per row -> masked; slots 1-2 stable -> kept
    rows = [(i, f"GET /api/users id={i} ok") for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, msg string")
    out = {r["template"] for r in mine_templates(df, max_distinct=8).collect()}
    assert out == {"GET /api/users <*> ok"}


def test_mine_templates_groups_by_token_count(spark):
    # different arities never share a mask decision
    rows = [(i, f"login user{i}") for i in range(20)]
    rows += [(100 + i, f"logout user{i} session{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, msg string")
    got = {r["event_id"]: r["template"] for r in mine_templates(df, max_distinct=8).collect()}
    assert got[0] == "login <*>"
    assert got[100] == "logout <*> <*>"


def test_mine_templates_keeps_low_cardinality_slots(spark):
    # 3 levels <= threshold stay verbatim while the payload is masked
    rows = [(i, f"{lvl} request took {i}ms") for i, lvl in enumerate(["INFO", "WARN", "ERROR"] * 10)]
    df = spark.createDataFrame(rows, "event_id long, msg string")
    out = {r["template"] for r in mine_templates(df, max_distinct=8).collect()}
    assert out == {"INFO request took <*>", "WARN request took <*>", "ERROR request took <*>"}
