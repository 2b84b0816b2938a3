"""Bucketed co-located joins: the equi-join on the bucket key must plan
WITHOUT a shuffle (no Exchange above either scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from micromegas_spark.sources.bucketing import bucketed_join, write_bucketed
from micromegas_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_bucketed",
        ["l_orderkey"],
        n_buckets=8,
        sort_cols=["l_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # broadcast would also avoid the shuffle — disable it to prove the
    # bucket alignment itself carries the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_bucketed", "o_bucketed", ["l_orderkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # correctness: same result as the plain join
        got = j.count()
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders")
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    agg = spark.table("li_bucketed").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
