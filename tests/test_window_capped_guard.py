"""Hot-key guard of dedup._window_capped (VERDICT r11 "What's wrong" #2).

A degenerate corpus (a massive identical-doc cluster) puts a corpus-scale
bucket behind ONE band key; `count(*) over (partition by key)` would ship
that whole bucket to a single window task. The guard must prune over-cap
keys with a broadcast anti-join BEFORE the key exchange, and the registry
release must return storage to baseline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from micromegas_spark.cachereg import release_caches
from micromegas_spark.operators.dedup import _window_capped


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_degenerate_single_key_pruned_before_exchange(spark):
    # one hot key with 5000 rows, 10 mid keys with 5 rows, 100 singletons
    rows = (
        [(i, "hot") for i in range(5000)]
        + [(10_000 + i, f"mid{i % 10}") for i in range(50)]
        + [(20_000 + i, f"solo{i}") for i in range(100)]
    )
    posting = spark.createDataFrame(rows, "id long, bkey string")
    out = _window_capped(posting, ("bkey",), max_size=10, min_size=2)

    plan = _plan(out)
    # guard shape: broadcast anti-join (the pre-exchange prune) feeding the
    # window's hash exchange — i.e. the hot key never crosses keyed
    assert "BroadcastExchange" in plan
    assert "LeftAnti" in plan
    assert "Window" in plan
    # the window (top) prints above the anti join (its child) in the tree
    assert plan.index("Window") < plan.index("LeftAnti")

    got = out.groupBy("bkey").count().collect()
    by_key = {r["bkey"]: r["count"] for r in got}
    assert "hot" not in by_key  # over cap → pruned
    assert all(by_key[f"mid{i}"] == 5 for i in range(10))  # in [2, 10] → kept
    assert not any(k.startswith("solo") for k in by_key)  # below min → dropped

    released = release_caches(blocking=True)
    assert released >= 1


def test_cache_registry_returns_storage_to_baseline(spark):
    release_caches(blocking=True)
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    base = len(jsc.getRDDStorageInfo())

    posting = spark.createDataFrame(
        [(i, f"k{i % 7}") for i in range(140)], "id long, bkey string"
    )
    for _ in range(3):  # N queries, each pinning a tracked cache
        _window_capped(posting, ("bkey",), max_size=100).count()
    assert len(jsc.getRDDStorageInfo()) > base

    release_caches(blocking=True)
    assert len(jsc.getRDDStorageInfo()) == base
