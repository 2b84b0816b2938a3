"""Interleaved in-session A/B for a monkeypatchable operator change.

Alternates OLD/NEW arms round-robin in ONE SparkSession (the only reliable
measurement on this noise-prone box), min-of-N per arm per query, noop sink,
cleared cache between runs. The patch is applied/removed around each arm via
the PATCHES registry below — edit that mapping per experiment.

Usage: python scripts/ab_inline.py <patch_name> <rounds> <query...>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _patch_window_capped():
    """OLD arm = the r11 window-only shape (no hot-key guard, no persist)."""
    import micromegas_spark.operators.dedup as dd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def window_only(posting, keys, max_size, min_size=1):
        kcols = list(keys)
        w = Window.partitionBy(*kcols)
        return (
            posting.withColumn("_df", F.count("*").over(w))
            .where((F.col("_df") >= min_size) & (F.col("_df") <= max_size))
            .drop("_df")
        )

    orig = dd._window_capped
    dd._window_capped = window_only
    return lambda: setattr(dd, "_window_capped", orig)


def _patch_ordered():
    """OLD arm = plain global orderBy at every `ordered` call site."""
    import micromegas_spark.queries as qpkg

    mods = [qpkg.core, qpkg.engine_ops, qpkg.llm, qpkg.sql_surface,
            qpkg.tpch_extra, qpkg.tpch_full]
    olds = {}
    fallback = lambda df, *cols: df.orderBy(*cols)  # noqa: E731
    for m in mods:
        if hasattr(m, "ordered"):
            olds[m] = m.ordered
            m.ordered = fallback

    def undo():
        for m, v in olds.items():
            m.ordered = v

    return undo


def _patch_nb_materialize():
    """OLD arm = r11 localCheckpoint materialization of g/tc in nb_classify."""
    import micromegas_spark.operators.text as T

    orig = T._nb_materialize

    def checkpoint_materialize(df):
        return df.localCheckpoint(eager=True)

    T._nb_materialize = checkpoint_materialize
    return lambda: setattr(T, "_nb_materialize", orig)


def _patch_q21():
    """OLD arm = the r11 q21 (ol self-join + two COUNT DISTINCTs)."""
    from pyspark.sql import functions as F

    from micromegas_spark.queries import REGISTRY
    from micromegas_spark.sources.tables import load_table

    def q21_r11(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
        ol = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
        per_order = ol.groupBy(F.col("l_orderkey").alias("_ok")).agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
                "n_late_supp"
            ),
        )
        return (
            ol.where(F.col("is_late"))
            .join(per_order, ol.l_orderkey == F.col("_ok"))
            .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
            .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("s_name")
            .agg(F.count("*").cast("bigint").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(100)
        )

    qd = REGISTRY["q21_late_suppliers"]
    orig = qd.spark
    qd.spark = q21_r11
    return lambda: setattr(qd, "spark", orig)


def _patch_q11():
    """OLD arm = the r11 q11 (second lineitem scan for the global total,
    plain orderBy final sort)."""
    from pyspark.sql import functions as F

    from micromegas_spark.queries import REGISTRY
    from micromegas_spark.sources.tables import load_table

    def q11_r11(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation")
        dec = F.col("l_extendedprice").cast("decimal(18,2)")
        val = (
            li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"), "l_partkey")
            .agg(F.sum(dec).alias("_pv"))
        )
        total = li.agg(F.sum(dec).cast("double").alias("_total"))
        return (
            val.crossJoin(F.broadcast(total))
            .where(F.col("_pv").cast("double") > 0.00015 * F.col("_total"))
            .select(
                "nation", "l_partkey", F.col("_pv").cast("double").alias("part_value")
            )
            .orderBy(F.col("part_value").desc(), "nation", "l_partkey")
        )

    qd = REGISTRY["q11_important_stock"]
    orig = qd.spark
    qd.spark = q11_r11
    return lambda: setattr(qd, "spark", orig)


def _patch_fuzzy_coalesce():
    """OLD arm = r11 coalesce-below-persist in edit_distance_pairs."""
    import micromegas_spark.operators.fuzzyjoin as fj

    fj._COALESCE_BELOW_PERSIST = True
    return lambda: setattr(fj, "_COALESCE_BELOW_PERSIST", False)


PATCHES = {
    "window_capped": _patch_window_capped,
    "ordered": _patch_ordered,
    "nb_materialize": _patch_nb_materialize,
    "q21": _patch_q21,
    "q11": _patch_q11,
    "fuzzy_coalesce": _patch_fuzzy_coalesce,
}


def main() -> None:
    patch_name, rounds = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from micromegas_spark.queries import REGISTRY
    from micromegas_spark.session import get_spark

    spark = get_spark("ab-inline")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["events_hourly_errors"].spark(spark, sf_dir).collect()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    best: dict[str, dict[str, float]] = {n: {} for n in names}

    def run_arm(arm: str) -> None:
        unpatch = PATCHES[patch_name]() if arm == "old" else (lambda: None)
        try:
            for n in names:
                spark.sparkContext.setJobDescription(f"ab:{arm}:{n}")
                t0 = time.perf_counter()
                REGISTRY[n].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                cur = best[n].get(arm)
                best[n][arm] = dt if cur is None else min(cur, dt)
                spark.catalog.clearCache()
        finally:
            unpatch()

    for r in range(rounds):
        for arm in ("old", "new") if r % 2 == 0 else ("new", "old"):
            run_arm(arm)
            print(f"round {r} arm {arm} done", flush=True)

    out = {
        n: {
            "old": round(v["old"], 3),
            "new": round(v["new"], 3),
            "ratio": round(v["new"] / v["old"], 3),
        }
        for n, v in best.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
