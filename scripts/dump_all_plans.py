"""Dump explain('formatted') for every registry query (or a named subset)
into a plans directory WITHOUT timing anything — used to snapshot the
before/after plan evidence for an optimization round.

Usage: python scripts/dump_all_plans.py plans/r12 before [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from micromegas_spark.queries import REGISTRY
    from micromegas_spark.session import get_spark

    spark = get_spark("micromegas-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    todo = names or sorted(REGISTRY.keys())
    for name in todo:
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # plan-only: a failure must not sink the dump
            plan = f"!! explain failed: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"dumped {name}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
