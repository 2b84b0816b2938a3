"""Per-query profiling harness for the optimization rounds.

Times a subset of registry queries with the same methodology as bench.py
(noop sink, best-of-N, cleared cache between repeats), optionally
printing the formatted plan and per-job wall breakdown via job-group
listener data. Usage:

    python scripts/profile_queries.py q1_pricing_summary docs_simhash_neardup
    python scripts/profile_queries.py --top 20          # slowest 20 from BENCH_full.json
    python scripts/profile_queries.py --plans-dir plans/r11 --suffix before <names...>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0, help="slowest N from BENCH_full.json")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans-dir", default="", help="dump explain('formatted') here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = list(args.names)
    if args.top:
        with open(os.path.join(here, "BENCH_full.json")) as f:
            q = json.load(f)["queries"]
        names += [n for n, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.top]]

    from micromegas_spark.queries import REGISTRY
    from micromegas_spark.session import get_spark

    spark = get_spark("micromegas-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmups as bench.py
    REGISTRY["events_hourly_errors"].spark(spark, args.sf_dir).collect()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in names:
        if name not in REGISTRY:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        best = None
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = REGISTRY[name].spark(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(f"{best:8.3f}  {name}", flush=True)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = REGISTRY[name].spark(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
