"""Per-job wall attribution for one registry query (optimization rounds).

Runs the query once (noop sink, same warmups as bench.py), then dumps every
Spark job with duration, description and stage breakdown from the UI REST
API — the §1.1 empirical loop without a browser. Usage:

    python scripts/job_profile.py docs_minhash_neardup_stream
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("JOB_PROFILE_REPEATS", "2"))

    from pyspark.sql import SparkSession

    from micromegas_spark.queries import REGISTRY
    from micromegas_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count()
    SparkSession.builder.master(f"local[{cpus}]").appName("job-profile").config(
        "spark.ui.enabled", "true"
    ).getOrCreate()
    spark = get_spark("job-profile")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["events_hourly_errors"].spark(spark, sf_dir).collect()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(cut_ms: float):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            jobs = json.load(r)
        out = []
        for j in jobs:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            sub_ms = time.mktime(t0) * 1000 + int(j["submissionTime"][20:23])
            if sub_ms >= cut_ms:
                out.append(j)
        return sorted(out, key=lambda j: j["jobId"])

    last = None
    for i in range(repeats):
        cut = time.time() * 1000 - 1  # REST times are local-naive; cut on wall
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        time.sleep(0.5)
        jj = jobs_after(cut)
        tot = 0.0
        print(f"== repeat {i}: wall {wall:.3f}s, {len(jj)} jobs")
        for j in jj:
            end = j.get("completionTime", "")
            dur = "?"
            if end:
                a = time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")) + int(j["submissionTime"][20:23]) / 1e3
                b = time.mktime(time.strptime(end[:19], "%Y-%m-%dT%H:%M:%S")) + int(end[20:23]) / 1e3
                dur = f"{b - a:7.3f}"
                tot += b - a
            desc = (j.get("description") or j.get("name") or "")[:110]
            print(f"  job {j['jobId']:4d} {dur}s tasks={j['numTasks']:4d}  {desc}")
        print(f"  sum job durations: {tot:.3f}s (gaps to wall = driver/planning/catalog time)")
        last = jj
    _ = last


if __name__ == "__main__":
    main()
