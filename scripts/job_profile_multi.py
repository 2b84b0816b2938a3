"""Multi-query variant of job_profile.py: one session, N queries, prints a
compact per-query structural summary (warm repeat): wall, job count, job-sum,
top-3 jobs. Flags for §1.1 triage: giant single jobs, many sequential small
jobs (scheduling floor), duplicate-looking job groups.

Usage: python scripts/job_profile_multi.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
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

    def dur(j):
        end = j.get("completionTime", "")
        if not end:
            return 0.0
        a = time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")) + int(j["submissionTime"][20:23]) / 1e3
        b = time.mktime(time.strptime(end[:19], "%Y-%m-%dT%H:%M:%S")) + int(end[20:23]) / 1e3
        return b - a

    for name in names:
        if name not in REGISTRY:
            print(f"!! unknown {name}")
            continue
        best_wall, best_jobs = None, None
        for i in range(repeats):
            cut = time.time() * 1000 - 1
            t0 = time.perf_counter()
            try:
                df = REGISTRY[name].spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(f"!! {name}: {type(e).__name__}: {e}"[:160])
                break
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            time.sleep(0.4)
            jj = jobs_after(cut)
            if best_wall is None or wall < best_wall:
                best_wall, best_jobs = wall, jj
        if best_jobs is None:
            continue
        tot = sum(dur(j) for j in best_jobs)
        top = sorted(best_jobs, key=dur, reverse=True)[:3]
        tops = "; ".join(
            f"{dur(j):.2f}s/{j['numTasks']}t" for j in top
        )
        print(
            f"{name:34s} wall={best_wall:6.2f} jobs={len(best_jobs):3d} "
            f"jobsum={tot:6.2f} top3: {tops}",
            flush=True,
        )


if __name__ == "__main__":
    main()
