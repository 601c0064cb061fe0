#!/usr/bin/env python
"""Per-job profile of one registered query (r19 optimization round).

Runs `<query>` at $SPARK_GRAFT_SF_DIR with the Spark UI enabled, times
the noop-sink execution, then dumps every job's duration, stage count,
task count and shuffle bytes from the UI REST API — the measure-first
step of the optimization guide (§1) without needing a browser.

Usage: python scripts/profile_query.py q_hits [q_dbscan ...]
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
    if not names:
        print("usage: profile_query.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    from louvain_modularity_spark.registry import all_queries
    from louvain_modularity_spark.session import ensure_conf

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_conf(spark)
    queries = all_queries()

    # warm like bench.py
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for wq in ("q_agg_groupby", "q_join_broadcast"):
            queries[wq](spark, warm_dir).write.mode("overwrite").format("noop").save()

    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl

    def jobs_now():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            return json.loads(r.read())

    for name in names:
        start_jobs = {j["jobId"] for j in jobs_now()}
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        df.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in jobs_now() if j["jobId"] not in start_jobs]
        jobs.sort(key=lambda j: j["jobId"])
        tot_job = 0.0
        rows = []
        for j in jobs:
            st = time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")) + float(j["submissionTime"][20:23]) / 1000
            en = time.mktime(time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")) + float(j["completionTime"][20:23]) / 1000
            dur = en - st
            tot_job += dur
            rows.append((j["jobId"], dur, j["numTasks"], len(j["stageIds"]), (j.get("description") or j.get("name", ""))[:90]))
        print(f"\n=== {name}: wall {wall:.2f}s (df-build {t_build:.2f}s, " f"{len(jobs)} jobs, Σjob {tot_job:.2f}s, gaps {wall - t_build - tot_job:.2f}s)")
        for jid, dur, ntasks, nstages, desc in rows:
            print(f"  job {jid:4d}  {dur:6.3f}s  tasks={ntasks:4d} stages={nstages:2d}  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
