#!/usr/bin/env python
"""Dump EVERY executed SQL plan of one query run (r19 plan evidence).

Iterative queries run their supersteps eagerly (checkpoint + count
actions), so `df.explain()` on the returned frame only shows the final
assembly over checkpointed RDDs. This runs the query end-to-end with
the UI enabled and writes every SQL execution's plan description —
including the per-round superstep plans in their AQE-final form — so
before/after join-strategy and exchange-count claims are checkable.

Usage: python scripts/capture_exec_plans.py <suffix> <query> [...]
Writes $PLANS_DIR/<query>_exec_<suffix>.txt (default plans/r20) plus
the declared frame's `explain("formatted")` as
$PLANS_DIR/<query>_<suffix>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    from louvain_modularity_spark.registry import all_queries
    from louvain_modularity_spark.session import ensure_conf

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("execplans")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.sql.ui.retainedExecutions", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_conf(spark)
    queries = all_queries()
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl

    def execs():
        url = f"{ui}/api/v1/applications/{app_id}/sql?length=10000&planDescription=true"
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    plans_dir = os.environ.get("PLANS_DIR", "plans/r20")
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        before_ids = {e["id"] for e in execs()}
        df = queries[name](spark, sf_dir)
        with open(f"{plans_dir}/{name}_{suffix}.txt", "w") as f:
            f.write(
                f"# explain('formatted') of the declared {name} frame at {sf_dir}\n"
            )
            f.write(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        df.write.mode("overwrite").format("noop").save()
        new = [e for e in execs() if e["id"] not in before_ids]
        new.sort(key=lambda e: e["id"])
        path = f"{plans_dir}/{name}_exec_{suffix}.txt"
        with open(path, "w") as f:
            f.write(
                f"# every SQL execution of one {name} run at {sf_dir}\n"
                f"# ({len(new)} executions; AQE-final plans)\n"
            )
            for e in new:
                f.write(
                    f"\n===== execution {e['id']} "
                    f"(duration {e.get('duration')}ms) =====\n"
                )
                f.write(e.get("planDescription", "") + "\n")
        print(f"wrote {path} ({len(new)} executions)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
