"""Measure what AQE actually buys on this engine's headline shapes.

The session factory turns on adaptive execution (runtime coalescing +
skew-join splitting) and SCALE.md reasons from that; this script puts
a number on it: a representative slice of the bench headline set runs
twice in fresh sessions — AQE on vs AQE off — at sf0.1 with the
default 200 shuffle partitions (the regime AQE coalescing targets;
bench.py's CPU-sized default partially pre-solves what AQE solves, so
the 200-partition run isolates the mechanism). min-of-2 per query per
mode. Results recorded in SCALE.md §2.

Run: PYTHONPATH=/root/repo python scripts/stress_aqe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = [
    "q_agg_groupby",
    "q_join_broadcast",
    "q_edges_from_relational",
    "q_tpch_q3",
    "q_tpch_q8",
    "q_dup_clusters",
    "q_semdedup",
]


def session(aqe: bool) -> SparkSession:
    b = (
        SparkSession.builder.appName(f"aqe_{aqe}")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_mode(aqe: bool) -> dict:
    from louvain_modularity_spark.registry import all_queries

    spark = session(aqe)
    q = all_queries()
    out = {}
    for name in QUERIES:
        best = None
        for _ in range(2):
            t0 = time.time()
            q[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    spark.stop()
    return out


def main() -> None:
    on = run_mode(True)
    off = run_mode(False)
    print("query | aqe_on_s | aqe_off_s | delta")
    for name in QUERIES:
        d = (off[name] - on[name]) / off[name] * 100
        print(f"{name} | {on[name]} | {off[name]} | {d:+.0f}%")
    print("total |", round(sum(on.values()), 2), "|", round(sum(off.values()), 2))


if __name__ == "__main__":
    main()
