"""Measure the Bloom pre-filter's payoff on a shuffle join.

q_bloom_prefilter demonstrates the build/probe mechanics with exact FP
accounting; this script measures the END-TO-END question: when the
dimension side is too large to broadcast (the regime runtime filters
exist for — with a broadcastable dim, the hash join already gates the
fact scan and a Bloom adds nothing), does pre-gating the fact table
with the 4096-bit filter beat shuffling every fact row?

Method: lineitem ⋈ (suppliers of one nation) at $SPARK_GRAFT_SF_DIR
with autoBroadcastJoinThreshold=-1 (forces a shuffle join, simulating
a dim too big to broadcast), timed three ways, min-of-3 each:

  plain     — shuffle join of the full fact table
  bloom     — fact rows pass the broadcast 128-word filter first, then
              the same shuffle join (correct: Bloom has no false
              negatives; FPs are removed by the join itself)
  broadcast — the default plan for THIS data size (dim is tiny), as
              the honest baseline showing when bloom is pointless

Selectivity here is ~1/25 (one nation), so the bloom path shuffles
~4% of the fact rows + FPs. Results recorded in SCALE.md §2.

Run: PYTHONPATH=/root/repo python scripts/stress_bloom.py
"""

import os
import time

from pyspark.sql import SparkSession
import pyspark.sql.functions as F

import sys

sys.path.insert(0, "/root/repo")

from louvain_modularity_spark.relational import BLOOM_M, BLOOM_NATION, _bloom_hashes
from louvain_modularity_spark.sources import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]"
        )
        .appName("stress_bloom")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = load(spark, SF_DIR, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = (
        load(spark, SF_DIR, "supplier")
        .filter(F.col("s_nationkey") == BLOOM_NATION)
        .select("s_suppkey")
    )

    def agg(joined):
        return joined.agg(
            F.count("*").alias("n"), F.sum("l_extendedprice").alias("s")
        ).collect()

    # dim as a plain (non-broadcastable by conf) join side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    t_plain = timed(
        lambda: agg(li.join(supp, li.l_suppkey == supp.s_suppkey))
    )

    h1, h2 = _bloom_hashes(F.col("s_suppkey"))
    words = (
        supp.select(F.explode(F.array(h1, h2)).alias("h"))
        .select(
            (F.col("h") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 32 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .localCheckpoint(eager=True)
    )

    def bloom_gated():
        p1, p2 = _bloom_hashes(F.col("l_suppkey"))
        probe = li.select(
            "l_suppkey",
            "l_extendedprice",
            (p1 / 32).cast("long").alias("w1_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST((l_suppkey * 2654435761) % {BLOOM_M} % 32 AS INT))"
            ).alias("m1"),
            (p2 / 32).cast("long").alias("w2_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST((l_suppkey * 40503 + 17) % {BLOOM_M} % 32 AS INT))"
            ).alias("m2"),
        )
        gated = (
            probe.join(
                F.broadcast(
                    words.select(
                        F.col("word_idx").alias("w1_idx"), F.col("word").alias("w1")
                    )
                ),
                "w1_idx",
            )
            .join(
                F.broadcast(
                    words.select(
                        F.col("word_idx").alias("w2_idx"), F.col("word").alias("w2")
                    )
                ),
                "w2_idx",
            )
            .filter(
                (F.col("w1").bitwiseAND(F.col("m1")) != 0)
                & (F.col("w2").bitwiseAND(F.col("m2")) != 0)
            )
            .select("l_suppkey", "l_extendedprice")
        )
        return agg(gated.join(supp, gated.l_suppkey == supp.s_suppkey))

    # the broadcast word-table joins must stay broadcast even with the
    # threshold off
    t_bloom = timed(bloom_gated)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    t_bcast = timed(
        lambda: agg(li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey))
    )

    n_li = li.count()
    n_pass = None
    print(
        f"rows={n_li} plain_shuffle={t_plain:.3f}s "
        f"bloom_gated={t_bloom:.3f}s broadcast_baseline={t_bcast:.3f}s"
    )


if __name__ == "__main__":
    main()
