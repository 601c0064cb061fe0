"""Measure the accuracy knobs of the §2.20 sketch/ANN operators.

Two sweeps at sf0.1, both recorded in SCALE.md §4:

1. Count-Min width sweep (depth fixed at 4): mean/max relative
   overcount across ALL keys (not just the top-10 the query reports)
   for w ∈ {64, 256, 1024}. The published bound is E[over] ≤ e·N/w;
   this checks where the knee sits for a TPC-H-shaped key distribution
   so the default width is a measured choice, not a guess.

2. PQ subspace sweep (K=16 fixed): recall@10 averaged over the 5
   fixture queries for M ∈ {4, 8, 16} subspaces — i.e. 4/8/16 bytes
   per vector against 256 bytes of float32 — measuring what the 64×
   compression actually costs in candidate quality on this corpus.

Run: PYTHONPATH=/root/repo python scripts/stress_sketch.py
"""

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def cm_sweep(con) -> None:
    from louvain_modularity_spark.datasci import CM_A, CM_B, CM_PRIME

    a_sql = "[" + ",".join(str(a) for a in CM_A) + "]"
    b_sql = "[" + ",".join(str(b) for b in CM_B) + "]"
    print("== Count-Min width sweep (depth 4, lineitem part keys, sf0.1)")
    print("width | keys | mean_over_rel | max_over_rel | p99_over_abs")
    for width in (64, 256, 1024):
        q = f"""
        WITH kc AS (
          SELECT l_partkey AS k, count(*) AS cnt
          FROM read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY 1
        ),
        depths AS (SELECT unnest([1,2,3,4]) AS depth),
        counters AS (
          SELECT depth,
                 ((((k + 1) * ({a_sql})[depth] + ({b_sql})[depth])
                   % {CM_PRIME}) % {width}) AS slot,
                 CAST(SUM(cnt) AS BIGINT) AS c
          FROM kc CROSS JOIN depths GROUP BY 1, 2
        ),
        est AS (
          SELECT t.k, t.cnt, MIN(c.c) AS e
          FROM kc t CROSS JOIN depths d
          JOIN counters c
            ON c.depth = d.depth
           AND c.slot = ((((t.k + 1) * ({a_sql})[d.depth] + ({b_sql})[d.depth])
                          % {CM_PRIME}) % {width})
          GROUP BY 1, 2
        )
        SELECT count(*) AS keys,
               AVG((e - cnt) * 1.0 / cnt)            AS mean_rel,
               MAX((e - cnt) * 1.0 / cnt)            AS max_rel,
               quantile_cont(e - cnt, 0.99)          AS p99_abs
        FROM est
        """
        keys, mean_rel, max_rel, p99 = con.execute(q).fetchone()
        print(
            f"{width:5d} | {keys} | {mean_rel:13.4f} | {max_rel:12.4f} |"
            f" {p99:12.1f}"
        )


def pq_sweep(spark) -> None:
    from louvain_modularity_spark.datasci import q_pq_ann

    print("== PQ subspace sweep (K=16, recall@10 over 5 queries, sf0.1)")
    print("M | bytes/vec | mean_recall | wall_s")
    for m in (4, 8, 16):
        t0 = time.time()
        rows = q_pq_ann(spark, SF_DIR, m=m).collect()
        wall = time.time() - t0
        mean = sum(r["recall_at_10"] for r in rows) / len(rows)
        print(f"{m:2d} | {m:9d} | {mean:11.2f} | {wall:6.1f}")


def main() -> None:
    con = duckdb.connect()
    cm_sweep(con)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pq_sweep(spark)


if __name__ == "__main__":
    main()
