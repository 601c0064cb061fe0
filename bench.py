#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Baseline anchors (BASELINE.md §2, same machine, sf0.1):
  TPC-H Q1-style agg (DuckDB)            0.158 s  → q_agg_groupby
  6-table join-agg (DuckDB)              0.212 s  → q_join_broadcast
  co-purchase edge extraction (DuckDB)   0.752 s  → q_edges_from_relational
  networkx Louvain on that graph        19.25  s  → q_louvain_communities

Timing excludes session startup (consistent with how the baselines
exclude import time); each query is forced end-to-end with a noop sink
so nothing is skipped by count-only pruning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: the set benched in rounds 1-2 — kept intact so round-over-round
#: totals stay comparable; reported separately as shared_r02_total_sec
SHARED_R02 = [
    "q_agg_groupby",
    "q_join_broadcast",
    "q_window_rank",
    "q_edges_from_relational",
    "q_degree_weighted",
    "q_modularity",
    "q_louvain_communities",
    "q_louvain_distributed",
    "q_text_tokens",
    "q_tfidf",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_stream_tumbling",
]

#: round-3 additions: one headline per previously-untimed pack
#: (tpch, pipeline/dedup end-to-end, graph centrality); round 4 switches
#: the centrality headline from exact-on-34-node-fixture q_betweenness
#: (which timed job-launch overhead) to the sampled-source estimator on
#: the ~16k-vertex co-purchase graph — the plan a 100 TB run executes —
#: and adds the TPC-H Q1 full-scan aggregate
#: round 5 adds the two shapes most likely to misbehave at 100×
#: (VERDICT r4 item 3): the broadcast-tier TPC-H snowflake (Q8, 8-table
#: two-level dimension tree) and the embedding-space semantic-dedup
#: stage (centroid assignment + within-cluster self-join)
#: the §2.20 addition q_pca_power times the one remaining untimed
#: execution class: an Arrow mapInPandas moment pass over the corpus
#: followed by a broadcast-literal projection scan
#: the §2.26 additions time the two new execution shapes: the grid-cell
#: spatial equi-join (9-cell probe; measured 13.7× over brute at 150k
#: points, SCALE.md §2) and the fine-grained-key interval-merge window
#: (millions of small (user,type) window partitions + island rollup);
#: q_e2e_curation times the composed gate→dedup→pack→manifest pipeline
#: as one plan — the end-to-end number users actually experience
#: round 6 adds the three round-5 shapes most likely to misbehave at
#: 100× (VERDICT r5 item 4): the verbatim-substring dedup rung (df-gated
#: shingle-bucket inverted-index join — the 100 TB-critical dedup shape),
#: the market-basket pair join (per-order item pairs → support/lift),
#: and Borůvka MSF (the synchronized-round component-merge family whose
#: local round latency SCALE.md §3 measured out-of-band)
HEADLINE = SHARED_R02 + [
    "q_tpch_q3",
    "q_tpch_q1",
    "q_tpch_q8",
    "q_dup_clusters",
    "q_semdedup",
    "q_pmi_cooccur",
    "q_betweenness_sampled",
    "q_pca_power",
    "q_grid_join",
    "q_interval_merge",
    "q_e2e_curation",
    "q_substring_dup",
    "q_assoc_rules",
    "q_mst_boruvka",
    # round 7 adds the last two expensive synchronized-round shapes that
    # were measured only in SCALE.md prose (VERDICT r6 item 4): HITS
    # (dual hub/authority power iteration with per-round normalization
    # scalars) and grid-DBSCAN (cell-bucketed neighbor counting + CC
    # merge over core cells)
    "q_hits",
    "q_dbscan",
    # late-r7 add: the heaviest user of the bracketing-order-statistic
    # quantile kernels (median of ~2.9M pairwise slopes over the
    # chunked rank) — tracks the kernel family per-round now that every
    # exact percentile in the registry runs on it
    "q_theilsen",
]

#: noisiest entries under this VM's CPU-steal (±30% swings on unchanged
#: code, SCALE.md §7): widen to min-of-3 so round-over-round deltas
#: track code, not the hypervisor. q_louvain_distributed joined in r7:
#: its Python-tail-heavy rounds measured 19.8 and 23.3 s on the SAME
#: boot with identical code, and the flagship q_louvain_communities
#: (the number judged against the 19.25 s baseline) measured 8.3 and
#: 14.4 s the same way — the Arrow/Python sequential tail is the most
#: steal-sensitive code in the repo
MIN_OF_3 = {
    "q_stream_tumbling",
    "q_dedup_minhash",
    "q_louvain_distributed",
    "q_louvain_communities",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    from louvain_modularity_spark.registry import all_queries
    from louvain_modularity_spark.session import get_spark

    spark = get_spark("bench")
    queries = all_queries()

    # warm the JVM (codegen, shuffle machinery, parquet reader) on the
    # smallest sf — excluded from timings, consistent with BASELINE.md
    # excluding import/startup time
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        queries["q_agg_groupby"](spark, warm_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        queries["q_join_broadcast"](spark, warm_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    else:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # measured per-job floor: the cost of scheduling ONE no-op Spark job
    # on this box (driver round-trip + task launch + noop sink), so the
    # relational-micro gap vs single-process DuckDB decomposes into
    # floor vs plan (SCALE.md §7). min-of-5 of an empty-plan write.
    floor = float("inf")
    for _ in range(5):
        t0 = time.time()
        spark.range(1).write.mode("overwrite").format("noop").save()
        floor = min(floor, time.time() - t0)
    job_floor_sec = round(floor, 3)
    # ... and of one full shuffle STAGE pair at the session's partition
    # count: tiny-data queries pay this per exchange, which is the real
    # unit the relational-micro gap decomposes into (a micro query is
    # 2-4 exchanges; DuckDB's morsel scheduler has no analogous cost)
    sfloor = float("inf")
    for _ in range(5):
        t0 = time.time()
        spark.range(1000).repartition("id").write.mode("overwrite").format(
            "noop"
        ).save()
        sfloor = min(sfloor, time.time() - t0)
    shuffle_floor_sec = round(sfloor, 3)
    print(
        f"  job_floor: {job_floor_sec:.3f}s  shuffle_floor: {shuffle_floor_sec:.3f}s",
        file=sys.stderr,
        flush=True,
    )

    # opt-in full-registry sweep (SPARK_GRAFT_BENCH_ALL=1): single-run
    # timings for EVERY registered query at the chosen sf — the
    # coverage mode for finding regressions outside the headline set;
    # the default headline protocol (min-of-2/3, shared_r02 subset)
    # is unchanged and remains the driver-comparable number
    bench_all = os.environ.get("SPARK_GRAFT_BENCH_ALL") == "1"
    names = list(queries) if bench_all else HEADLINE

    # sweep mode burns the per-table cold tax (first parquet scan +
    # schema merge) BEFORE timing starts: the r13 sweep showed the
    # first query of a cold session reads ~2x its warm cost, which
    # produced a spurious 1.97x flag on whatever the window rotation
    # put at the registry head (SCALE §7). Headline mode is untouched
    # for round-over-round comparability.
    if bench_all:
        t0 = time.time()
        for t in ("lineitem", "orders", "events", "documents", "embeddings"):
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).limit(
                1
            ).write.mode("overwrite").format("noop").save()
        print(
            f"  sweep_warmup: {time.time() - t0:.2f}s",
            file=sys.stderr,
            flush=True,
        )

    # min of 2 runs per query: this box is a shared VM with spiky CPU
    # steal (identical code measured 54 s and 241 s an hour apart); the
    # min absorbs steal spikes and per-query codegen compile — the
    # engine's actual cost, not the hypervisor's mood
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        best = float("inf")
        for _ in range(1 if bench_all else (3 if name in MIN_OF_3 else 2)):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    # boot-class anchors (SCALE.md §7, r14): round-over-round
    # adjudication needs BOTH dimensions of this VM's boot lottery —
    # the scheduler floors above (job launch / shuffle-stage cost) AND
    # single-core execution speed, which floor-matched boots can still
    # differ on by ±15% for hybrid-tail queries. The two speed anchors
    # are fixed stable-code headline entries: q_join_broadcast (pure
    # JVM micro — codegen + broadcast build, no Python) and
    # q_pca_power (Arrow mapInPandas moment pass — the Python/Arrow
    # tail). Read a round's numbers against a prior round by matching
    # all four anchors first; a mover whose anchors moved with it is
    # the boot, not the code.
    anchors = {
        "job_floor_sec": job_floor_sec,
        "shuffle_floor_sec": shuffle_floor_sec,
        "jvm_micro_sec": timings.get("q_join_broadcast"),
        "python_tail_sec": timings.get("q_pca_power"),
    }
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "shared_r02_total_sec": round(
                    sum(timings[n] for n in SHARED_R02), 3
                ),
                "job_floor_sec": job_floor_sec,
                "shuffle_floor_sec": shuffle_floor_sec,
                "anchors": anchors,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
