"""Measure the hub-salting benefit on a skewed power-law graph.

Verdict r2 item 7: the salting code path (louvain._w2c_from_sym,
salt_hubs=s) is bit-identity-tested but its benefit was unmeasured.
This script builds a ~1M-edge synthetic graph with a few extreme hubs
(the regime salting targets: deg(hub) >> E/partitions, so the w2c join
hashes one partition a straggler) and times one distributed Louvain
level with salt_hubs=0 vs salt_hubs=8, at two skew levels. Results are
recorded in SCALE.md §3.

Run STANDALONE (fresh python process): the spark.driver.memory builder
conf only takes effect when this process launches the JVM — calling
into an already-running session would silently keep its smaller heap.

Run: PYTHONPATH=/root/repo python scripts/stress_salt.py
"""

import time

import numpy as np
from pyspark.sql import SparkSession

from louvain_modularity_spark.louvain import _one_level

N_NODES = 100_000
SEED = 7


def build_edges(spark, n_background, n_hub_edges, n_hubs):
    rng = np.random.default_rng(SEED)
    # background: uniform random pairs (connected-ish community noise)
    src_bg = rng.integers(0, N_NODES, n_background)
    dst_bg = rng.integers(0, N_NODES, n_background)
    # hubs: n_hubs nodes receive n_hub_edges/n_hubs edges each
    src_hub = rng.integers(0, N_NODES, n_hub_edges)
    dst_hub = rng.integers(0, n_hubs, n_hub_edges)
    src = np.concatenate([src_bg, src_hub])
    dst = np.concatenate([dst_bg, dst_hub])
    keep = src != dst
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "src": src[keep].astype("int64"),
            "dst": dst[keep].astype("int64"),
            "weight": np.ones(int(keep.sum())),
        }
    )
    df = (
        spark.createDataFrame(pdf)
        .groupBy("src", "dst")
        .agg({"weight": "sum"})
        .withColumnRenamed("sum(weight)", "weight")
        .repartition(32)
        .persist()
    )
    df.count()
    return df


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stress_salt")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    scenarios = {
        "moderate (4 hubs x ~53k deg)": (700_000, 300_000, 4),
        "extreme (1 hub x ~500k deg)": (500_000, 500_000, 1),
    }
    for label, (n_bg, n_hub, n_hubs) in scenarios.items():
        edges = build_edges(spark, n_bg, n_hub, n_hubs)
        n_edges = edges.count()
        hub_deg = (
            edges.groupBy("dst")
            .count()
            .orderBy("count", ascending=False)
            .limit(3)
            .collect()
        )
        print(f"{label}: edges={n_edges}, top deg={[r['count'] for r in hub_deg]}")
        results = {}
        for salt in (0, 8):
            t0 = time.monotonic()
            assign, moves = _one_level(
                spark,
                edges,
                gamma=1.0,
                seed=2,
                max_sweeps=3,
                salt_hubs=salt,
                hub_min_neighbors=10_000,
            )
            n = assign.count()
            dt = time.monotonic() - t0
            results[salt] = dt
            print(
                f"  salt_hubs={salt}: one_level(3 sweeps) {dt:.2f}s,"
                f" {n} nodes, {moves} moves"
            )
            assign.unpersist()
        edges.unpersist()
        print(
            f"RESULT[{label}]: unsalted={results[0]:.2f}s salted8={results[8]:.2f}s "
            f"delta={100 * (results[0] - results[8]) / results[0]:+.1f}%"
        )
    spark.stop()


if __name__ == "__main__":
    main()
