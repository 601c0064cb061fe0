#!/usr/bin/env python
"""A/B the bracketing-order-statistic quantile kernels against the
builtin exact `percentile` aggregate they replaced.

The builtin's failure mode is structural, not a constant factor: its
partial aggregate keeps EVERY value of the slice in one growable
buffer, so both the map-side tasks and the final per-group task hold
O(N) entries. Measured on local[32] / 8g heap (the repo's default
session): run INSIDE a session holding prior cached state, the
grouped builtin arm GC-thrashed for minutes and then killed the JVM
with OutOfMemoryError in the aggregation buffer (BufferHolder.grow)
at BOTH 10M and 20M rows; in a FRESH single-purpose JVM it completes
but GC-bound at 38.6 s (10M) / 51.2 s (20M) vs the kernel's 6.7 /
18.1 s — the kernel's largest in-memory unit is one range chunk
(~N / shuffle-partitions rows) and the per-p work is two order
statistics. Because a builtin OOM takes the whole local JVM down,
the builtin big-N arm runs in a SUBPROCESS; the parent reports its
fate either way.

Protocol (SCALE.md §7): min-of-3 per timed arm; value equivalence is
pinned at N_VALID where both arms can run, on both the global and the
grouped form.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BIG = int(os.environ.get("STRESS_QUANTILE_N", 10_000_000))
N_VALID = int(os.environ.get("STRESS_QUANTILE_N_VALID", 2_000_000))
GROUPS = 5
PS = [(0.25, "p25"), (0.5, "p50"), (0.99, "p99")]


def _base(spark, n):
    import pyspark.sql.functions as F

    return (
        spark.range(n)
        .select(
            (F.xxhash64("id") % GROUPS).alias("g"),
            (F.xxhash64("id", F.lit(1)) % 1_000_003).cast("double").alias("v"),
        )
        .localCheckpoint(eager=True)
    )


def _builtin_group(base):
    import pyspark.sql.functions as F

    return base.groupBy("g").agg(
        *[F.expr(f"percentile(v, {p})").alias(n) for p, n in PS]
    )


def _time(df_fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        df_fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return best


def builtin_child() -> None:
    """Subprocess arm: grouped builtin percentile at N_BIG, one run."""
    from louvain_modularity_spark.session import get_spark

    spark = get_spark("stress-quantile-builtin")
    t = _time(lambda: _builtin_group(_base(spark, N_BIG)), runs=1)
    print(f"BUILTIN_OK {t:.2f}")


def main() -> None:
    from louvain_modularity_spark.kernels import (
        chunked_exact_quantiles,
        chunked_group_quantiles,
    )
    from louvain_modularity_spark.session import get_spark

    spark = get_spark("stress-quantile")

    # value equivalence at N_VALID (both arms feasible)
    vb = _base(spark, N_VALID)
    import pyspark.sql.functions as F

    bg = vb.agg(*[F.expr(f"percentile(v, {p})").alias(n) for p, n in PS]).collect()[0]
    kg = chunked_exact_quantiles(vb, "v", PS).collect()[0]
    for _, n in PS:
        assert abs(kg[n] - bg[n]) < 1e-9, (n, kg[n], bg[n])
    kgr = {r["g"]: r for r in chunked_group_quantiles(vb, ["g"], "v", PS).collect()}
    for r in _builtin_group(vb).collect():
        for _, n in PS:
            assert abs(kgr[r["g"]][n] - r[n]) < 1e-9, (r["g"], n)

    # kernel timings at N_BIG
    base = _base(spark, N_BIG)
    t_kg = _time(lambda: chunked_exact_quantiles(base, "v", PS))
    t_kgr = _time(lambda: chunked_group_quantiles(base, ["g"], "v", PS))
    chunk = N_BIG // int(spark.conf.get("spark.sql.shuffle.partitions"))

    # builtin grouped arm at N_BIG, isolated so an executor OOM cannot
    # take this process down with it
    env = dict(os.environ, STRESS_QUANTILE_ARM="builtin", STRESS_QUANTILE_N=str(N_BIG))
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        timeout=int(os.environ.get("STRESS_QUANTILE_TIMEOUT", 900)),
    )
    tagged = [l for l in proc.stdout.splitlines() if l.startswith("BUILTIN_OK")]
    if proc.returncode == 0 and tagged:
        builtin = f"builtin={float(tagged[0].split()[1]):.2f}s"
    else:
        err = "OutOfMemoryError" if "OutOfMemoryError" in proc.stderr else f"exit {proc.returncode}"
        builtin = f"builtin=FAILED ({err}, single {N_BIG // GROUPS}-row buffer/group)"

    print(
        f"N={N_BIG}  kernel: global={t_kg:.2f}s grouped={t_kgr:.2f}s "
        f"(max {chunk}-row chunk)  |  grouped {builtin}  |  "
        f"values equal at N={N_VALID}"
    )


if __name__ == "__main__":
    if os.environ.get("STRESS_QUANTILE_ARM") == "builtin":
        N_BIG = int(os.environ["STRESS_QUANTILE_N"])
        builtin_child()
    else:
        main()
