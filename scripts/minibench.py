#!/usr/bin/env python
"""Bench-protocol timing for a SUBSET of queries (r19 optimization).

Same methodology as bench.py — noop sink, min-of-2 (min-of-3 for the
MIN_OF_3 names), warmup queries at sf0.001 first, one fresh session —
so a subset reading is comparable to the corresponding bench.py
entries without paying for the whole headline set.

Usage: python scripts/minibench.py q_hits q_dbscan ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import MIN_OF_3

    from louvain_modularity_spark.registry import all_queries
    from louvain_modularity_spark.session import get_spark

    spark = get_spark("minibench")
    queries = all_queries()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for wq in ("q_agg_groupby", "q_join_broadcast"):
            queries[wq](spark, warm_dir).write.mode("overwrite").format("noop").save()

    timings = {}
    for name in names:
        fn = queries[name]
        best = float("inf")
        for _ in range(3 if name in MIN_OF_3 else 2):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", file=sys.stderr, flush=True)
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
