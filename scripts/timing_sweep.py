"""Full-registry single-run timing sweep (per-round regression net).

Runs every registered query once against a scale dir, forced
end-to-end through the noop sink (bench.py's convention), and writes
one JSON blob {sf, total_sec, warmup_sec, queries: {name: sec|ERR}}.

Committed in r13 after three rounds of re-writing this loop ad hoc.
One lesson is baked in (SCALE §7, r13 sweep entry): the FIRST query
of a cold session reads ~2x its warm cost (scan + schema merge +
codegen warmup), which produced a spurious 1.97x flag on
q_butterfly_sampled the round the rotation moved it to the registry
head. The sweep therefore burns the cold tax on an explicit warmup
pass (a 1-row job plus one parquet scan per table family actually
used) BEFORE timing starts, and reports that warmup separately.
Totals are thus ~10-20 s lower than the r11/r12 prose readings,
which absorbed the tax inside their first entry — noted so
round-over-round diffs don't misread the one-time drop.

Usage:
    python scripts/timing_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from louvain_modularity_spark.registry import all_queries  # noqa: E402
from louvain_modularity_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/timing_sweep.json"

    spark = get_spark("timing_sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(1).write.format("noop").mode("overwrite").save()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf}/{t}.parquet").limit(1).write.format(
            "noop"
        ).mode("overwrite").save()
    warmup = round(time.time() - t0, 2)

    res: dict[str, object] = {}
    t_all = time.time()
    for name, fn in all_queries().items():
        t_q = time.time()
        try:
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            res[name] = round(time.time() - t_q, 3)
        except Exception as exc:  # noqa: BLE001
            res[name] = f"ERR: {exc}"[:200]
        print(f"{name}: {res[name]}", flush=True)
    total = round(time.time() - t_all, 1)
    json.dump(
        {"sf": sf, "total_sec": total, "warmup_sec": warmup, "queries": res},
        open(out, "w"),
    )
    errs = sum(1 for v in res.values() if isinstance(v, str))
    print(
        f"TOTAL {len(res)} queries in {total}s"
        f" (warmup {warmup}s, {errs} errors) -> {out}"
    )
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
