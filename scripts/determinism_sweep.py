#!/usr/bin/env python
"""Registry-wide determinism / partition-invariance audit.

A hash-green CORRECTNESS row proves Spark == DuckDB *at the driver's
partitioning*. This sweep makes the stronger distributed-correctness
claim auditable: every query's RESULT VALUES must be invariant to how
the engine happens to split the data — scan split size, shuffle
partition count, and Arrow batch boundaries. On a 1000-executor
cluster none of those knobs are under the query author's control, so a
partition-SENSITIVE result is a latent 100 TB correctness bug even
when the local fixture happens to hash green (classic culprits:
``first()`` without ordering, ``rand(seed)`` — whose stream is seeded
per-partition — ``monotonically_increasing_id``, per-batch state
inside a pandas UDF, float reduction order surfacing through an
unrounded output column).

Every registry query runs twice at sf0.001 (or --sf-dir):

  pass A: the session defaults (the same shape the driver uses), and
  pass B: perturbed  —  shuffle.partitions 32 -> 7 with AQE partition
          coalescing OFF (or tiny shuffles fold back to one partition
          in both passes), files.maxPartitionBytes -> 16 KB at zero
          openCostInBytes (real multi-split file scans — 256 KB left
          the 117 KB lineitem file at ONE split),
          leafNodeDefaultParallelism -> 3,
          arrow.maxRecordsPerBatch -> 64 (different pandas-UDF batch
          boundaries).
  The canary asserts each knob changes EXECUTED partition counts.

Results are canonicalized exactly like the local oracle check (column
order by name, row order by stringified values) and compared
cell-by-cell:

  - byte-identical            -> OK
  - equal after rounding floats to 6 significant digits -> ROUNDOFF
    (reported, not a failure: pure float reduction-order noise below
    any driver-hash-visible rounding)
  - anything else             -> FINDING; must be fixed or adjudicated
    in ALLOW below with the reason the variance is inherent to the
    operator's contract. Unadjudicated findings exit nonzero.

Usage: python scripts/determinism_sweep.py [--json out.json]
       [--sf-dir /root/testdata/sf0.01] [name ...]
Runtime: one local Spark session, 307 queries x 2 passes at sf0.001.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_check import _canon  # noqa: E402

from louvain_modularity_spark.registry import all_queries  # noqa: E402
from louvain_modularity_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

#: perturbed engine shape for pass B (session-level confs only, so one
#: JVM serves both passes; restored after every query so a failure
#: mid-sweep cannot leak the perturbation into pass A of the next one).
#: The knobs were VERIFIED to change real plan shapes at sf0.001, not
#: just assumed: 16 KB splits + zero open cost turn the one-file
#: lineitem scan into 8 tasks (256 KB left it at 1 — the file is
#: 117 KB and openCostInBytes pads each file to ~4 MB), and AQE
#: partition coalescing must be OFF or it folds both passes' tiny
#: shuffles back to ONE partition and the 7-vs-32 difference never
#: reaches execution. The canary asserts both facts every run.
PERTURB = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(16 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.leafNodeDefaultParallelism": "3",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
}

#: Adjudicated partition-SENSITIVE queries: name -> reason the
#: variance is inherent to the operator's documented contract (each
#: must also carry the caveat in its docstring). Only listed names may
#: stay flagged without failing the sweep.
ALLOW: dict[str, str] = {
    # (empty until the first sweep run surfaces candidates)
}

#: Adjudicated special-value emitters: name -> reason a NaN/Inf/-0.0
#: cell in that query's SPARK output is part of the documented
#: contract. Only listed names may emit special cells without failing
#: the sweep (r18, ADVICE item 1 — the net now GATES like the DuckDB
#: twin in vacuity_sweep instead of relying on a human reading the
#: summary). Zero emitters measured r17/r18.
SPECIAL_ALLOW: dict[str, str] = {
    # (empty — every registry output is special-value-free, SURVEY §2.54)
}


def _round_sig(v: float, sig: int = 6) -> float:
    if v == 0 or math.isnan(v) or math.isinf(v):
        return v
    return round(v, sig - 1 - int(math.floor(math.log10(abs(v)))))


def _round_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return _round_sig(v)
    if isinstance(v, (list, tuple)):
        return tuple(_round_cell(x) for x in v)
    return v


def _canon_pair(cols, rows, rounded: bool):
    if rounded:
        rows = [tuple(_round_cell(c) for c in r) for r in rows]
    return _canon(cols, rows)


def _run(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def _special_cells_in(v) -> int:
    """Recursive cell counter: floats anywhere inside list/tuple/Row
    (arrays, structs) and dict (maps) values are scanned, not just
    top-level scalars — the r17 ADVICE blind spot (a future
    array-output oracle must not bypass the net silently). The class-7
    audit measured zero composite output columns registry-wide, so
    today this recursion is exercised only by the crafted pins in
    tests/test_dialect.py."""
    if isinstance(v, float):
        return int(
            math.isnan(v)
            or math.isinf(v)
            or (v == 0.0 and math.copysign(1.0, v) < 0)
        )
    if isinstance(v, (list, tuple)):  # array columns and Row structs
        return sum(_special_cells_in(x) for x in v)
    if isinstance(v, dict):  # map columns (and DuckDB struct dicts)
        # keys AND values: a map<double,...> output would carry its
        # special values in the KEY position (r19, ADVICE item 1 —
        # the value-only scan was a real bypass)
        return sum(_special_cells_in(x) for kv in v.items() for x in kv)
    return 0


def count_special_cells(rows) -> int:
    """NaN / ±Inf / -0.0 cells in a collected result — the Spark-side
    twin of vacuity_sweep's DuckDB-side special_value_cell net (r17
    class-6, SURVEY §2.54). Kept as a named kernel so the crafted-row
    pin in tests/test_dialect.py can exercise every branch. Recurses
    into composite cells (r18, ADVICE item 3)."""
    return sum(_special_cells_in(v) for row in rows for v in row)


def _compare(a, b):
    """-> 'identical' | 'roundoff' | mismatch message."""
    (a_cols, a_rows), (b_cols, b_rows) = a, b
    if sorted(a_cols) != sorted(b_cols):
        return f"column mismatch A={sorted(a_cols)} B={sorted(b_cols)}"
    if len(a_rows) != len(b_rows):
        return f"row count mismatch A={len(a_rows)} B={len(b_rows)}"
    _, ca = _canon_pair(a_cols, a_rows, rounded=False)
    _, cb = _canon_pair(b_cols, b_rows, rounded=False)
    if ca == cb:
        return "identical"
    _, ra = _canon_pair(a_cols, a_rows, rounded=True)
    _, rb = _canon_pair(b_cols, b_rows, rounded=True)
    if ra == rb:
        return "roundoff"
    diffs = sum(1 for x, y in zip(ra, rb) if x != y)
    first = next((i, x, y) for i, (x, y) in enumerate(zip(ra, rb)) if x != y)
    return f"{diffs} differing rows after 6-sig-digit rounding; first at sorted row {first[0]}: A={first[1]} B={first[2]}"


def _self_check(spark, sf_dir: str = SF_DIR) -> None:
    """Canary: the perturbation must actually change the engine shape,
    and the comparator must catch a known partition-sensitive value —
    otherwise the whole sweep could pass vacuously. Runs against the
    CALLER's sf_dir (r11 ADVICE: the module-level default used to be
    hard-wired, so --sf-dir sweeps canaried the wrong fixture); the
    scan-split assertion is file-size-aware since a file at or under
    one perturbed split would trivially read one split both ways."""
    import os

    from pyspark.sql import functions as F

    # the perturbation must actually reach EXECUTED shapes for the
    # three lanes that matter — parquet scan splits, post-shuffle
    # partition count (AQE coalescing would mask it), and leaf
    # parallelism — or the whole sweep is comparing a shape to itself
    saved = {k: spark.conf.get(k, None) for k in PERTURB}
    li = f"{sf_dir}/lineitem.parquet"
    split_b = int(PERTURB["spark.sql.files.maxPartitionBytes"])
    assert os.path.getsize(li) >= 2 * split_b, (
        f"{li} too small ({os.path.getsize(li)} B) to exercise the "
        f"{split_b} B scan-split perturbation — canary would be vacuous"
    )
    scan_a = spark.read.parquet(li).rdd.getNumPartitions()
    agg_a = (
        spark.read.parquet(li).groupBy("l_orderkey").count().rdd.getNumPartitions()
    )
    leaf_a = spark.sql("SELECT id FROM range(100)").rdd.getNumPartitions()
    for k, v in PERTURB.items():
        spark.conf.set(k, v)
    scan_b = spark.read.parquet(li).rdd.getNumPartitions()
    agg_b = (
        spark.read.parquet(li).groupBy("l_orderkey").count().rdd.getNumPartitions()
    )
    leaf_b = spark.sql("SELECT id FROM range(100)").rdd.getNumPartitions()
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    assert scan_a != scan_b, f"scan split shape unchanged ({scan_a} == {scan_b})"
    assert agg_a != agg_b, f"post-shuffle shape unchanged ({agg_a} == {agg_b})"
    assert leaf_a != leaf_b, f"leaf plan shape unchanged ({leaf_a} == {leaf_b})"
    # monotonically_increasing_id encodes the partition id: the SAME
    # logical query over different input splits must be flagged
    sens_a = ([("r",)], [(r[0],) for r in spark.range(0, 64, 1, 2).select(F.monotonically_increasing_id().alias("r")).collect()])
    sens_b = ([("r",)], [(r[0],) for r in spark.range(0, 64, 1, 5).select(F.monotonically_increasing_id().alias("r")).collect()])
    assert _compare((["r"], sens_a[1]), (["r"], sens_b[1])) not in ("identical", "roundoff")
    # and pure roundoff must be classed as roundoff, not a finding
    assert _compare((["x"], [(0.1 + 0.2,)]), (["x"], [(0.3,)])) == "roundoff"


def sweep(spark, names=None, verbose: bool = True, sf_dir: str = SF_DIR) -> dict:
    """Run the audit over `names` (default: whole registry) on an
    existing session; returns the summary dict (see main)."""
    queries = all_queries()
    if not names:
        names = list(queries)
    _self_check(spark, sf_dir)
    base = {k: spark.conf.get(k, None) for k in PERTURB}

    results: dict[str, str] = {}
    findings: list[str] = []
    roundoff: list[str] = []
    special_values: dict[str, int] = {}
    t_start = time.time()
    for i, name in enumerate(names, 1):
        fn = queries[name]
        t0 = time.time()
        try:
            a = _run(spark, fn, sf_dir)
            # r17 class-6 standing net, SPARK side (the twin of
            # vacuity_sweep's DuckDB-side special_value_cell scan): a
            # NaN / Inf / -0.0 cell in a SPARK output crosses the
            # special-value dialect boundary (SURVEY §2.54) even when
            # the DuckDB side emits a clean zero. Hits land in
            # summary['special_value_cells'] and GATE in main() via
            # SPECIAL_ALLOW (exit 1 when unadjudicated) so a one-sided
            # -0.0 fails the sweep instead of hiding in the summary
            n_special = count_special_cells(a[1])
            if n_special:
                special_values[name] = n_special
            for k, v in PERTURB.items():
                spark.conf.set(k, v)
            try:
                b = _run(spark, fn, sf_dir)
            finally:
                for k, v in base.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
            verdict = _compare(a, b)
        except Exception as e:  # noqa: BLE001 — audit must report, not die
            verdict = f"ERROR {type(e).__name__}: {e}"
        results[name] = verdict
        tag = "ok"
        if verdict == "roundoff":
            roundoff.append(name)
            tag = "ROUNDOFF"
        elif verdict != "identical":
            if name in ALLOW:
                tag = f"allowed ({ALLOW[name]})"
            else:
                findings.append(name)
                tag = "FINDING"
        if verbose:
            print(f"[{i}/{len(names)}] {name}: {tag} [{time.time()-t0:.1f}s]", flush=True)
            if tag == "FINDING":
                print(f"    {verdict}", flush=True)

    stale_allow = sorted(set(ALLOW) - {n for n, v in results.items() if v not in ("identical", "roundoff")})
    # r19 (ADVICE item 2): mirror the staleness rule for the
    # special-value allow-list — an adjudicated emitter that stops
    # emitting must leave SPECIAL_ALLOW, or the list erodes silently
    stale_special = sorted(
        set(SPECIAL_ALLOW) - set(special_values)
    ) if len(results) == len(queries) else []
    return {
        "checked": len(results),
        "identical": sum(1 for v in results.values() if v == "identical"),
        "roundoff": sorted(roundoff),
        "allowed": sorted(n for n in ALLOW if n in results and results[n] not in ("identical", "roundoff")),
        "findings": {n: results[n] for n in findings},
        "special_value_cells": special_values,
        "stale_allow_entries": stale_allow if len(results) == len(queries) else [],
        "stale_special_allow_entries": stale_special,
        "wall_s": round(time.time() - t_start, 1),
        "results": results,
    }


# Lane B of the standing invariance protocol (SCALE §7, r15): the
# DRIVER-TAIL family — every query whose plan consumes a multi-row
# collect/toPandas in driver-side Python (the layout-sensitivity bug
# class the sf0.001 net provably missed in r14), plus the declared
# rows-only set. Run per round at the driver-compare scale:
#   python scripts/determinism_sweep.py --lane-b
# Re-derive when a new collect site lands:
#   grep -rn 'toPandas()\|\.collect()' louvain_modularity_spark/
# keeping multi-row consumers (scalar 1-row aggregates stay out).
LANE_B = [
    # declared rows-only (sequential driver tails / sketch receipts)
    "q_louvain_communities",
    "q_louvain_dendrogram",
    "q_louvain_directed",
    "q_louvain_distributed",
    "q_leiden_refine",
    "q_bpe_learn",
    "q_bpe_encode",
    "q_pca_power",
    "q_mst_boruvka",
    "q_approx_quantile",
    "q_hll_sketch",
    # SQL-green queries with multi-row driver collects
    "q_pq_ann",  # codebook training sample
    "q_kmeans",  # training-sample collect
    "q_dup_clusters",  # edge collect -> driver connected components
    "q_betweenness_sampled",  # source-id collect
    "q_dbscan",  # bounded union-find tail
    # synchronized-round twins of the louvain family
    "q_louvain_one_level",
    "q_label_propagation",
]


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = SF_DIR
    sf_dir_explicit = "--sf-dir" in argv
    if sf_dir_explicit:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    lane_b = "--lane-b" in argv
    if lane_b:
        argv.remove("--lane-b")
        # lane B defaults to the gate scale, but an EXPLICIT --sf-dir
        # wins even when its value equals the sf0.001 default (a
        # deliberate sf0.001 lane-b run must not be silently redirected)
        if not sf_dir_explicit:
            sf_dir = "/root/testdata/sf0.01"
    names = [a for a in argv if not a.startswith("--")]
    if lane_b:
        names = LANE_B + names
    spark = get_spark("determinism-sweep")
    summary = sweep(spark, names or None, sf_dir=sf_dir)
    results = summary.pop("results")
    findings = list(summary["findings"])
    stale_allow = summary["stale_allow_entries"]
    print(json.dumps({k: v for k, v in summary.items() if k != "findings"}, indent=2))
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "results": results}, f, indent=2, sort_keys=True)
    if findings:
        print(f"UNADJUDICATED FINDINGS ({len(findings)}):")
        for n in findings:
            print(f"  {n}: {results[n]}")
        return 1
    # r18 (ADVICE item 1): the Spark-side special-value net gates like
    # its DuckDB twin — an unadjudicated NaN/Inf/-0.0 cell fails the
    # sweep instead of relying on a human reading the summary dict.
    special = {
        n: c
        for n, c in summary["special_value_cells"].items()
        if n not in SPECIAL_ALLOW
    }
    if special:
        print(f"UNADJUDICATED SPECIAL-VALUE CELLS ({len(special)}):")
        for n, c in sorted(special.items()):
            print(f"  {n}: {c} NaN/Inf/-0.0 cells")
        return 1
    if stale_allow:
        print(f"STALE ALLOW ENTRIES (no longer variant): {stale_allow}")
        return 1
    stale_special = summary["stale_special_allow_entries"]
    if stale_special:
        print(
            "STALE SPECIAL_ALLOW ENTRIES (no longer emitting "
            f"special cells): {stale_special}"
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
