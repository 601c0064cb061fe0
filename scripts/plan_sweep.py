#!/usr/bin/env python
"""Registry-wide physical-plan sweep: build every query's executedPlan
at sf0.001 and report scale-hazard operators — CartesianProduct,
BroadcastNestedLoopJoin, and single-partition Window specs (an empty
partitionBy in windowspecdefinition) — so the "no cartesian, no
unbounded window" claim is an auditable artifact instead of prose.

Known-bounded sites are allow-listed with the reason printed; anything
NOT allow-listed is a finding and exits non-zero. Streaming queries
execute their batch-equivalence plan like the driver does.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from louvain_modularity_spark.registry import all_queries  # noqa: E402
from louvain_modularity_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

#: (query, operator) -> reason it is bounded. Keyed per-SITE-CLASS so
#: an allowance for one operator can never excuse a different one in
#: the same plan (r7 ADVICE: the old name->tuple lookup plus a
#: global-count scalar gate could let a genuinely unbounded BNLJ ride
#: on a legitimate scalar crossJoin's allowance).
ALLOW = {
    # probe/scalar crossJoins: one side is a 1-row aggregate or a
    # bounded probe/centroid set, broadcast by construction
    ("q_fuzzy_join", "BroadcastNestedLoopJoin"): "probe side (p_partkey % 97, sf-proportional but broadcast-sized at every test scale) is the build side; corpus never shuffles. Output itself is quadratic (SCALE.md §8) — the NLJ is the declared semantics, not an accident",
    ("q_cross_small", "CartesianProduct"): "the operator's PURPOSE: 5x5 region pairs, both sides dimension tables",
    ("q_cross_small", "BroadcastNestedLoopJoin"): "same 5-row dimension pair, broadcast build side",
    ("q_join_theta_range", "BroadcastNestedLoopJoin"): "theta join against broadcast 7-row band table",
    ("q_grid_join", "BroadcastNestedLoopJoin"): "9-cell neighbor probe, cell table broadcast",
    ("q_histogram_2d", "BroadcastNestedLoopJoin"): "bin-edge scalars broadcast",
    ("q_equi_depth_hist", "BroadcastNestedLoopJoin"): "boundary scalars broadcast",
    ("q_ks_test", "BroadcastNestedLoopJoin"): "pooled-boundary scalars broadcast",
    # bounded-but-data-derived broadcast builds the generic rule can't
    # prove (it only proves literal ranges / global scalars): each is a
    # fixed-size sample, centroid, or bounded-domain table by design
    ("q_sim_topk", "BroadcastNestedLoopJoin"): "every-50th-vector query sample broadcast; brute-force baseline by design (q_ann_* are the scale path)",
    ("q_knn_label", "BroadcastNestedLoopJoin"): "every-50th-vector query sample broadcast (same baseline family as q_sim_topk)",
    ("q_label_noise", "BroadcastNestedLoopJoin"): "bounded audit-sample of vectors broadcast against the corpus",
    ("q_ann_ivf", "BroadcastNestedLoopJoin"): "K-centroid table broadcast (vectors x K centroid assignment)",
    ("q_ewma", "BroadcastNestedLoopJoin"): "day-domain kernel: theta self-join of the bounded per-day aggregate",
}

# windowspecdefinition with no partition columns: matches
# "windowspecdefinition(<order> ASC ..." directly (no leading col list
# before the first ordering spec). Bounded-domain sites are allowed.
UNPART_WINDOW_ALLOW = {
    "q_running_distinct": "day-domain running sum",
    "q_auc_rank": "per-distinct-score histogram walk",
    "q_mann_whitney": "value-domain histogram walk",
    "q_wilcoxon": "|d|-domain histogram walk",
    "q_quantile_normalize": "chunk-offset table (partition-count-sized)",
    "q_rfm": "chunk-offset table (partition-count-sized)",
    "q_gini": "chunk-offset table (partition-count-sized)",
    "q_pareto_abc": "chunk-offset table (partition-count-sized)",
    "q_seeded_order": "chunk-offset table (partition-count-sized)",
    "q_token_vocab": "chunk-offset table (partition-count-sized)",
    "q_ccnet_bucket": "chunk-offset table (partition-count-sized)",
    "q_spearman": "chunk-offset table (partition-count-sized)",
    "q_theilsen": "chunk-offset table (partition-count-sized)",
    "q_mad_outlier": "chunk-offset table (partition-count-sized)",
    "q_skew_stats": "chunk-offset table (partition-count-sized)",
    "q_robust_scale": "chunk-offset table (partition-count-sized)",
    "q_approx_quantile": "chunk-offset table (partition-count-sized)",
    "q_skyline": "distinct-price-domain staircase",
    "q_kaplan_meier": "duration-histogram walk",
    "q_weighted_median": "price-histogram walk (per returnflag)",
    "q_ewma": "day-domain kernel",
    "q_cusum": "day-domain walk",
    "q_rolling_median": "day-domain frame",
    "q_mom_yoy": "month-domain walk",
    "q_bollinger": "day-domain range frame",
    "q_seasonal_baseline": "day/weekday-domain tables",
    "q_equi_depth_hist": "boundary table (histogram-sized)",
    "q_benford": "9-digit domain",
    "q_ks_test": "pooled value-domain histogram walk",
    "q_dsir_weights": "bucket-domain tables",
    "q_bigram_lm": "vocab-domain walk",
    "q_incremental_agg": "day-domain rollup",
}


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _unwrap(node):
    """Skip codegen/adapter wrappers to the semantically relevant child."""
    while node.nodeName().startswith(("WholeStageCodegen", "InputAdapter")):
        kids = _children(node)
        if len(kids) != 1:
            break
        node = kids[0]
    return node


def _walk(node):
    """Yield every node, descending through the AQE leaf wrapper."""
    yield node
    if node.nodeName().startswith("AdaptiveSparkPlan"):
        try:
            yield from _walk(node.initialPlan())
        except Exception:
            pass
        return
    for c in _children(node):
        yield from _walk(c)


def _is_bounded_subtree(node):
    """Conservatively prove a broadcast build subtree has bounded
    cardinality REGARDLESS of data size: a global (keys=[]) aggregate
    is ≤1 row; Range/LocalTableScan/OneRowRelation are driver-literal
    sized; Project/Filter/Exchange never grow cardinality; a
    cross/nested-loop join or union of bounded inputs stays bounded.
    Anything touching a data-source (file scan, ExistingRDD) without a
    global aggregate above it is NOT provable here and must carry an
    explicit per-(query, op) ALLOW entry with its reason."""
    node = _unwrap(node)
    nm = node.nodeName()
    s = node.simpleString(10)
    if "Aggregate" in nm and "keys=[]" in s:
        return True
    if nm in ("Range", "LocalTableScan") or "OneRowRelation" in s:
        return True
    if nm in ("Project", "Filter", "BroadcastExchange", "Exchange", "Sort"):
        kids = _children(node)
        return len(kids) == 1 and _is_bounded_subtree(kids[0])
    if nm in ("BroadcastNestedLoopJoin", "CartesianProduct", "Union"):
        kids = _children(node)
        return bool(kids) and all(_is_bounded_subtree(k) for k in kids)
    return False


def _is_scalar_broadcast_bnlj(node):
    """True iff THIS BroadcastNestedLoopJoin site's own build side is
    an IdentityBroadcastMode exchange over a provably bounded subtree
    (global scalar aggregate, literal range, or compositions thereof)
    — the crossJoin(broadcast(scalar/step-table)) attach pattern,
    bounded by definition. Per-site matching (r7 ADVICE): a plan
    mixing one legitimate scalar crossJoin with an unbounded
    identity-broadcast BNLJ no longer passes on global counts."""
    s = node.simpleString(10)
    if " Inner" not in s and " Cross" not in s:
        return False
    kids = _children(node)
    if len(kids) != 2:
        return False
    build = _unwrap(kids[1] if "BuildRight" in s else kids[0])
    if build.nodeName() != "BroadcastExchange":
        return False
    if "IdentityBroadcastMode" not in build.simpleString(10):
        return False
    return _is_bounded_subtree(_children(build)[0])


def main() -> None:
    # optional name filter (r18, mutation-kill audit support): with
    # positional names, sweep only those plans — the detectors and
    # allow-lists are unchanged
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark("plan-sweep")
    findings: list[str] = []
    n = 0
    queries = all_queries()
    if only:
        unknown = sorted(set(only) - set(queries))
        assert not unknown, f"unknown query names: {unknown}"
        queries = {k: queries[k] for k in only}
    for name, fn in queries.items():
        try:
            root = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan()
            plan = root.toString()
        except Exception as exc:  # pragma: no cover - sweep robustness
            findings.append(f"{name}: PLAN BUILD FAILED: {type(exc).__name__}: {exc}")
            continue
        n += 1
        sites = {"CartesianProduct": [], "BroadcastNestedLoopJoin": []}
        for node in _walk(root):
            nm = node.nodeName()
            if nm in sites:
                sites[nm].append(node)
        for op, nodes in sites.items():
            for node in nodes:
                if (name, op) in ALLOW:
                    print(f"  allowed {name}: {op} — {ALLOW[(name, op)]}")
                elif op == "BroadcastNestedLoopJoin" and _is_scalar_broadcast_bnlj(node):
                    print(f"  allowed {name}: scalar broadcast crossJoin site")
                else:
                    findings.append(f"{name}: {op} in plan: {node.simpleString(10)[:90]}")
        for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
            body = spec[len("windowspecdefinition("):]
            first = body.split(",")[0].strip()
            if (" ASC" in first or " DESC" in first) and name not in UNPART_WINDOW_ALLOW:
                findings.append(f"{name}: unpartitioned window {spec[:90]}")
                break
    print(f"swept {n} query plans")
    if findings:
        print(f"{len(findings)} findings:")
        for f in findings:
            print(" ", f)
        sys.exit(1)
    print("0 findings — no unexplained cartesian/BNLJ/unpartitioned-window")


if __name__ == "__main__":
    main()
