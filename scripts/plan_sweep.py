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

#: query -> (operator substring, reason it is bounded)
ALLOW = {
    # probe/scalar crossJoins: one side is a 1-row aggregate or a
    # bounded probe/centroid set, broadcast by construction
    "q_fuzzy_join": ("BroadcastNestedLoopJoin", "probe side is the broadcast 8-name set; corpus never shuffles"),
    "q_cross_small": ("CartesianProduct", "the operator's PURPOSE: 5x5 region pairs, both sides dimension tables"),
    "q_cross_small+": ("BroadcastNestedLoopJoin", "same 5-row dimension pair, broadcast build side"),
    "q_join_theta_range": ("BroadcastNestedLoopJoin", "theta join against broadcast 7-row band table"),
    "q_grid_join": ("BroadcastNestedLoopJoin", "9-cell neighbor probe, cell table broadcast"),
    "q_histogram_2d": ("BroadcastNestedLoopJoin", "bin-edge scalars broadcast"),
    "q_equi_depth_hist": ("BroadcastNestedLoopJoin", "boundary scalars broadcast"),
    "q_ks_test": ("BroadcastNestedLoopJoin", "pooled-boundary scalars broadcast"),
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


def main() -> None:
    spark = get_spark("plan-sweep")
    findings: list[str] = []
    n = 0
    for name, fn in all_queries().items():
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - sweep robustness
            findings.append(f"{name}: PLAN BUILD FAILED: {type(exc).__name__}: {exc}")
            continue
        n += 1
        for op in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if op in plan:
                allowed = next(
                    (
                        v
                        for k, v in ALLOW.items()
                        if (k == name or k.startswith(name + "+")) and v[0] == op
                    ),
                    None,
                )
                if allowed and allowed[0] == op:
                    print(f"  allowed {name}: {op} — {allowed[1]}")
                elif re.search(r"BroadcastNestedLoopJoin BuildRight, (Inner|Cross)", plan) and op == "BroadcastNestedLoopJoin" and plan.count("BroadcastNestedLoopJoin") == plan.count("BroadcastExchange IdentityBroadcastMode"):
                    # scalar crossJoin(broadcast(1-row agg)) pattern:
                    # every BNLJ's build side is an identity-broadcast
                    # (driver-collected) table — bounded by definition
                    print(f"  allowed {name}: scalar broadcast crossJoin(s)")
                else:
                    findings.append(f"{name}: {op} in plan")
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
