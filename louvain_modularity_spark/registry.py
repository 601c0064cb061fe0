"""Assembles the full query inventory declared in SURVEY.md §2.

Each operator module exposes ``QUERIES: dict[name, fn(spark, sf_dir)
-> DataFrame]`` and ``ORACLES: dict[name, duckdb_sql]`` (oracle absent
→ the driver runs its weaker rows-only check). This module merges
them; ``__spark_entry__.py`` re-exports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from . import (
        analytics,
        funcs,
        graph,
        llm_ops,
        louvain,
        metrics,
        multimodal,
        pipeline,
        relational,
        streaming,
        textprep,
        tpch,
    )

    return [
        louvain,
        metrics,
        llm_ops,
        multimodal,
        streaming,
        relational,
        funcs,
        graph,
        textprep,
        pipeline,
        analytics,
        tpch,
    ]


# Order matters: the correctness driver verifies the FIRST 50 entries of
# all_queries(). Cumulative state after r03: 128 driver-green; every
# oracle-backed query has passed a driver window EXCEPT the nine held in r03
# and q_gap_fill (the r03 failure, fixed this round). This round-4 window:
# q_gap_fill first (re-verify the ts-encoding fix), the nine held queries,
# the thirteen round-4 additions, then RE-verification of every r01/r02
# event-time green earned under the old LONG-nanos ts encoding (the harness
# now ships TIMESTAMP_MICROS; q_gap_fill proved encoding drift can break a
# formerly-green query), four rows-only queries that have never appeared in
# any window (the driver records no_oracle + spark_rows > 0 — evidence they
# execute under the driver's environment), and the remaining slots on the
# late-round-4 additions (first-time driver verification beats re-checking
# non-temporal r01 greens, which carry no encoding risk and are re-validated
# by the local suite every run). Held for the round-5 window, all local
# DuckDB-parity green at sf0.001+sf0.01: q_tpch_q9 q_tpch_q11 q_tpch_q16
# q_tpch_q20 q_lateral_topk q_fn_struct q_union_by_name
# q_read_merge_schema q_null_semantics, plus the oracle upgrades of the
# already-green q_write_edgelist and q_adjacency_pivot.
#
# Rows-only entries deliberately inside this window (all four never
# driver-windowed before): q_hll_sketch q_approx_topk q_pagerank q_kcore.
_WINDOW_ROWS_ONLY = [
    "q_hll_sketch",
    "q_approx_topk",
    "q_kcore",
]
_WINDOW_R04 = [
    # the round-3 failure, re-verified first
    "q_gap_fill",
    # the nine oracle-backed queries held out of the r03 window
    "q_fn_variant",
    "q_stats_agg",
    "q_filtered_agg",
    "q_string_agg",
    "q_window_ntile",
    "q_latest_per_key",
    "q_read_json",
    "q_read_orc",
    "q_read_text_log",
    # round-4 additions: TPC-H second batch
    "q_tpch_q1",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q12",
    "q_tpch_q14",
    "q_tpch_q19",
    # round-4 additions: event-time analytics
    "q_rolling_7d",
    "q_time_weighted_avg",
    # round-4 additions: text quality
    "q_entropy_tokens",
    "q_pmi_cooccur",
    "q_robust_scale",
    # round-4 additions: graph
    "q_harmonic_centrality",
    "q_bipartite_project",
    # event-time re-verification under the TIMESTAMP_MICROS encoding
    "q_fn_date",
    "q_fn_map",
    "q_fn_json",
    "q_join_asof",
    "q_join_theta_range",
    "q_window_laglead",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_stateful_count",
    "q_stream_static_join",
    "q_stream_stream_join",
    # upgraded from rows-only this round (unrolled-CTE oracle), never
    # yet inside a driver window
    "q_pagerank",
    # rows-only, never yet inside a driver window
    *_WINDOW_ROWS_ONLY,
    # late round-4 additions: TPC-H completion + pipeline ops
    "q_tpch_q2",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q13",
    "q_tpch_q15",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_semdedup",
    "q_write_shards",
    "q_read_csv",
]


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {mod.__name__}: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in _WINDOW_R04 if n not in merged]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    out: dict[str, QueryFn] = {n: merged[n] for n in _WINDOW_R04}
    out.update({n: fn for n, fn in merged.items() if n not in out})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
