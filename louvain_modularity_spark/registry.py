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
        datasci,
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
        tsml,
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
        datasci,
        tsml,
    ]


# Order matters: the correctness driver verifies the FIRST 50 entries of
# all_queries(). Cumulative state after r04: 162 driver-green, 0 broken;
# the ONLY queries without a green driver row are the 12 oracle-backed
# ones below (held out of the r04 window, all local DuckDB-parity green at
# sf0.001+sf0.01) and q_betweenness_sampled (rows-only, never windowed).
# This round-5 window leads with those 13 first-timers — landing them
# makes every oracle-backed query in the registry driver-green and every
# registered query windowed at least once — then spends the remaining 37
# slots re-verifying the OLDEST r01 greens (the §2.7 relational core,
# §2.8 scalar-function families, the §2.1-2.5 graph scan/normalize/degree
# pack, and the §2.13 r01 additions) so no green row is more than two
# rounds stale. Round-4 greens are fresh and stay out.
#
# Held for the round-6 window (added this round, outside the pinned 50):
# the thirteen §2.18 round-5 additions — oracle-backed, local
# DuckDB-parity green at sf0.001+sf0.01: q_window_cume q_skyline
# q_running_distinct q_interval_overlap q_ccnet_bucket q_random_walk
# q_substring_dup q_mode_agg q_equi_depth_hist q_gaps_islands
# q_mad_outlier; rows-only with golden/invariant pytest: q_ktruss
# (networkx k_truss), q_graph_coloring (properness/determinism) —
# plus the twelve §2.19 second-batch additions — oracle-backed, local
# DuckDB-parity green at sf0.001+sf0.01: q_markov_transitions
# q_seasonal_baseline q_target_encode q_freq_pairs q_gopher_quality
# q_dsir_weights q_label_noise q_conductance q_partition_nmi
# q_reservoir_group q_zorder_layout q_incremental_agg q_cdc_apply
# q_hits q_expectations q_profile_columns q_skew_stats q_containment
# q_bigram_lm q_bloom_prefilter q_stream_metrics q_attribution q_fn_try
# q_train_split q_ab_ttest q_session_paths q_recursive_cte;
# rows-only with exact Python
# merge-list golden:
# q_bpe_learn;
# rows-only with networkx MSF golden: q_mst_boruvka;
# plus the seven §2.20 third-batch additions — oracle-backed, local
# DuckDB-parity green at sf0.001+sf0.01: q_count_min q_weighted_median
# q_auc_rank q_decayed_count q_sorted_neighborhood q_rfm
# q_diff_snapshot; rows-only with golden/invariant pytest: q_pca_power
# (numpy PCA golden), q_pq_ann (recall floor + determinism),
# q_leiden_refine (sub-partition/connectivity/Q-non-decrease);
# plus the five §2.21 fourth-batch additions — oracle-backed, local
# DuckDB-parity green at sf0.001+sf0.01: q_trend_fit q_theilsen
# q_autocorr q_benford q_temporal_graph, and the §2.22 fifth batch:
# q_crosstab_chi2 q_null_imputation q_one_hot q_histogram_2d
# (oracle-backed) + q_bpe_encode (rows-only, exact Python golden),
# and the §2.23 sixth batch (oracle-backed): q_neighbor_agg
# q_graph_drift q_bollinger, and the §2.24 seventh batch
# (oracle-backed): q_allocation q_survivorship q_pareto_abc q_gini
# q_stream_topk, and the §2.25 eighth batch (oracle-backed):
# q_kaplan_meier q_cohort_ltv q_assoc_rules, and the §2.26 ninth batch
# (oracle-backed): q_ewma q_cusum q_winsorize q_grid_join
# q_calibration q_ndcg q_topo_layers q_url_parse q_ks_test
# q_sketch_union q_nested_prune q_interval_merge q_bin_pack
# q_feature_hash q_geo_density q_rolling_median q_mom_yoy
# q_stream_join_outer q_cogroup_udf q_e2e_curation q_window_nth,
# and the §2.27 tenth batch (oracle-backed, one also networkx-golden):
# q_anova q_spearman q_mann_whitney q_wilcoxon q_quantile_normalize
# q_rich_club q_item_cf q_read_xml,
# and the §2.28 eleventh batch: q_butterfly (oracle-backed +
# enumeration golden) and q_dbscan (rows-only; from-scratch Python
# DBSCAN golden with identical deterministic tie rules),
# and the §2.29 twelfth batch (oracle-backed Spark 4 surfaces):
# q_sql_pipe q_collation q_arrow_batch,
# and the §2.30 thirteenth batch (oracle-backed): q_kmv_sketch
# q_ohlc_bars.
#
# Rows-only entries deliberately inside this window: q_betweenness_sampled
# (first window ever; estimator pinned by the rank-correlation pytest) and
# q_approx_cd (an r01 rows-only green re-verified on the same staleness
# rotation as its §2.7 neighbors).
_WINDOW_ROWS_ONLY = [
    "q_betweenness_sampled",
    "q_approx_cd",
]
_WINDOW_R05 = [
    # first-timers: the 12 oracle-backed queries still lacking a green
    # driver row (incl. the oracle upgrades of q_write_edgelist and
    # q_adjacency_pivot, green as rows-only in r01)
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_lateral_topk",
    "q_fn_struct",
    "q_union_by_name",
    "q_read_merge_schema",
    "q_null_semantics",
    "q_eccentricity",
    "q_write_edgelist",
    "q_adjacency_pivot",
    # first-timer, rows-only by contract
    "q_betweenness_sampled",
    # staleness rotation: §2.7 relational core (r01 greens)
    "q_scan_parquet",
    "q_filter_pred",
    "q_agg_groupby",
    "q_agg_distinct",
    "q_approx_cd",
    "q_grouping_sets",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_outer",
    "q_join_semi_anti",
    "q_cross_small",
    "q_window_rank",
    "q_window_frame",
    "q_sort_limit",
    "q_set_ops",
    "q_dedup_exact",
    # staleness rotation: §2.8 scalar-function families (r01 greens;
    # the date/map/json families are r04-fresh and stay out)
    "q_fn_string",
    "q_fn_math",
    "q_fn_cond",
    "q_fn_array",
    # staleness rotation: §2.1-2.5 graph scan/normalize/degree/coarsen
    "q_edges_from_relational",
    "q_read_edgelist",
    "q_edge_agg_parallel",
    "q_symmetrize",
    "q_selfloop_filter",
    "q_default_weight",
    "q_degree_weighted",
    "q_degree_inout",
    "q_graph_size_m",
    "q_coarsen_edges",
    "q_membership_rollup",
    # staleness rotation: §2.13 r01 additions
    "q_join_full_outer",
    "q_cube",
    "q_grouping_sets_explicit",
    "q_subquery_scalar",
    "q_pivot_status",
    "q_quantiles",
]


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {mod.__name__}: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in _WINDOW_R05 if n not in merged]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    out: dict[str, QueryFn] = {n: merged[n] for n in _WINDOW_R05}
    out.update({n: fn for n, fn in merged.items() if n not in out})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
