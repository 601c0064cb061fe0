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
# all_queries(). Rounds 1+2 produced green rows for the relational/funcs/
# graph-source packs and the louvain/metrics/llm_ops/multimodal/streaming
# packs. This round-3 window is pinned as an explicit name list so that
# queries added later in the round cannot displace the verification targets:
# q_doc_fingerprint first (re-verifies the round-2 HUGEINT-oracle fix), then
# the 49 oracle-backed queries that have never been inside a driver window
# (tpch, analytics, pipeline, textprep, and the round-2 graph algorithms —
# including q_sessionize / q_pack_sequences, which carry the same HUGEINT
# cast fix). Nine structurally-simple never-checked queries (plain agg /
# reader / window shapes identical to already-green ones) are held for the
# round-4 window: q_fn_variant q_stats_agg q_filtered_agg q_string_agg
# q_window_ntile q_latest_per_key q_read_json q_read_orc q_read_text_log.
_WINDOW_R03 = [
    "q_doc_fingerprint",
    # tpch pack
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q10",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_unpivot_metrics",
    # pipeline pack
    "q_dup_clusters",
    "q_pack_sequences",
    "q_contamination",
    "q_repetition_ratio",
    "q_kmeans",
    "q_udtf_tokens",
    # textprep pack
    "q_chunk_sliding",
    "q_ngram_counts",
    "q_token_vocab",
    "q_stopword_remove",
    "q_sessionize",
    "q_length_filter",
    "q_pii_scrub",
    "q_embedding_normalize",
    "q_embedding_centroid",
    "q_write_partitioned",
    # graph algorithms (rounds 1-2 additions)
    "q_triangle_count",
    "q_jaccard_nodes",
    "q_bfs_hops",
    "q_scc",
    "q_closeness",
    "q_betweenness",
    "q_eigenvector",
    "q_clustering_coeff",
    "q_adamic_adar",
    "q_degree_dist",
    "q_assortativity",
    "q_sssp_weighted",
    "q_personalized_pagerank",
    # analytics pack
    "q_rollup_time",
    "q_salted_join",
    "q_bm25",
    "q_unigram_surprise",
    "q_zscore_outlier",
    "q_funnel",
    "q_retention_cohort",
    "q_scd2_intervals",
    # relational round-2 additions
    "q_merge_upsert",
    "q_join_bucketed",
    "q_fuzzy_join",
    "q_gap_fill",
    # streaming sinks
    "q_stream_file_sink",
    "q_stream_foreach_batch",
]


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {mod.__name__}: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in _WINDOW_R03 if n not in merged]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    out: dict[str, QueryFn] = {n: merged[n] for n in _WINDOW_R03}
    out.update({n: fn for n, fn in merged.items() if n not in out})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
