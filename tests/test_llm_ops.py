"""LLM-pipeline invariants not expressible as SQL oracles."""

import pyspark.sql.functions as F
import pytest
from conftest import SF_DIR

from louvain_modularity_spark.llm_ops import (
    q_dedup_minhash,
    q_ngram_jaccard,
    q_udf_pandas,
)


def test_udf_pandas_matches_builtin(spark):
    """Arrow pandas-UDF norm must agree with the builtin fold."""
    df = q_udf_pandas(spark, SF_DIR)
    max_diff = df.agg(F.max("diff")).collect()[0][0]
    assert max_diff is not None and max_diff < 1e-6


def test_minhash_estimates_track_exact_jaccard(spark):
    """For every minhash candidate pair, the estimate must be within
    0.35 of the exact n-gram Jaccard (16 perms → wide but bounded)."""
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in q_dedup_minhash(spark, SF_DIR).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q_ngram_jaccard(spark, SF_DIR).collect()
    }
    assert est, "minhash produced no candidate pairs"
    for pair, e in est.items():
        x = exact.get(pair, 0.0)
        assert abs(e - x) <= 0.35, f"{pair}: est={e} exact={x}"


def test_approx_count_distinct_envelope(spark):
    """HLL estimate within ±5% of exact (SURVEY.md §2.7 q_approx_cd)."""
    from louvain_modularity_spark.relational import q_approx_cd

    for r in q_approx_cd(spark, SF_DIR).collect():
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            2, 0.05 * r["exact_users"]
        ), r


def test_ann_recall(spark):
    """Both ANN paths must retrieve a usable share of the brute-force
    top-3 (random data is the worst case; real clustered corpora do
    far better)."""
    from louvain_modularity_spark.llm_ops import q_ann_ivf, q_ann_lsh, q_sim_topk

    top = {
        (r["query_id"], r["neighbor_id"])
        for r in q_sim_topk(spark, SF_DIR).collect()
        if r["rnk"] <= 3
    }
    for fn in (q_ann_ivf, q_ann_lsh):
        got = {(r["query_id"], r["neighbor_id"]) for r in fn(spark, SF_DIR).collect()}
        recall = len(top & got) / len(top)
        assert recall >= 0.3, f"{fn.__name__}: recall@3 = {recall:.2f}"


def test_multimodal_decode_is_stubbed():
    from louvain_modularity_spark.multimodal import decode_payload

    with pytest.raises(NotImplementedError):
        decode_payload("image")
