#!/usr/bin/env python
"""Planted-duplicate stress for the flagship MinHash-LSH dedup
(dedup_minhash_pairs, llm_ops.py): the fixture corpora never exceed
``max_bucket``, so the hot-bucket STAR path and the measured recall of
the 16-perm / 4-band sketch rest on synthetic evidence — this script
IS that evidence, at two corpus sizes a fixture can't reach.

Corpus (all JVM-side expressions, seeded, partition-invariant):
  - N base docs of 60 tokens drawn from a 5,000-token vocab via
    xxhash64(doc_id, position) — random docs share tokens but
    essentially never share a 3-token shingle;
  - one planted near-duplicate per base doc with doc_id % 37 == 0:
    the copy (doc_id + 10M) replaces the final token, changing 3 of
    ~58 shingles → true Jaccard ≈ 0.90, per-band hit prob J⁴ ≈ 0.66,
    expected LSH recall 1-(1-J⁴)⁴ ≈ 0.986;
  - one 5,000-copy boilerplate cluster (ids ≥ 20M) — every copy lands
    in the SAME 4 buckets, 50× over max_bucket, so the star path must
    fire: O(s) pairs to the min-id representative instead of C(s,2).

Asserts (hard):
  - planted-pair recall ≥ 0.95 (vs the ≈0.986 analytic expectation);
  - every recalled planted pair estimates Jaccard ≥ 0.5 (16-perm
    estimate of a 0.90 true Jaccard should not fall below half);
  - the cluster yields EXACTLY s-1 pairs, all anchored at the min-id
    rep with est_jaccard = 1.0 — the star cap's contract (connected,
    linear, no quadratic blowup);
  - false-positive pairs among unrelated base docs < 0.1% of N.

Timings are printed for the SCALE.md §4 record (per-doc cost at 100k
vs 400k docs shows the banded join scales ~linearly); correctness is
asserted, wall-clock is recorded-not-asserted per the §7 noise
protocol.

Run: PYTHONPATH=/root/repo python scripts/stress_minhash.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from louvain_modularity_spark.llm_ops import dedup_minhash_pairs  # noqa: E402
from louvain_modularity_spark.session import get_spark  # noqa: E402

DUP_OFFSET = 10_000_000
CLUSTER_BASE = 20_000_000
CLUSTER_SIZE = 5_000
VOCAB = 5_000
DOC_LEN = 60


def build_corpus(spark, n_docs: int):
    """(doc_id, text) with planted near-dups and one hot cluster."""
    tok = f"concat('t', pmod(xxhash64(id, i), {VOCAB}))"
    text = f"concat_ws(' ', transform(sequence(0, {DOC_LEN - 1}), i -> {tok}))"
    base = spark.range(n_docs).selectExpr("id AS doc_id", f"{text} AS text")
    # near-dup: same prefix, last token replaced — true J ≈ 55/61
    dup_src = spark.range(n_docs).filter(F.col("id") % 37 == 0)
    dup_text = (
        f"concat_ws(' ', transform(sequence(0, {DOC_LEN - 2}), i -> {tok}), "
        "array('zzz'))"
    )
    dups = dup_src.selectExpr(f"id + {DUP_OFFSET} AS doc_id", f"{dup_text} AS text")
    boiler = " ".join(f"c{i}" for i in range(DOC_LEN))
    cluster = spark.range(CLUSTER_SIZE).selectExpr(
        f"id + {CLUSTER_BASE} AS doc_id", f"'{boiler}' AS text"
    )
    return base.unionByName(dups).unionByName(cluster)


def run_at(spark, n_docs: int) -> None:
    docs = build_corpus(spark, n_docs)
    n_planted = len(range(0, n_docs, 37))
    t0 = time.time()
    pairs = dedup_minhash_pairs(docs, max_bucket=100).collect()
    wall = time.time() - t0
    total_docs = n_docs + n_planted + CLUSTER_SIZE

    planted_found = {
        (pa, pb): j
        for pa, pb, j in ((r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in pairs)
        if pb == pa + DUP_OFFSET and pa < n_docs
    }
    recall = len(planted_found) / n_planted
    cluster_pairs = [
        r
        for r in pairs
        if r["doc_a"] >= CLUSTER_BASE and r["doc_b"] >= CLUSTER_BASE
    ]
    fp = [
        r
        for r in pairs
        if r["doc_a"] < n_docs
        and r["doc_b"] < n_docs
        and r["doc_b"] != r["doc_a"] + DUP_OFFSET
    ]
    print(
        f"N={n_docs}: {total_docs} docs, {len(pairs)} pairs in {wall:.1f}s "
        f"({wall / total_docs * 1e6:.1f} us/doc) | planted recall "
        f"{len(planted_found)}/{n_planted} = {recall:.4f} | cluster pairs "
        f"{len(cluster_pairs)} | base-base false positives {len(fp)}",
        flush=True,
    )

    assert recall >= 0.95, f"LSH recall {recall:.4f} < 0.95 (analytic ~0.986)"
    assert all(j >= 0.5 for j in planted_found.values()), (
        "a recalled planted pair estimated Jaccard < 0.5: "
        f"{min(planted_found.values()):.3f}"
    )
    # star-path contract: exactly s-1 pairs, all (rep, member), J=1
    assert len(cluster_pairs) == CLUSTER_SIZE - 1, (
        f"cluster emitted {len(cluster_pairs)} pairs, want {CLUSTER_SIZE - 1} "
        "(star cap must replace the quadratic in-bucket join)"
    )
    assert all(r["doc_a"] == CLUSTER_BASE for r in cluster_pairs), (
        "star pairs must anchor at the bucket's min doc_id"
    )
    assert all(r["est_jaccard"] == 1.0 for r in cluster_pairs)
    members = {r["doc_b"] for r in cluster_pairs}
    assert members == set(range(CLUSTER_BASE + 1, CLUSTER_BASE + CLUSTER_SIZE)), (
        "star pairs must keep every cluster member connected to the rep"
    )
    assert len(fp) < n_docs * 0.001, f"{len(fp)} false-positive base pairs"


def main() -> int:
    spark = get_spark("stress-minhash")
    for n in (100_000, 400_000):
        run_at(spark, n)
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
