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


def test_parity_hash32_cross_engine_pin(spark):
    """The r10 oracle-upgrade batch (minhash/simhash/sample_hash)
    stands on parity_hash32 producing the SAME integer in Spark and
    DuckDB. Pin both engines against hardcoded known values so a
    version drift in either md5/conv/hex-cast path localizes here
    instead of surfacing as an opaque oracle hash mismatch."""
    import duckdb

    from louvain_modularity_spark.llm_ops import (
        PARITY_HASH32_SQL,
        parity_hash32,
    )

    # md5('hello') = 5d41402a... → 0x5d41402a = 1564557354
    want = {"hello": 1564557354, "": 3558706393, "a b c": 116422158}
    rows = (
        spark.createDataFrame([(s,) for s in want], "s string")
        .select("s", parity_hash32(F.col("s")).alias("h"))
        .collect()
    )
    assert {r["s"]: r["h"] for r in rows} == want
    for s, h in want.items():
        got = duckdb.sql(
            "SELECT " + PARITY_HASH32_SQL.format(c=f"'{s}'")
        ).fetchone()[0]
        assert got == h, (s, got, h)


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


def test_ngram_jaccard_hot_shingle_cap(spark):
    """One boilerplate shingle shared by n docs must NOT produce n²
    candidate pairs: shingles with df > max_df are dropped from the
    inverted index, while pairs sharing rare shingles survive."""
    from louvain_modularity_spark.llm_ops import ngram_jaccard_pairs

    n = 200
    rows = [(i, f"common boiler plate unique{i} token{i} tail{i}") for i in range(n)]
    rows += [(n, "alpha beta gamma delta common boiler plate"),
             (n + 1, "alpha beta gamma delta other words here")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(d, max_df=10).collect()
    # boilerplate-only pairs vanish; the rare-shingle pair survives
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(n, n + 1)}
    uncapped = ngram_jaccard_pairs(d, max_df=10**9)
    assert uncapped.count() > n * (n - 1) // 2


def test_minhash_bucket_cap_star_pairing(spark):
    """A giant duplicate cluster (identical docs → one LSH bucket) must
    emit O(s) star pairs, not s², and stay connected via the bucket
    representative."""
    from louvain_modularity_spark.llm_ops import dedup_minhash_pairs

    n = 150
    d = spark.createDataFrame(
        [(i, "exact same boilerplate page text repeated everywhere") for i in range(n)],
        "doc_id long, text string",
    )
    capped = dedup_minhash_pairs(d, max_bucket=100).collect()
    assert len(capped) == n - 1
    assert all(r["doc_a"] == 0 and r["est_jaccard"] == 1.0 for r in capped)
    assert dedup_minhash_pairs(d, max_bucket=10**9).count() == n * (n - 1) // 2


def test_dup_embedding_blocked_plan_and_margins(spark):
    """q_dup_embedding must stay a blocked hash-join GEMM (no cartesian
    operator) and the data must keep safe float margins: the nearest
    cosine to the 0.42 threshold and to a round-6 midpoint must sit far
    above f64 GEMM summation-order noise (~1e-13), so the numpy tile
    matches the oracle's sequential fold decision-for-decision."""
    import numpy as np

    from louvain_modularity_spark.llm_ops import q_dup_embedding

    df = q_dup_embedding(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    rows = df.collect()
    assert rows, "no near-dup pairs found"
    cosines = np.array([r["cosine"] for r in rows])
    assert np.abs(cosines - 0.42).min() > 1e-9
    # round-6 midpoint margin, checked pre-rounding via a raw recompute
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    for r in rows:
        a, b = emb[r["id_a"]], emb[r["id_b"]]
        cos = float(a @ b / np.sqrt((a @ a) * (b @ b)))
        frac = abs(cos * 1e6 - np.floor(cos * 1e6) - 0.5)
        assert frac * 1e-6 > 1e-13, (r, cos)
        assert round(cos, 6) == pytest.approx(r["cosine"], abs=1.1e-6)


def test_dup_embedding_adaptive_blocks_agree(spark, monkeypatch):
    """The tile grid must emit the identical pair set for ANY block
    count: forcing the data-adaptive branch (tiny DUP_EMB_BLOCK_VECS →
    NB well above the floor of 8) has to reproduce the default run
    row-for-row, the same both-branches pin as Borůvka's contraction."""
    from louvain_modularity_spark import llm_ops

    base = sorted(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in llm_ops.q_dup_embedding(spark, SF_DIR).collect()
    )
    monkeypatch.setattr(llm_ops, "DUP_EMB_BLOCK_VECS", 37)
    forced = sorted(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in llm_ops.q_dup_embedding(spark, SF_DIR).collect()
    )
    assert forced == base and base


def test_documents_fixture_is_ascii(spark):
    """The multimodal oracles equate byte-level payload ops with
    character-level SQL (ascii/substring/strlen), which is only sound
    for pure 7-bit ASCII text — assert the fixture honors that at the
    driver's scale too."""
    import os

    for sf in ("sf0.001", "sf0.01"):
        d = spark.read.parquet(os.path.join("/root/testdata", sf, "documents.parquet"))
        n_bad = d.filter(~F.col("text").rlike(r"^[\x00-\x7F]*$")).count()
        assert n_bad == 0, f"{sf}: {n_bad} non-ASCII documents break byte/char parity"


def test_multimodal_decode_is_stubbed():
    from louvain_modularity_spark.multimodal import decode_payload

    with pytest.raises(NotImplementedError):
        decode_payload("image")


def test_bpe_learn_matches_reference(spark):
    """Distributed BPE vs a pure-Python reference implementation of
    Sennrich-style merge learning on the same word-count table — the
    learned merge list (pairs, order, and weighted counts) must match
    exactly under the pinned (count DESC, left ASC, right ASC)
    tie-break."""
    from collections import Counter

    import duckdb

    from louvain_modularity_spark.textprep import BPE_MERGES, q_bpe_learn

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in q_bpe_learn(spark, SF_DIR).collect()
    ]

    wc = duckdb.sql(
        f"""
        SELECT token, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS token
          FROM read_parquet('{SF_DIR}/documents.parquet')
        ) WHERE token <> '' GROUP BY token
        """
    ).fetchall()
    vocab = {w: (list(w), c) for w, c in wc}
    want = []
    for rank in range(1, BPE_MERGES + 1):
        counts = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (l, r), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, l, r, l + r, n))
        for w, (syms, c) in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = (out, c)
    assert got == want


def test_pca_power_matches_numpy_golden(spark):
    """q_pca_power's distributed moment pipeline must agree with
    single-node numpy PCA (same sign convention) on every projection,
    and pc1's variance must dominate pc2's."""
    import numpy as np

    from louvain_modularity_spark.datasci import q_pca_power

    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in q_pca_power(spark, SF_DIR).collect()
    }
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [int(r["vec_id"]) for r in rows]
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    mu = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comps = []
    for k in range(2):
        v = evecs[:, order[k]]
        v = v * np.sign(v[int(np.argmax(np.abs(v)))])
        comps.append(v)
    want = (x - mu) @ np.stack(comps).T
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert abs(got[vid][0] - want[i, 0]) < 1e-5, vid
        assert abs(got[vid][1] - want[i, 1]) < 1e-5, vid
    assert evals[order[0]] >= evals[order[1]]


def test_pq_ann_recall_and_determinism(spark):
    """PQ ANN: recall@10 must beat the random-candidate baseline
    (10/500 = 0.02) by a wide margin for every query, be ≤ 1, and the
    whole pipeline must be deterministic across runs."""
    from louvain_modularity_spark.datasci import q_pq_ann

    r1 = sorted(
        (r["query_id"], r["recall_at_10"])
        for r in q_pq_ann(spark, SF_DIR).collect()
    )
    assert len(r1) == 5
    for qid, rec in r1:
        assert 0.2 <= rec <= 1.0, (qid, rec)
    r2 = sorted(
        (r["query_id"], r["recall_at_10"])
        for r in q_pq_ann(spark, SF_DIR).collect()
    )
    assert r1 == r2


def test_pq_ann_oracle_margins():
    """Decision-gap audit backing the r13 q_pq_ann oracle
    (_oracle_pq_ann): the engine trains codebooks in numpy while the
    oracle trains them in DuckDB SQL, so centroid LOW BITS may differ
    (pairwise vs sequential summation). The oracle is value-exact iff
    no argmin/rank decision sits inside that noise. This audit
    recomputes EVERY such decision at both oracle scales and asserts
    each margin clears 1e-9 (relative) — or is an exact tie between
    identical candidates, which both engines break the same way
    (lowest codeword id / lowest vec_id). No Spark session needed:
    the hazards live entirely in the numpy-vs-SQL training twin.

    Decisions audited per scale: 5 Lloyd iterations x |train| x M
    subspace assignments, |corpus| x M encode argmins, and per query
    the est top-10 rank boundary (10th vs 11th candidate)."""
    import duckdb
    import numpy as np

    from louvain_modularity_spark.datasci import (
        PQ_DIM,
        PQ_K,
        PQ_M,
        PQ_QUERIES,
        PQ_TOPK,
        PQ_TRAIN_IDS,
        _pq_codebooks,  # noqa: F401  (geometry contract lives there)
    )
    from conftest import SF01_DIR

    sub = PQ_DIM // PQ_M

    def min_margin(d2, cents):
        """Smallest (2nd-best − best) gap over rows; exact ties must
        be between bit-identical centroids."""
        order = np.argsort(d2, axis=1, kind="stable")
        best, second = order[:, 0], order[:, 1]
        gaps = d2[np.arange(len(d2)), second] - d2[np.arange(len(d2)), best]
        rel = gaps / np.maximum(1.0, d2[np.arange(len(d2)), best])
        tied = np.nonzero(gaps == 0.0)[0]
        for i in tied:
            assert np.array_equal(cents[best[i]], cents[second[i]]), (
                "exact argmin tie between DIFFERENT centroids"
            )
        nz = rel[gaps > 0.0]
        return float(nz.min()) if len(nz) else 1.0

    for sf_dir in (SF_DIR, SF01_DIR):
        rows = duckdb.sql(
            f"SELECT vec_id, embedding FROM"
            f" read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
        ids = np.array([r[0] for r in rows])
        x = np.array([r[1] for r in rows], dtype=np.float64)
        assert x.shape[1] == PQ_DIM, (
            f"fixture dim {x.shape[1]} != PQ_DIM {PQ_DIM}: "
            "_oracle_pq_ann's static SQL no longer matches the data"
        )
        tr = x[ids < PQ_TRAIN_IDS]
        worst = 1.0
        books = []
        for j in range(PQ_M):
            xs = tr[:, j * sub : (j + 1) * sub]
            c = xs[:PQ_K].copy()
            for _ in range(5):
                d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                worst = min(worst, min_margin(d2, c))
                a = d2.argmin(axis=1)
                for k in range(PQ_K):
                    mk = xs[a == k]
                    if len(mk):
                        c[k] = mk.mean(axis=0)
            books.append(c)
        codes = np.zeros((len(x), PQ_M), dtype=int)
        for j in range(PQ_M):
            xs = x[:, j * sub : (j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            worst = min(worst, min_margin(d2, books[j]))
            codes[:, j] = d2.argmin(axis=1)
        for qi in range(PQ_QUERIES):
            qv = x[ids == qi][0]
            lut = np.array(
                [
                    [
                        ((books[j][k] - qv[j * sub : (j + 1) * sub]) ** 2).sum()
                        for k in range(PQ_K)
                    ]
                    for j in range(PQ_M)
                ]
            )
            est = lut[np.arange(PQ_M)[None, :], codes].sum(axis=1)
            order = np.lexsort((ids, est))
            lo, hi = order[PQ_TOPK - 1], order[PQ_TOPK]
            gap = est[hi] - est[lo]
            if gap == 0.0:
                # identical code tuples → bit-equal est inside EACH
                # engine → the vec_id tiebreak decides identically
                assert np.array_equal(codes[lo], codes[hi]), (
                    "est tie at the top-k boundary between different codes"
                )
            else:
                worst = min(worst, gap / max(1.0, est[lo]))
        assert worst > 1e-9, (
            f"{sf_dir}: tightest decision margin {worst:.3e} is inside "
            "float noise — the numpy/SQL training twin may diverge"
        )


def test_bpe_encode_matches_python_golden(spark):
    """q_bpe_encode's top-20 subword stats must equal a pure-Python
    re-derivation: learn the same merges, apply them left-to-right
    non-overlapping, count weighted subwords, take top-20 by
    (count DESC, token ASC)."""
    from collections import Counter

    import duckdb

    from louvain_modularity_spark.textprep import BPE_MERGES, q_bpe_encode

    got = [(r["token"], r["n"]) for r in q_bpe_encode(spark, SF_DIR).collect()]

    wc = duckdb.sql(
        f"""
        SELECT token, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS token
          FROM read_parquet('{SF_DIR}/documents.parquet')
        ) WHERE token <> '' GROUP BY token
        """
    ).fetchall()
    vocab = {w: (list(w), c) for w, c in wc}
    for _ in range(BPE_MERGES):
        counts = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (l, r), _n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, (syms, c) in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = (out, c)
    sub = Counter()
    for syms, c in vocab.values():
        for s in syms:
            sub[s] += c
    want = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_one_hot_other_branch(spark):
    """r16 vacuity audit: every fixture segment belongs to the fixed
    one-hot domain, so seg_other is all-zero at every scale. A
    crafted out-of-domain segment pins the `other` bucket (the schema
    contract: a new upstream category lands in seg_other, it does not
    reshape the columns)."""
    from louvain_modularity_spark.datasci import ONE_HOT_SEGMENTS, one_hot_frame

    c = spark.createDataFrame(
        [(1, "AUTOMOBILE"), (2, "WEIRD_NEW_SEGMENT"), (3, "BUILDING")],
        "c_custkey long, c_mktsegment string",
    )
    rows = {r["c_custkey"]: r.asDict() for r in one_hot_frame(c).collect()}
    assert rows[2]["seg_other"] == 1
    assert sum(v for k, v in rows[2].items() if k.startswith("seg_") and k != "seg_other") == 0
    assert rows[1]["seg_automobile"] == 1 and rows[1]["seg_other"] == 0
    assert rows[3]["seg_building"] == 1 and rows[3]["seg_other"] == 0
    assert set(rows[1]) == {"c_custkey", "seg_other"} | {
        f"seg_{s.lower()}" for s in ONE_HOT_SEGMENTS
    }
