#!/usr/bin/env python
"""Planted-truth stress for the r13 q_pq_ann oracle (_oracle_pq_ann).

The oracle's validity argument is DECISION-LEVEL (SURVEY §2.40): the
engine trains PQ codebooks in numpy, the oracle in DuckDB SQL, and
the two agree iff no argmin/rank decision sits inside float noise —
asserted on the shipped fixtures by
tests/test_llm_ops.py::test_pq_ann_oracle_margins. This script
re-measures that argument on embedding corpora the oracle has never
seen, generated to be ADVERSARIAL in exactly the two ways that could
break it:

  - mixture-16tight: a 16-component Gaussian mixture with tight
    clusters (sigma 0.05), so Lloyd snaps onto near-symmetric
    centroids and boundary points sit near-equidistant — the
    smallest-margin regime for the assignment argmins;
  - dup-heavy: an iid corpus where every 4th vector is an EXACT
    duplicate of its predecessor, forcing exact argmin/rank ties —
    the tie-breaking path (lowest codeword id / lowest vec_id) that
    both engines must take identically;
  - gaussian-iid: the generic control.

Each corpus is written in the exact embeddings schema (vec_id BIGINT,
embedding FLOAT[64], label INT) so the SHIPPED q_pq_ann and
_oracle_pq_ann run unmodified against the tmpdir. Asserts, per
corpus:

  - Spark result == DuckDB oracle result (full canonical row/value
    equality, the compare the driver's hash check implies);
  - the decision-margin audit passes: every argmin and top-k rank
    margin clears 1e-9 relative, or is an exact tie between
    bit-identical candidates.

Tightest observed margins are printed for the record.

Run: PYTHONPATH=/root/repo python scripts/stress_pq.py
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from louvain_modularity_spark.session import get_spark  # noqa: E402

DIM = 64
N_ROWS = 2_000


def write_embeddings(tmpdir: str, x: np.ndarray) -> str:
    """Write (vec_id, embedding FLOAT[], label) parquet in the shipped
    schema; returns the directory usable as sf_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(x)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in x],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 3 for i in range(n)], type=pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "embeddings.parquet"))
    return tmpdir


def corpora() -> list[tuple[str, np.ndarray]]:
    out = []
    rng = np.random.RandomState(7)
    out.append(("gaussian-iid", rng.randn(N_ROWS, DIM)))
    centers = rng.randn(16, DIM) * 2.0
    pick = rng.randint(0, 16, size=N_ROWS)
    out.append(
        ("mixture-16tight", centers[pick] + 0.05 * rng.randn(N_ROWS, DIM))
    )
    dup = rng.randn(N_ROWS, DIM)
    for i in range(3, N_ROWS, 4):
        dup[i] = dup[i - 1]
    out.append(("dup-heavy", dup))
    return out


def margin_audit(x: np.ndarray) -> float:
    """The test_pq_ann_oracle_margins math on an arbitrary corpus:
    returns the tightest nonzero relative margin; asserts every exact
    tie is between bit-identical candidates."""
    from louvain_modularity_spark.datasci import (
        PQ_K,
        PQ_M,
        PQ_QUERIES,
        PQ_TOPK,
        PQ_TRAIN_IDS,
    )

    sub = DIM // PQ_M
    ids = np.arange(len(x))
    worst = 1.0

    def min_margin(d2, cents):
        nonlocal worst
        order = np.argsort(d2, axis=1, kind="stable")
        best, second = order[:, 0], order[:, 1]
        rows = np.arange(len(d2))
        gaps = d2[rows, second] - d2[rows, best]
        rel = gaps / np.maximum(1.0, d2[rows, best])
        for i in np.nonzero(gaps == 0.0)[0]:
            assert np.array_equal(cents[best[i]], cents[second[i]]), (
                "exact argmin tie between DIFFERENT centroids"
            )
        nz = rel[gaps > 0.0]
        if len(nz):
            worst = min(worst, float(nz.min()))

    tr = x[ids < PQ_TRAIN_IDS]
    books = []
    for j in range(PQ_M):
        xs = tr[:, j * sub : (j + 1) * sub]
        c = xs[:PQ_K].copy()
        for _ in range(5):
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            min_margin(d2, c)
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
        min_margin(d2, books[j])
        codes[:, j] = d2.argmin(axis=1)
    for qi in range(PQ_QUERIES):
        qv = x[qi]
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
            assert np.array_equal(codes[lo], codes[hi]), (
                "est tie at the top-k boundary between different codes"
            )
        else:
            worst = min(worst, gap / max(1.0, est[lo]))
    return worst


def main() -> int:
    import duckdb

    from louvain_modularity_spark.datasci import _oracle_pq_ann, q_pq_ann
    from oracle_check import _canon

    spark = get_spark("stress_pq", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sql = _oracle_pq_ann()

    for name, x in corpora():
        x = np.ascontiguousarray(x, dtype=np.float64)
        # the engine reads FLOAT32 parquet; audit on the same widened
        # doubles the engines actually see
        x32 = x.astype(np.float32).astype(np.float64)
        worst = margin_audit(x32)
        assert worst > 1e-9, (
            f"{name}: tightest margin {worst:.3e} inside float noise"
        )
        with tempfile.TemporaryDirectory() as tmpdir:
            write_embeddings(tmpdir, x)
            sdf = q_pq_ann(spark, tmpdir)
            s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmpdir}/embeddings.parquet')"
            )
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            sc, sv = _canon(s_cols, s_rows)
            oc, ov = _canon(o_cols, o_rows)
            assert sc == oc, f"{name}: column drift {sc} vs {oc}"
            assert sv == ov, (
                f"{name}: Spark != oracle\n spark={sv}\n oracle={ov}"
            )
            print(
                f"{name}: OK — {len(sv)} rows equal, "
                f"tightest margin {worst:.3e}",
                flush=True,
            )
    print("stress_pq: ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
