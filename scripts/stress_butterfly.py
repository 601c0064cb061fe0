#!/usr/bin/env python
"""Planted-truth stress for q_butterfly_sampled (the r12 Doulion twin).

The fixture A/B that chose edge sparsification over center sampling
read rel-err 12.1% / 2.1% / 0.24% at sf0.001/0.01/0.1 — error
SHRINKING with scale, the property the estimator exists for. This
script re-measures that on graphs the estimator has never seen,
generated to be ADVERSARIAL in exactly the way that killed
center-sampling: Zipf-skewed supplier degrees, so a few hub suppliers
carry most of the C(deg,2) wedge mass.

Two planted bipartite co-purchase graphs (seeded, ~100k and ~400k
distinct edges) are written in the exact orders/lineitem schema the
engine derives its graph from (one order + one lineitem per edge), so
the SHIPPED q_butterfly / q_butterfly_sampled run unmodified against
the tmpdir. Ground truth is INDEPENDENT of the Spark exact path:
DuckDB runs ORACLE_BUTTERFLY on the same parquet (and the Spark exact
count is asserted equal to it, which re-checks the exact pipeline on
a non-fixture graph for free).

Asserts (floors ~2-3x first-run measurements, mirroring stress_ann):
  - Spark exact == DuckDB exact at both scales (bit parity);
  - sampled rel-err < 10% at ~100k edges, < 4% at ~400k edges;
  - the estimate is obs * RATE^4 exactly (BIGINT arithmetic intact).

Wall-clock for exact vs sampled is printed for the record, not
asserted (machine noise is +/-30%).

Run: PYTHONPATH=/root/repo python scripts/stress_butterfly.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from louvain_modularity_spark.session import get_spark  # noqa: E402

#: (name, n_customers, n_suppliers, edge draws, rel-err ceiling)
SCALES = [
    ("small-100k", 12_000, 1_500, 110_000, 0.10),
    ("large-400k", 45_000, 5_000, 440_000, 0.04),
]
ZIPF_EXP = 0.8  # supplier-degree skew: deg(rank r) ~ 1/r^0.8


def plant_graph(tmpdir: str, n_cust: int, n_supp: int, n_draws: int, seed: int) -> int:
    """Write orders/lineitem parquet encoding a Zipf-skewed bipartite
    graph (one order + one lineitem per drawn edge; the engine's
    distinct() collapses duplicate draws). Returns the distinct edge
    count for the record."""
    rng = np.random.RandomState(seed)
    # supplier picked by Zipf rank, customer uniform: hub suppliers
    # dominate the wedge mass, the center-sampling failure mode
    w = 1.0 / np.arange(1, n_supp + 1) ** ZIPF_EXP
    supp = rng.choice(n_supp, size=n_draws, p=w / w.sum()) + 1
    cust = rng.randint(1, n_cust + 1, size=n_draws)
    edges = np.unique(np.stack([cust, supp], axis=1), axis=0)
    okey = np.arange(1, len(edges) + 1, dtype=np.int64)

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okey),
                "o_custkey": pa.array(edges[:, 0].astype(np.int64)),
            }
        ),
        os.path.join(tmpdir, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okey),
                "l_suppkey": pa.array(edges[:, 1].astype(np.int64)),
            }
        ),
        os.path.join(tmpdir, "lineitem.parquet"),
    )
    return len(edges)


def duckdb_exact(tmpdir: str) -> int:
    """Independent ground truth: ORACLE_BUTTERFLY in DuckDB."""
    import duckdb

    from louvain_modularity_spark.graph import ORACLE_BUTTERFLY

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmpdir}/{t}.parquet')"
        )
    return int(con.execute(ORACLE_BUTTERFLY).fetchone()[3])


def main() -> int:
    from louvain_modularity_spark.graph import (
        BUTTERFLY_SAMPLE_RATE,
        q_butterfly,
        q_butterfly_sampled,
    )

    spark = get_spark("stress-butterfly")
    for i, (name, n_cust, n_supp, n_draws, ceiling) in enumerate(SCALES):
        with tempfile.TemporaryDirectory() as tmpdir:
            n_edges = plant_graph(tmpdir, n_cust, n_supp, n_draws, seed=7 + i)
            truth = duckdb_exact(tmpdir)

            t0 = time.time()
            exact_row = q_butterfly(spark, tmpdir).collect()[0]
            wall_exact = time.time() - t0
            t0 = time.time()
            samp_row = q_butterfly_sampled(spark, tmpdir).collect()[0]
            wall_samp = time.time() - t0

            assert exact_row["n_edges"] == n_edges
            assert exact_row["n_butterflies"] == truth, (
                f"{name}: Spark exact {exact_row['n_butterflies']} != "
                f"DuckDB exact {truth}"
            )
            est = samp_row["n_butterflies_est"]
            assert (
                est
                == samp_row["n_butterflies_observed"] * BUTTERFLY_SAMPLE_RATE**4
            )
            rel_err = abs(est - truth) / truth
            print(
                f"{name}: {n_edges} edges, exact {truth} butterflies "
                f"({wall_exact:.1f}s), sampled est {est} "
                f"(kept {samp_row['n_edges_kept']} edges, {wall_samp:.1f}s), "
                f"rel-err {rel_err:.4f} (ceiling {ceiling})",
                flush=True,
            )
            assert rel_err < ceiling, f"{name}: rel-err {rel_err:.4f} >= {ceiling}"
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
