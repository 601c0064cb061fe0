"""Semantics pins for the analytics pack's iterative graph operators:
the SQL oracles bound iteration counts, so these tests prove the
bounds reach the true fixpoint (SSSP vs networkx Dijkstra) or match an
independent implementation step-for-step (PPR vs numpy power
iteration), mirroring the golden-fixture idiom of SURVEY.md §5.
"""

import numpy as np
import pytest
from conftest import SF_DIR

from louvain_modularity_spark.analytics import (
    PPR_ALPHA,
    PPR_ITERS,
    PPR_SOURCE,
    SSSP_MAX_HOPS,
    SSSP_SOURCE,
    q_personalized_pagerank,
    q_salted_join,
    q_sssp_weighted,
)
from louvain_modularity_spark.sources import KARATE_WEIGHTED_EDGELIST, KARATE_EDGELIST


def _load_edges(path):
    edges = []
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        p = line.split()
        edges.append((int(p[0]), int(p[1]), float(p[2]) if len(p) > 2 else 1.0))
    return edges


def test_sssp_matches_networkx_dijkstra(spark):
    """The oracle truncates Bellman–Ford at SSSP_MAX_HOPS rounds; true
    (unbounded) Dijkstra distances must agree, proving the bound
    covers this graph's weighted shortest paths."""
    nx = pytest.importorskip("networkx")
    G = nx.Graph()
    for u, v, w in _load_edges(KARATE_WEIGHTED_EDGELIST):
        G.add_edge(u, v, weight=w)
    golden = nx.single_source_dijkstra_path_length(G, SSSP_SOURCE)
    got = {r["id"]: r["dist"] for r in q_sssp_weighted(spark, SF_DIR).collect()}
    assert set(got) == set(golden)
    for node, d in golden.items():
        assert got[node] == pytest.approx(d, abs=1e-9), node
    # and the hop bound is not merely sufficient but has margin
    paths = nx.single_source_dijkstra_path(G, SSSP_SOURCE)
    assert max(len(p) - 1 for p in paths.values()) < SSSP_MAX_HOPS


def test_ppr_matches_numpy_power_iteration(spark):
    """PPR runs a FIXED 20 iterations (so the chained-CTE oracle is
    exactly expressible); an independent numpy implementation of the
    same recurrence must match step-for-step."""
    edges = _load_edges(KARATE_EDGELIST)
    n = 34
    W = np.zeros((n, n))
    for u, v, w in edges:
        W[u, v] += w
        if u != v:
            W[v, u] += w
    wout = W.sum(axis=1)
    P = W / wout[:, None]  # row-stochastic
    e = np.zeros(n)
    e[PPR_SOURCE] = 1.0
    r = e.copy()
    for _ in range(PPR_ITERS):
        r = (1.0 - PPR_ALPHA) * e + PPR_ALPHA * (P.T @ r)
    got = {row["id"]: row["ppr"] for row in q_personalized_pagerank(spark, SF_DIR).collect()}
    assert len(got) == n
    for i in range(n):
        assert got[i] == pytest.approx(round(r[i], 6), abs=2e-6), i
    # restart mass conservation: total rank == 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_salted_join_broadcasts_dim(spark):
    """The salted dim (5 keys × 8 salts) must stay on the broadcast
    path — salting fixes reducer skew without adding a shuffle."""
    plan = (
        q_salted_join(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_allocation_conserves_every_cent(spark):
    """Largest-remainder allocation: allocated == total for EVERY
    order (to the cent), and item shares stay within one cent of
    exact proportionality bounds (base ≤ share ≤ base+1 by
    construction implies max-min spread sanity)."""
    from conftest import SF_DIR

    from louvain_modularity_spark.datasci import q_allocation

    rows = q_allocation(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["allocated_cents"] == r["total_cents"], r
        assert r["min_item_cents"] >= 0, r
        assert r["max_item_cents"] >= r["min_item_cents"], r
