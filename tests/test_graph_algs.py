"""Golden tests for the directed SCC (coloring algorithm) and
multi-source-BFS closeness against networkx ground truth."""

import pytest

nx = pytest.importorskip("networkx")

SF = "/root/testdata/sf0.001"


def _nx_directed_karate():
    from louvain_modularity_spark.graph import KARATE_DIRECTED_SQL_MOD

    g = nx.karate_club_graph()
    d = nx.DiGraph()
    for u, v in g.edges():
        s, t = min(u, v), max(u, v)
        d.add_edge(s, t)
        if (s + t) % KARATE_DIRECTED_SQL_MOD == 0:
            d.add_edge(t, s)
    return d


def test_scc_matches_networkx(spark):
    from louvain_modularity_spark.graph import q_scc

    got = {r["id"]: r["scc"] for r in q_scc(spark, SF).collect()}
    d = _nx_directed_karate()
    expected = {n: min(c) for c in nx.strongly_connected_components(d) for n in c}
    assert got == expected
    sizes = sorted(
        [sum(1 for v in got.values() if v == s) for s in set(got.values())],
        reverse=True,
    )
    assert sizes == [15, 13, 1, 1, 1, 1, 1, 1]  # the fixture's documented shape


def test_betweenness_matches_networkx(spark):
    """Brandes engine vs networkx exact unnormalized betweenness —
    third witness alongside the independent pair-dependency oracle."""
    from louvain_modularity_spark.graph import q_betweenness

    got = {r["id"]: r["betweenness"] for r in q_betweenness(spark, SF).collect()}
    expected = nx.betweenness_centrality(nx.karate_club_graph(), normalized=False)
    assert set(got) == set(expected)
    for n, b in expected.items():
        assert got[n] == pytest.approx(b, abs=1e-6)


def test_eigenvector_matches_networkx(spark):
    """60 unnormalized power iterations + final L2 normalization vs
    networkx eigenvector_centrality ((λ2/λ1)^60 ≈ 1.4e-8 residual, so
    2e-6 tolerance dominated by the 6-dp emission rounding)."""
    from louvain_modularity_spark.graph import q_eigenvector

    got = {r["id"]: r["ev"] for r in q_eigenvector(spark, SF).collect()}
    expected = nx.eigenvector_centrality(nx.karate_club_graph(), max_iter=1000, tol=1e-10)
    assert set(got) == set(expected)
    for n, e in expected.items():
        assert got[n] == pytest.approx(e, abs=2e-6)


def test_closeness_matches_networkx(spark):
    from louvain_modularity_spark.graph import CLOSENESS_MAX_HOPS, q_closeness

    g = nx.karate_club_graph()
    assert nx.diameter(g) <= CLOSENESS_MAX_HOPS  # round budget reaches fixpoint
    got = {r["source"]: r["closeness"] for r in q_closeness(spark, SF).collect()}
    expected = nx.closeness_centrality(g)
    assert set(got) == set(expected)
    for n, c in expected.items():
        assert got[n] == pytest.approx(c, abs=1e-6)


def test_eccentricity_matches_networkx(spark):
    from louvain_modularity_spark.graph import q_eccentricity

    rows = q_eccentricity(spark, SF).collect()
    got = {r["source"]: r["ecc"] for r in rows if r["source"] >= 0}
    summary = next(r for r in rows if r["source"] == -1)
    g = nx.karate_club_graph()
    expected = nx.eccentricity(g)
    assert got == expected
    assert summary["radius"] == nx.radius(g)
    assert summary["diameter"] == nx.diameter(g)


def test_harmonic_matches_networkx(spark):
    from louvain_modularity_spark.graph import q_harmonic_centrality

    got = {
        r["source"]: r["harmonic"]
        for r in q_harmonic_centrality(spark, SF).collect()
    }
    expected = nx.harmonic_centrality(nx.karate_club_graph())
    assert set(got) == set(expected)
    for n, h in expected.items():
        assert got[n] == pytest.approx(h, abs=1e-6)


def test_sampled_harmonic_approximates_exact(spark):
    """(n/k)-scaled sampled harmonic estimates every node from k
    sources; mean absolute relative error stays small."""
    import random

    from louvain_modularity_spark.graph import harmonic_centrality

    g = nx.connected_watts_strogatz_graph(200, 8, 0.3, seed=13)
    edges = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in g.edges()],
        "src LONG, dst LONG, weight DOUBLE",
    )
    sources = random.Random(2).sample(sorted(g.nodes()), 40)
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges, 12, sources=sources).collect()
    }
    exact = nx.harmonic_centrality(g)
    assert set(got) == set(exact)
    rel_errs = [abs(got[n] - exact[n]) / exact[n] for n in exact]
    assert sum(rel_errs) / len(rel_errs) < 0.10


def test_sampled_betweenness_rank_correlates(spark):
    """Brandes–Pich sampled-source betweenness on a ~200-node small-world
    graph: k=40 sources must rank-correlate with exact networkx, and the
    BFS state must be O(samples·V), not O(V²)."""
    import random

    from louvain_modularity_spark.graph import all_pairs_hops, betweenness

    g = nx.connected_watts_strogatz_graph(200, 8, 0.3, seed=7)
    edges = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in g.edges()],
        "src LONG, dst LONG, weight DOUBLE",
    )
    k = 40
    sources = random.Random(0).sample(sorted(g.nodes()), k)

    # state bound: sampled BFS state is exactly k rows per vertex
    d = all_pairs_hops(spark, edges, 12, sources=sources)
    assert d.count() == k * g.number_of_nodes()

    got = {
        r["id"]: r["betweenness"]
        for r in betweenness(spark, edges, 12, sources=sources).collect()
    }
    exact = nx.betweenness_centrality(g, normalized=False)
    common = sorted(set(got) & set(exact))
    assert len(common) == g.number_of_nodes()

    def ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        for pos, i in enumerate(order):
            r[i] = float(pos)
        return r

    import numpy as np

    ra = ranks([got[n] for n in common])
    rb = ranks([exact[n] for n in common])
    rho = float(np.corrcoef(ra, rb)[0, 1])
    assert rho > 0.8, f"Spearman rho {rho}"

    # the estimator is unbiased in expectation: totals within 25%
    assert sum(got.values()) == pytest.approx(sum(exact.values()), rel=0.25)


def test_sampled_closeness_approximates_exact(spark):
    """Eppstein–Wang sampled closeness estimates every node's closeness
    from k sources; mean absolute relative error stays small."""
    import random

    from louvain_modularity_spark.graph import closeness

    g = nx.connected_watts_strogatz_graph(200, 8, 0.3, seed=11)
    edges = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in g.edges()],
        "src LONG, dst LONG, weight DOUBLE",
    )
    sources = random.Random(1).sample(sorted(g.nodes()), 40)
    got = {
        r["id"]: r["closeness"]
        for r in closeness(spark, edges, 12, sources=sources).collect()
    }
    # networkx wf_improved=False == classic (n-1)/sum(d) on a connected graph
    exact = nx.closeness_centrality(g, wf_improved=False)
    assert set(got) == set(exact)
    rel_errs = [abs(got[n] - exact[n]) / exact[n] for n in exact]
    assert sum(rel_errs) / len(rel_errs) < 0.10


def test_ktruss_matches_networkx(spark):
    """Peel-loop 4-truss vs networkx k_truss on karate — exact edge-set
    equality, plus a random graph at k=3 to exercise a multi-round
    peel."""
    from louvain_modularity_spark.graph import KTRUSS_K, k_truss, q_ktruss

    got = {(r["a"], r["b"]) for r in q_ktruss(spark, SF).collect()}
    want = {
        (min(u, v), max(u, v))
        for u, v in nx.k_truss(nx.karate_club_graph(), KTRUSS_K).edges()
    }
    assert got == want

    g = nx.gnm_random_graph(60, 220, seed=7)
    edges = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in g.edges()],
        "src LONG, dst LONG, weight DOUBLE",
    )
    got3 = {(r["a"], r["b"]) for r in k_truss(spark, edges, 4).collect()}
    want3 = {(min(u, v), max(u, v)) for u, v in nx.k_truss(g, 4).edges()}
    assert got3 == want3


def test_random_walk_structure(spark):
    """Every walk step must traverse a real edge and walks are exactly
    WALK_STEPS long from every vertex — structural invariants beyond
    the value-exact SQL oracle."""
    from louvain_modularity_spark.graph import WALK_STEPS, q_random_walk

    rows = q_random_walk(spark, SF).collect()
    g = nx.karate_club_graph()
    walks = {}
    for r in rows:
        walks.setdefault(r["start"], {})[r["step"]] = r["node"]
    assert set(walks) == set(g.nodes())
    for start, path in walks.items():
        assert sorted(path) == list(range(WALK_STEPS + 1))
        assert path[0] == start
        for i in range(1, WALK_STEPS + 1):
            assert g.has_edge(path[i - 1], path[i])


def test_graph_coloring_proper_and_deterministic(spark):
    """Jones–Plassmann coloring invariants: every vertex colored, no
    edge monochromatic, ≤ Δ+1 colors, and two runs agree exactly
    (hash priorities are deterministic)."""
    from louvain_modularity_spark.graph import q_graph_coloring

    g = nx.karate_club_graph()
    runs = []
    for _ in range(2):
        colors = {r["id"]: r["color"] for r in q_graph_coloring(spark, SF).collect()}
        runs.append(colors)
    assert runs[0] == runs[1]
    colors = runs[0]
    assert set(colors) == set(g.nodes())
    assert all(c is not None and c >= 0 for c in colors.values())
    for u, v in g.edges():
        assert colors[u] != colors[v], (u, v)
    max_deg = max(d for _, d in g.degree())
    assert len(set(colors.values())) <= max_deg + 1


def test_python_xxh64_matches_spark(spark):
    """The coloring oracle inlines priorities computed by the pure-
    Python XXH64 (graph._xxh64_long); pin it bit-equal to the engine's
    ``F.xxhash64`` (seed 42, LongType path) over the whole karate id
    range plus adversarial values — any drift would silently reorder
    the oracle's priorities."""
    from pyspark.sql import functions as F

    from louvain_modularity_spark.graph import (
        _KARATE_N,
        _xxh64_int_unsigned,
        _xxh64_long,
    )

    M64 = 1 << 64

    def sgn(u):
        return u - M64 if u >= 1 << 63 else u

    vals = list(range(_KARATE_N)) + [-1, -(2**63), 2**63 - 1, 123456789012345]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v LONG")
        .select(
            "v",
            F.xxhash64("v").alias("h"),
            # the two multi-column chains the louvain oracles rebuild:
            # hashInt(42, 42) seeding hashLong(v, .) and
            # hashLong(v, 42) seeding hashInt(1, .)
            F.xxhash64(F.lit(42), F.col("v")).alias("h42v"),
            F.xxhash64(F.col("v"), F.lit(1)).alias("hv1"),
        )
        .collect()
    )
    inner = _xxh64_int_unsigned(42, 42)
    for r in rows:
        assert _xxh64_long(r["v"]) == r["h"], r["v"]
        assert _xxh64_long(r["v"], inner) == r["h42v"], r["v"]
        hl = _xxh64_long(r["v"], 42) % M64
        assert sgn(_xxh64_int_unsigned(1, hl)) == r["hv1"], r["v"]


def test_mst_boruvka_matches_networkx(spark):
    """Distributed Borůvka vs networkx minimum_spanning_edges on the
    sf0.001 co-purchase graph: total weight and edge count are unique
    across all minimum spanning forests, so they pin correctness even
    under weight ties; the chosen edge set must also be acyclic and
    span exactly the graph's components."""
    from louvain_modularity_spark.graph import q_mst_boruvka
    from louvain_modularity_spark.sources import copurchase_edges

    rows = q_mst_boruvka(spark, SF).collect()
    got_edges = {(r["u"], r["v"]) for r in rows}
    got_weight = sum(r["w"] for r in rows)

    g = nx.Graph()
    for r in copurchase_edges(spark, SF).collect():
        u, v = int(r["src"]), int(r["dst"])
        if u == v:
            continue
        w = int(r["weight"])
        if not g.has_edge(u, v) or g[u][v]["weight"] > w:
            g.add_edge(u, v, weight=w)
    msf = list(nx.minimum_spanning_edges(g, data=True))
    want_weight = sum(d["weight"] for _, _, d in msf)
    assert len(got_edges) == len(msf) == g.number_of_nodes() - nx.number_connected_components(g)
    assert got_weight == want_weight
    # acyclic + same component structure as the input graph
    t = nx.Graph()
    t.add_nodes_from(g.nodes())
    t.add_edges_from(got_edges)
    assert all(g.has_edge(u, v) for u, v in got_edges)
    assert nx.number_connected_components(t) == nx.number_connected_components(g)


def test_mst_boruvka_merge_paths_agree(spark, monkeypatch):
    """The hybrid component contraction (r6): forcing the distributed
    min-label branch (inline threshold 0) must choose the exact same
    forest as the in-driver union-find branch — they are two
    implementations of the same min-id-per-merge-component fixpoint."""
    import louvain_modularity_spark.graph as G

    inline = {
        (r["u"], r["v"], r["w"]) for r in G.q_mst_boruvka(spark, SF).collect()
    }
    monkeypatch.setattr(G, "MST_INLINE_MERGE_EDGES", 0)
    distributed = {
        (r["u"], r["v"], r["w"]) for r in G.q_mst_boruvka(spark, SF).collect()
    }
    assert inline == distributed


def test_hits_matches_svd(spark):
    """HITS alternations vs the converged ground truth (top singular
    vectors of the bipartite weight matrix via numpy SVD — networkx
    hits needs scipy, absent here), both rescaled to max=1. The
    bipartite power iteration converges as (σ2/σ1)^(2k); measured
    error at the fixed budget is <1e-5 on this fixture."""
    import numpy as np

    from louvain_modularity_spark.graph import q_hits
    from louvain_modularity_spark.sources import copurchase_edges

    rows = q_hits(spark, SF).collect()
    got_hub = {r["id"]: r["score"] for r in rows if r["side"] == "hub"}
    got_auth = {r["id"]: r["score"] for r in rows if r["side"] == "authority"}

    edges = [
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in copurchase_edges(spark, SF).collect()
        if r["src"] != r["dst"]
    ]
    srcs = sorted({u for u, _, _ in edges})
    dsts = sorted({v for _, v, _ in edges})
    si = {s: i for i, s in enumerate(srcs)}
    di = {d: i for i, d in enumerate(dsts)}
    w = np.zeros((len(srcs), len(dsts)))
    for u, v, x in edges:
        w[si[u], di[v]] = x
    u_mat, _, vt = np.linalg.svd(w, full_matrices=False)
    h = np.abs(u_mat[:, 0])
    a = np.abs(vt[0])
    h /= h.max()
    a /= a.max()
    assert set(got_hub) == set(srcs)
    assert set(got_auth) == set(dsts)
    for s, i in si.items():
        assert got_hub[s] == pytest.approx(h[i], abs=1e-4), ("hub", s)
    for d, i in di.items():
        assert got_auth[d] == pytest.approx(a[i], abs=1e-4), ("auth", d)


def test_rich_club_matches_networkx(spark):
    """q_rich_club vs networkx rich_club_coefficient (unnormalized)
    on the sf0.001 co-purchase graph, at every threshold in
    RICH_CLUB_KS where networkx defines φ (≥2 qualifying nodes)."""
    from louvain_modularity_spark.graph import RICH_CLUB_KS, q_rich_club
    from louvain_modularity_spark.sources import copurchase_edges

    g = nx.Graph()
    for r in copurchase_edges(spark, SF).collect():
        if r["src"] != r["dst"]:
            g.add_edge(int(r["src"]), int(r["dst"]))
    want = nx.rich_club_coefficient(g, normalized=False)

    got = {r["k"]: r for r in q_rich_club(spark, SF).collect()}
    assert sorted(got) == sorted(RICH_CLUB_KS)
    for k in RICH_CLUB_KS:
        n_k = sum(1 for _, d in g.degree() if d > k)
        assert got[k]["n_k"] == n_k, k
        if k in want and n_k >= 2:
            assert abs(got[k]["phi"] - want[k]) < 1e-6, k


def test_butterfly_matches_pure_python(spark):
    """q_butterfly vs a direct enumeration over supplier neighbor
    sets on the sf0.001 co-purchase graph (independent of the
    SQL-shaped oracle's self-join formulation)."""
    from collections import Counter, defaultdict
    from itertools import combinations

    from louvain_modularity_spark.graph import q_butterfly
    from louvain_modularity_spark.sources import copurchase_edges

    nbrs = defaultdict(set)
    for r in copurchase_edges(spark, SF).collect():
        nbrs[int(r["dst"])].add(int(r["src"]))
    n_edges = sum(len(v) for v in nbrs.values())
    n_wedges = sum(len(v) * (len(v) - 1) // 2 for v in nbrs.values())
    co = Counter()
    for v in nbrs.values():
        for a, b in combinations(sorted(v), 2):
            co[(a, b)] += 1
    n_butterflies = sum(c * (c - 1) // 2 for c in co.values())
    got = q_butterfly(spark, SF).collect()[0]
    assert got["n_edges"] == n_edges
    assert got["n_wedges"] == n_wedges
    assert got["n_copairs"] == len(co)
    assert got["n_butterflies"] == n_butterflies


def test_butterfly_sampled_matches_pure_python_and_bounds_error(spark):
    """q_butterfly_sampled two ways: (1) the OBSERVED count must equal
    a pure-Python enumeration over the hash-kept edge subset (the
    sample is deterministic, so this is exact, independent of the
    SQL-shaped oracle); (2) the ESTIMATE obs·RATE⁴ must land within
    the measured fixture error bound vs the exact q_butterfly count —
    the r12 prototype read 12.1% at sf0.001 (and 2.1% / 0.24% at
    sf0.01 / sf0.1: Doulion error shrinks as the graph grows), so 15%
    is asserted here as the regression guard."""
    import hashlib
    from collections import Counter, defaultdict
    from itertools import combinations

    from louvain_modularity_spark.graph import (
        BUTTERFLY_SAMPLE_RATE,
        q_butterfly,
        q_butterfly_sampled,
    )
    from louvain_modularity_spark.sources import copurchase_edges

    def kept(src, dst):
        h = hashlib.md5(f"{src}:{dst}".encode()).hexdigest()[:8]
        return int(h, 16) % BUTTERFLY_SAMPLE_RATE == 0

    nbrs = defaultdict(set)
    for r in copurchase_edges(spark, SF).collect():
        if kept(int(r["src"]), int(r["dst"])):
            nbrs[int(r["dst"])].add(int(r["src"]))
    n_edges_kept = sum(len(v) for v in nbrs.values())
    n_wedges = sum(len(v) * (len(v) - 1) // 2 for v in nbrs.values())
    co = Counter()
    for v in nbrs.values():
        for a, b in combinations(sorted(v), 2):
            co[(a, b)] += 1
    n_obs = sum(c * (c - 1) // 2 for c in co.values())

    got = q_butterfly_sampled(spark, SF).collect()[0]
    assert got["sample_rate"] == BUTTERFLY_SAMPLE_RATE
    assert got["n_edges_kept"] == n_edges_kept
    assert got["n_wedges_sampled"] == n_wedges
    assert got["n_butterflies_observed"] == n_obs
    assert got["n_butterflies_est"] == n_obs * BUTTERFLY_SAMPLE_RATE**4

    exact = q_butterfly(spark, SF).collect()[0]["n_butterflies"]
    assert exact > 0
    rel_err = abs(got["n_butterflies_est"] - exact) / exact
    assert rel_err < 0.15, f"sampled butterfly rel_err {rel_err:.4f} out of bound"
