"""Partition quality metrics (SURVEY.md §2.6).

Modularity (reference: NX/algorithms/community/quality.py:145-255):

    Q = Σ_c [ L_c/m − γ·(k_c/(2m))² ]

where L_c = total weight of intra-community edges (each stored-once
edge counted once, self-loops once), k_c = sum of weighted degrees of
the community's nodes (self-loops twice), m = total edge weight.

Hash-stability: for the oracle query instances every input (weights =
lineitem counts, karate unit weights) is integer-exact in a double, and
both dialects spell the final arithmetic expression with the exact same
text, so left-associative IEEE evaluation gives bit-identical results —
no rounding required.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .graph import degree_weighted, mod10_assignment, vertices_of
from .session import lineage_cut
from .sources import COPURCHASE_EDGES_SQL, copurchase_edges, karate_edges

# golden karate partition (FIXTURES.md §3.1, seed=2 sequential reference)
KARATE_GOLDEN_PARTITION = {
    0: (0, 1, 2, 3, 7, 9, 11, 12, 13, 17, 19, 21),
    1: (4, 5, 6, 10, 16),
    2: (23, 24, 25, 27, 28, 31),
    3: (8, 14, 15, 18, 20, 22, 26, 29, 30, 32, 33),
}
KARATE_GOLDEN_Q = 0.41880341880341876


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------


class NotAPartition(ValueError):
    """The given assignment is not a partition of the graph's nodes
    (uncovered or multiply-assigned nodes) — reference:
    NX quality.py NotAPartition."""


def validate_partition(edges: DataFrame, assignment: DataFrame) -> None:
    """Raise NotAPartition unless every graph node is assigned exactly
    once. Two counting jobs (anti-join + duplicate scan) — used by the
    public api.modularity, not by the inner Louvain loop, whose
    assignments are partitions by construction."""
    verts = vertices_of(edges)
    n_uncovered = verts.join(assignment, "id", "left_anti").count()
    if n_uncovered:
        raise NotAPartition(f"{n_uncovered} graph nodes missing from the assignment")
    n_multi = (
        assignment.groupBy("id").agg(F.count("*").alias("c")).filter(F.col("c") > 1).count()
    )
    if n_multi:
        raise NotAPartition(f"{n_multi} nodes assigned to multiple communities")


def modularity_parts(edges: DataFrame, assignment: DataFrame) -> DataFrame:
    """One row: (m, intra, sumk2) — the three aggregate inputs of Q.

    Three cheap shuffles: edge-weight sum, intra-edge sum (edges joined
    to the assignment on both endpoints), per-community degree sums.
    The assignment side is broadcast-sized at every Louvain level above
    the first; AQE picks broadcast automatically when it fits.

    m comes from the raw edge table, NOT from the assignment-joined
    edges, so a partial assignment cannot silently shrink m and distort
    Q (api.modularity additionally validates coverage and raises
    NotAPartition, matching the reference).
    """
    a_src = assignment.select(F.col("id").alias("src"), F.col("community").alias("com_src"))
    a_dst = assignment.select(F.col("id").alias("dst"), F.col("community").alias("com_dst"))
    m_df = edges.agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("m"))
    intra_df = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("com_src") == F.col("com_dst"), F.col("weight"))
                ),
                F.lit(0.0),
            ).alias("intra"),
        )
    )
    sumk2_df = (
        degree_weighted(edges)
        .join(assignment, "id")
        .groupBy("community")
        .agg(F.sum("degree").alias("k_c"))
        .agg(F.sum(F.col("k_c") * F.col("k_c")).alias("sumk2"))
    )
    return m_df.crossJoin(intra_df).crossJoin(sumk2_df)


def modularity_df(edges: DataFrame, assignment: DataFrame, gamma: float = 1.0) -> DataFrame:
    """Modularity as a 1-row DataFrame (q, m, intra, sumk2)."""
    return modularity_parts(edges, assignment).select(
        F.expr(f"intra / m - {gamma!r} * sumk2 / (4.0 * m * m)").alias("q"),
        "m",
        "intra",
        "sumk2",
    )


def modularity(edges: DataFrame, assignment: DataFrame, gamma: float = 1.0) -> float:
    """Driver-side scalar Q (used by the Louvain convergence loop)."""
    row = modularity_df(edges, assignment, gamma).collect()[0]
    return float(row["q"])


def modularity_directed_df(
    edges: DataFrame, assignment: DataFrame, gamma: float = 1.0
) -> DataFrame:
    """Directed modularity Q = Σ_c [L_c/m − γ·k_c^in·k_c^out/m²]
    (Leicht–Newman; reference: quality.py:161-168 directed branch)."""
    a_src = assignment.select(F.col("id").alias("src"), F.col("community").alias("com_src"))
    a_dst = assignment.select(F.col("id").alias("dst"), F.col("community").alias("com_dst"))
    m_df = edges.agg(F.sum("weight").alias("m"))
    intra_df = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("com_src") == F.col("com_dst"))
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("intra"))
    )
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k_out"))
    in_deg = edges.groupBy(F.col("dst").alias("id")).agg(F.sum("weight").alias("k_in"))
    kk = (
        assignment.join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .groupBy("community")
        .agg(
            F.sum(F.coalesce("k_in", F.lit(0.0))).alias("kin_c"),
            F.sum(F.coalesce("k_out", F.lit(0.0))).alias("kout_c"),
        )
        .agg(F.sum(F.col("kin_c") * F.col("kout_c")).alias("sum_kio"))
    )
    return (
        m_df.crossJoin(intra_df)
        .crossJoin(kk)
        .select(
            F.expr(f"intra / m - {gamma!r} * sum_kio / (m * m)").alias("q"),
            "m",
            "intra",
            "sum_kio",
        )
    )


def karate_golden_assignment(spark: SparkSession) -> DataFrame:
    rows = [
        (node, com) for com, nodes in KARATE_GOLDEN_PARTITION.items() for node in nodes
    ]
    return spark.createDataFrame(rows, "id LONG, community LONG")


_KARATE_GOLDEN_CASE = "CASE " + " ".join(
    f"WHEN id IN {tuple(nodes)} THEN {com}"
    for com, nodes in KARATE_GOLDEN_PARTITION.items()
) + " END"


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------

_G1_PARTS_SQL = f"""
WITH e AS ({COPURCHASE_EDGES_SQL}),
a AS (
  SELECT id, id % 10 AS community
  FROM (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))
),
mm AS (SELECT SUM(weight) AS m FROM e),
ii AS (
  SELECT COALESCE(SUM(weight), 0.0) AS intra
  FROM e JOIN a s ON e.src = s.id JOIN a d ON e.dst = d.id
  WHERE s.community = d.community
),
deg AS (
  SELECT id, SUM(weight) AS degree
  FROM (SELECT src AS id, weight FROM e UNION ALL SELECT dst AS id, weight FROM e)
  GROUP BY id
),
kk AS (
  SELECT SUM(k_c * k_c) AS sumk2
  FROM (SELECT a.community, SUM(degree) AS k_c
        FROM deg JOIN a ON deg.id = a.id GROUP BY a.community)
)
SELECT m, intra, sumk2 FROM mm, ii, kk
"""


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q of the G1 co-purchase graph under the deterministic id%10
    assignment (G2) at γ=1."""
    edges = lineage_cut(copurchase_edges(spark, sf_dir), eager=False)
    return modularity_df(edges, mod10_assignment(edges), gamma=1.0)


ORACLE_MODULARITY = f"""
SELECT intra / m - 1.0 * sumk2 / (4.0 * m * m) AS q, m, intra, sumk2
FROM ({_G1_PARTS_SQL})
"""


def q_modularity_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed modularity of the (directed) co-purchase graph
    customer → supplier under the id%10 assignment."""
    edges = copurchase_edges(spark, sf_dir)
    return modularity_directed_df(edges, mod10_assignment(edges), gamma=1.0)


ORACLE_MODULARITY_DIRECTED = f"""
WITH e AS ({COPURCHASE_EDGES_SQL}),
v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
a AS (SELECT id, id % 10 AS community FROM v),
mm AS (SELECT SUM(weight) AS m FROM e),
ii AS (
  SELECT COALESCE(SUM(weight), 0.0) AS intra
  FROM e WHERE src % 10 = dst % 10
),
od AS (SELECT src AS id, SUM(weight) AS k_out FROM e GROUP BY 1),
idg AS (SELECT dst AS id, SUM(weight) AS k_in FROM e GROUP BY 1),
kk AS (
  SELECT SUM(kin_c * kout_c) AS sum_kio FROM (
    SELECT a.community,
           SUM(COALESCE(k_in, 0.0))  AS kin_c,
           SUM(COALESCE(k_out, 0.0)) AS kout_c
    FROM a LEFT JOIN od ON a.id = od.id LEFT JOIN idg ON a.id = idg.id
    GROUP BY a.community
  )
)
SELECT intra / m - 1.0 * sum_kio / (m * m) AS q, m, intra, sum_kio
FROM mm, ii, kk
"""


def q_resolution_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q(γ) for γ ∈ {0.5, 1, 2} on karate with the golden partition —
    the resolution parameter scales the null-model term (reference:
    louvain.py:76-78, quality.py:191-193)."""
    edges = karate_edges(spark)
    assignment = karate_golden_assignment(spark)
    parts = modularity_parts(edges, assignment)
    out = None
    for g in (0.5, 1.0, 2.0):
        row = parts.select(
            F.lit(g).alias("gamma"),
            F.expr(f"intra / m - {g!r} * sumk2 / (4.0 * m * m)").alias("q"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_KARATE_GOLDEN_PARTS_SQL = """
WITH e AS ({karate}),
a AS (
  SELECT id, {case} AS community
  FROM (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))
),
mm AS (SELECT SUM(weight) AS m FROM e),
ii AS (
  SELECT COALESCE(SUM(weight), 0.0) AS intra
  FROM e JOIN a s ON e.src = s.id JOIN a d ON e.dst = d.id
  WHERE s.community = d.community
),
deg AS (
  SELECT id, SUM(weight) AS degree
  FROM (SELECT src AS id, weight FROM e UNION ALL SELECT dst AS id, weight FROM e)
  GROUP BY id
),
kk AS (
  SELECT SUM(k_c * k_c) AS sumk2
  FROM (SELECT a.community, SUM(degree) AS k_c
        FROM deg JOIN a ON deg.id = a.id GROUP BY a.community)
)
SELECT m, intra, sumk2 FROM mm, ii, kk
"""


def _oracle_resolution_sweep() -> str:
    from .graph import _KARATE_SQL

    parts = _KARATE_GOLDEN_PARTS_SQL.format(karate=_KARATE_SQL, case=_KARATE_GOLDEN_CASE)
    selects = [
        f"SELECT CAST({g!r} AS DOUBLE) AS gamma,"
        f" intra / m - {g!r} * sumk2 / (4.0 * m * m) AS q FROM p"
        for g in (0.5, 1.0, 2.0)
    ]
    return f"WITH p AS ({parts})\n" + "\nUNION ALL\n".join(selects)


def q_is_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition validation (reference: community_utils.py:9-30):
    every node assigned exactly once, all nodes covered."""
    edges = copurchase_edges(spark, sf_dir)
    verts = vertices_of(edges)
    assignment = mod10_assignment(edges)
    per_node = assignment.groupBy("id").agg(F.count("*").alias("cnt"))
    stats = per_node.agg(
        F.count("*").alias("n_assigned"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).cast("long").alias("n_multi"),
    )
    n_nodes = verts.agg(F.count("*").alias("n_nodes"))
    uncovered = verts.join(assignment, "id", "left_anti").agg(
        F.count("*").alias("n_uncovered")
    )
    return (
        n_nodes.crossJoin(stats)
        .crossJoin(uncovered)
        .select(
            "n_nodes",
            "n_assigned",
            "n_multi",
            "n_uncovered",
            ((F.col("n_multi") == 0) & (F.col("n_uncovered") == 0)).alias("is_partition"),
        )
    )


ORACLE_IS_PARTITION = f"""
WITH e AS ({COPURCHASE_EDGES_SQL}),
v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
a AS (SELECT id, id % 10 AS community FROM v),
pn AS (SELECT id, COUNT(*) AS cnt FROM a GROUP BY id)
SELECT (SELECT COUNT(*) FROM v)                                   AS n_nodes,
       (SELECT COUNT(*) FROM pn)                                  AS n_assigned,
       (SELECT CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM pn) AS n_multi,
       (SELECT COUNT(*) FROM v WHERE id NOT IN (SELECT id FROM a)) AS n_uncovered,
       ((SELECT CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM pn) = 0
        AND (SELECT COUNT(*) FROM v WHERE id NOT IN (SELECT id FROM a)) = 0) AS is_partition
"""


def q_intra_inter_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra- vs inter-community edge counts and weights
    (reference: quality.py:62-108)."""
    edges = copurchase_edges(spark, sf_dir)
    assignment = mod10_assignment(edges)
    a_src = assignment.select(F.col("id").alias("src"), F.col("community").alias("com_src"))
    a_dst = assignment.select(F.col("id").alias("dst"), F.col("community").alias("com_dst"))
    intra = F.col("com_src") == F.col("com_dst")
    return (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .agg(
            F.sum(F.when(intra, 1).otherwise(0)).cast("long").alias("n_intra"),
            F.sum(F.when(~intra, 1).otherwise(0)).cast("long").alias("n_inter"),
            F.sum(F.when(intra, F.col("weight")).otherwise(0.0)).alias("w_intra"),
            F.sum(F.when(~intra, F.col("weight")).otherwise(0.0)).alias("w_inter"),
        )
    )


ORACLE_INTRA_INTER = f"""
WITH e AS ({COPURCHASE_EDGES_SQL})
SELECT CAST(SUM(CASE WHEN src % 10 = dst % 10 THEN 1 ELSE 0 END) AS BIGINT)   AS n_intra,
       CAST(SUM(CASE WHEN src % 10 <> dst % 10 THEN 1 ELSE 0 END) AS BIGINT)  AS n_inter,
       SUM(CASE WHEN src % 10 = dst % 10 THEN weight ELSE 0.0 END)            AS w_intra,
       SUM(CASE WHEN src % 10 <> dst % 10 THEN weight ELSE 0.0 END)           AS w_inter
FROM e
"""


def q_partition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage and performance of a partition (reference:
    quality.py:260-347) on the karate fixture with assignment id % 4.

    coverage   = intra_weight / m
    performance = (intra_edges + inter_non_edges) / total_pairs
    (unweighted simple graph; all inputs integers → exact ratios.)
    """
    edges = karate_edges(spark)
    assignment = vertices_of(edges).select(
        "id", F.pmod("id", F.lit(4)).alias("community")
    )
    a_src = assignment.select(F.col("id").alias("src"), F.col("community").alias("com_src"))
    a_dst = assignment.select(F.col("id").alias("dst"), F.col("community").alias("com_dst"))
    intra = F.col("com_src") == F.col("com_dst")
    edge_stats = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .agg(
            F.count("*").cast("double").alias("n_edges"),
            F.sum("weight").alias("m"),
            F.sum(F.when(intra, 1).otherwise(0)).cast("double").alias("intra_edges"),
            F.sum(F.when(intra, F.col("weight")).otherwise(0.0)).alias("intra_w"),
        )
    )
    sizes = (
        assignment.groupBy("community")
        .agg(F.count("*").cast("double").alias("n_c"))
        .agg(
            F.sum("n_c").alias("n"),
            F.sum(F.col("n_c") * (F.col("n_c") - 1) / 2.0).alias("intra_pairs"),
        )
    )
    return edge_stats.crossJoin(sizes).select(
        F.expr("intra_w / m").alias("coverage"),
        F.expr(
            "(intra_edges + ((n * (n - 1) / 2.0 - intra_pairs) - (n_edges - intra_edges)))"
            " / (n * (n - 1) / 2.0)"
        ).alias("performance"),
        F.col("intra_edges").cast("long").alias("n_intra_edges"),
        F.col("n").cast("long").alias("n_nodes"),
    )


def _oracle_partition_quality() -> str:
    from .graph import _KARATE_SQL

    return f"""
WITH e AS ({_KARATE_SQL}),
a AS (
  SELECT id, id % 4 AS community
  FROM (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))
),
es AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_edges,
         SUM(e.weight) AS m,
         CAST(SUM(CASE WHEN s.community = d.community THEN 1 ELSE 0 END) AS DOUBLE) AS intra_edges,
         SUM(CASE WHEN s.community = d.community THEN e.weight ELSE 0.0 END) AS intra_w
  FROM e JOIN a s ON e.src = s.id JOIN a d ON e.dst = d.id
),
sz AS (
  SELECT SUM(n_c) AS n, SUM(n_c * (n_c - 1) / 2.0) AS intra_pairs
  FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS n_c FROM a GROUP BY community)
)
SELECT intra_w / m AS coverage,
       (intra_edges + ((n * (n - 1) / 2.0 - intra_pairs) - (n_edges - intra_edges)))
         / (n * (n - 1) / 2.0) AS performance,
       CAST(intra_edges AS BIGINT) AS n_intra_edges,
       CAST(n AS BIGINT) AS n_nodes
FROM es, sz
"""


QUERIES = {
    "q_modularity": q_modularity,
    "q_modularity_directed": q_modularity_directed,
    "q_resolution_sweep": q_resolution_sweep,
    "q_is_partition": q_is_partition,
    "q_intra_inter_edges": q_intra_inter_edges,
    "q_partition_quality": q_partition_quality,
}


ORACLES = {
    "q_modularity": ORACLE_MODULARITY,
    "q_modularity_directed": ORACLE_MODULARITY_DIRECTED,
    "q_resolution_sweep": _oracle_resolution_sweep(),
    "q_is_partition": ORACLE_IS_PARTITION,
    "q_intra_inter_edges": ORACLE_INTRA_INTER,
    "q_partition_quality": _oracle_partition_quality(),
}
