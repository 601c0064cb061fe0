"""Reference-shaped public API (drop-in surface for users of the
reference repo's entry points, re-expressed over DataFrames).

The reference exposes (NX/algorithms/community/louvain.py:16,:135 and
quality.py:145):

    louvain_communities(G, weight, resolution, threshold, max_level, seed)
    louvain_partitions(G, weight, resolution, threshold, seed)
    modularity(G, communities, weight, resolution)

Here a graph is an edge DataFrame (``src``, ``dst``, and a weight
column); partitions come back either as assignment DataFrames
(scalable) or — matching the reference's return type — as
``list[set[node]]`` via ``as_partition_sets`` (driver-side, intended
for final coarse results, not for billion-node assignments).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import louvain as _louvain
from . import metrics as _metrics
from .sources import read_edgelist  # noqa: F401  (public API re-export)


def _normalize(edges: DataFrame, weight: str | None) -> DataFrame:
    """Accept any (src, dst[, weight]) frame; missing/None weight
    column ⇒ every edge weighs 1 (reference: louvain.py:205)."""
    cols = edges.columns
    if weight is not None and weight in cols:
        out = edges.select("src", "dst", F.col(weight).cast("double").alias("weight"))
    else:
        out = edges.select("src", "dst", F.lit(1.0).alias("weight"))
    return out


def louvain_communities(
    spark: SparkSession,
    edges: DataFrame,
    weight: str | None = "weight",
    resolution: float = 1.0,
    threshold: float = 1e-07,
    max_level: int | None = None,
    seed: int | None = None,
    directed: bool = False,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """Best partition as an assignment DataFrame (id, community)
    (reference: louvain_communities, louvain.py:16-130)."""
    res = _louvain.louvain_communities(
        spark,
        _normalize(edges, weight),
        gamma=resolution,
        threshold=threshold,
        max_level=max_level,
        seed=seed if seed is not None else 1,
        directed=directed,
        vertices=vertices,
    )
    return res.assignment


def louvain_partitions(
    spark: SparkSession,
    edges: DataFrame,
    weight: str | None = "weight",
    resolution: float = 1.0,
    threshold: float = 1e-07,
    seed: int | None = None,
    directed: bool = False,
) -> list[DataFrame]:
    """Dendrogram: one assignment DataFrame per level, coarser later
    (reference: louvain_partitions, louvain.py:135-224)."""
    res = _louvain.louvain_communities(
        spark,
        _normalize(edges, weight),
        gamma=resolution,
        threshold=threshold,
        seed=seed if seed is not None else 1,
        directed=directed,
    )
    return res.dendrogram


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    weight: str | None = "weight",
    resolution: float = 1.0,
    directed: bool = False,
) -> float:
    """Scalar Q of a partition (reference: quality.py:145-255).

    Raises metrics.NotAPartition if the assignment does not cover every
    graph node exactly once, matching the reference's behavior instead
    of silently computing Q over a shrunken graph."""
    e = _normalize(edges, weight)
    _metrics.validate_partition(e, communities)
    if directed:
        row = _metrics.modularity_directed_df(e, communities, resolution).collect()[0]
        return float(row["q"])
    return _metrics.modularity(e, communities, resolution)


def as_partition_sets(assignment: DataFrame) -> list[set]:
    """Reference-typed result: pairwise-disjoint node sets, ordered by
    smallest member (driver-side; use on final/coarse partitions)."""
    groups: dict[int, set] = {}
    for r in assignment.collect():
        groups.setdefault(r["community"], set()).add(r["id"])
    return [s for _, s in sorted(groups.items(), key=lambda kv: min(kv[1]))]
