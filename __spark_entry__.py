"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``louvain_modularity_spark/`` (SURVEY.md §2
inventory); this module only wires the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Derives the customer–supplier co-purchase graph from
    lineitem ⋈ orders (FIXTURES.md §2 G1), computes weighted degrees
    (SURVEY.md §2.3), and returns the top-20 vertices by strength —
    one scan, one join, two shuffles, end to end.
    """
    import pyspark.sql.functions as F

    from louvain_modularity_spark.graph import degree_weighted
    from louvain_modularity_spark.sources import copurchase_edges

    edges = copurchase_edges(spark, "/root/testdata/sf0.001")
    return (
        degree_weighted(edges)
        .orderBy(F.desc("degree"), "id")
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from louvain_modularity_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ the driver
    records the weaker rows-only check; see SURVEY.md §2 oracle column).
    """
    from louvain_modularity_spark.registry import all_oracles

    return all_oracles()
