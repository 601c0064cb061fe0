"""Assembles the full query inventory declared in SURVEY.md §2.

Each operator module exposes ``QUERIES: dict[name, fn(spark, sf_dir)
-> DataFrame]`` and ``ORACLES: dict[name, duckdb_sql]`` (oracle absent
→ the driver runs its weaker rows-only check). This module merges
them; ``__spark_entry__.py`` re-exports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from . import (
        analytics,
        funcs,
        graph,
        llm_ops,
        louvain,
        metrics,
        multimodal,
        pipeline,
        relational,
        streaming,
        textprep,
        tpch,
    )

    # Order matters: the correctness driver verifies the FIRST 50 entries of
    # all_queries(). Round 1 verified the relational/funcs/graph packs (and the
    # first three louvain queries); this order puts the remaining queries —
    # the louvain tail, metrics, llm_ops, multimodal, and streaming packs —
    # inside the round-2 window so every registered query ends up with a hard
    # driver-verified correctness row across rounds. textprep (new in round 2)
    # is appended last so it cannot displace this round's verification
    # targets; it rotates into the window next round.
    return [
        louvain,
        metrics,
        llm_ops,
        multimodal,
        streaming,
        relational,
        funcs,
        graph,
        textprep,
        pipeline,
        analytics,
        tpch,
    ]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {mod.__name__}: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
