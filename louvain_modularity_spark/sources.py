"""Table and graph sources (SURVEY.md §1.3, §2.1, FIXTURES.md §1-2).

All harness tables load from ``{sf_dir}/{name}.parquet``. The
``events`` table's ``ts`` column is a naive (no-zone) parquet
timestamp; it is exposed additionally as ``ts_us`` = integer epoch
microseconds of the wall-clock value interpreted as UTC (the session
time zone is pinned to UTC by session.ensure_conf, so the NTZ→LTZ cast
is the identity instant). Both physical encodings the harness has
shipped are supported: TIMESTAMP(NANOS) — read as LONG nanos under the
legacy conf — and TIMESTAMP(MICROS) — read as TIMESTAMP_NTZ. All
event-time logic in the engine works on ``ts_us`` so results are
timezone-independent and exactly match DuckDB's ``epoch_us(ts)`` on
the same naive timestamps.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import ensure_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

#: absolute paths of packaged edge-list fixtures (FIXTURES.md §3.1)
KARATE_EDGELIST = os.path.join(_DATA_DIR, "karate.edgelist")
KARATE_WEIGHTED_EDGELIST = os.path.join(_DATA_DIR, "karate_weighted.edgelist")


def ts_us_expr(df: DataFrame):
    """Epoch-microseconds expression for the events ``ts`` column,
    robust to both physical encodings (module docstring)."""
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        # legacy nanos-as-long: integer division = exact micros,
        # matches DuckDB's nanos→micros truncation
        return F.expr("ts div 1000")
    # naive timestamp: UTC session tz (ensure_conf) makes the cast the
    # identity instant, so this equals DuckDB's epoch_us(ts)
    return F.unix_micros(F.col("ts").cast("timestamp"))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one harness table; events gets the ts_us convenience column."""
    ensure_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn("ts_us", ts_us_expr(df))
    return df


# ---------------------------------------------------------------------------
# Graph derivation (FIXTURES.md §2 — the harness ships no raw edge table)
# ---------------------------------------------------------------------------

#: id-space offset keeping supplier vertex ids disjoint from customer ids
SUPPLIER_OFFSET = 1_000_000

COPURCHASE_EDGES_SQL = f"""
SELECT o_custkey                   AS src,
       l_suppkey + {SUPPLIER_OFFSET} AS dst,
       CAST(count(*) AS DOUBLE)    AS weight
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — customer–supplier co-purchase bipartite graph (undirected,
    stored once per pair; src = customer id, dst = supplier id +
    SUPPLIER_OFFSET, weight = number of lineitems).

    Scale: lineitem⋈orders is the big join — both sides shuffle on the
    orderkey; at 100 TB the tables would be bucketed on orderkey so the
    join is shuffle-free. The groupBy benefits from partial (map-side)
    aggregation, which Spark applies automatically.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(SUPPLIER_OFFSET)).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )


def read_edgelist(
    spark: SparkSession,
    path: str,
    weighted: bool = False,
    sep: str = " ",
    comment: str = "#",
) -> DataFrame:
    """Generic whitespace-separated edge-list reader — a real user's
    first action ("load my edge file") as one public call, not a
    packaged-fixture special case. Lines: ``src dst [weight]``; comment
    lines start with ``comment``; missing weights default to 1.0
    (reference: NX read_weighted_edgelist semantics).

    Scale: spark.read.csv splits large files by HDFS block and prunes
    the weight column when unused; schema is explicit so no inference
    pass over the data."""
    ensure_conf(spark)
    if weighted:
        df = spark.read.csv(
            path, sep=sep, comment=comment, schema="src LONG, dst LONG, weight DOUBLE"
        ).withColumn("weight", F.coalesce("weight", F.lit(1.0)))
    else:
        df = spark.read.csv(
            path, sep=sep, comment=comment, schema="src LONG, dst LONG"
        ).withColumn("weight", F.lit(1.0))
    return df


def karate_edges(spark: SparkSession, weighted: bool = False) -> DataFrame:
    """Zachary karate-club fixture as an edge DataFrame (34 nodes,
    78 edges; FIXTURES.md §3.1) — the packaged-path case of
    read_edgelist."""
    path = KARATE_WEIGHTED_EDGELIST if weighted else KARATE_EDGELIST
    return read_edgelist(spark, path, weighted=weighted)
