"""Classic TPC-H-shape OLAP queries (SURVEY.md §2.13 round-2 pack).

These exercise the decision-support shapes the relational core (§2.7)
doesn't yet pin down: multi-way fact joins feeding a top-k
(Q3/Q10), correlated EXISTS (Q4) and a correlated scalar aggregate
subquery (Q17) — both routed through ``spark.sql`` so Catalyst's
subquery *decorrelation* is what runs (EXISTS → left-semi hash join,
per-group scalar agg → aggregate + join; verified by plan guards in
tests/test_tpch.py) — a group-HAVING gate (Q18), and a relational
UNPIVOT. Predicate constants are adapted to the driver testdata's
column set and date range (1995–2001; no comment/shipmode/shippriority
columns exist); the query *shapes* are the published TPC-H ones.

Hash-stability follows relational.py's rules: money math in the
DECIMAL domain, ROUND before casting back to DOUBLE, dates emitted as
DATE, unique-key tiebreaks under every LIMIT.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .relational import _dec
from .sources import load


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    """Register sf_dir tables as temp views for spark.sql queries.

    Names are prefixed (``tpch_<table>``) so they cannot collide with
    user views; re-registering per call keeps the functions pure
    w.r.t. sf_dir."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(f"tpch_{t}")


# ---------------------------------------------------------------------------
# Q3 — shipping priority: top-10 open orders by potential revenue
# ---------------------------------------------------------------------------


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer⋈orders⋈lineitem, revenue per order for
    a market segment, top 10. 100 TB shape: the two fact tables shuffle
    on orderkey once (AQE picks the strategy); customer's segment
    filter reduces it to a fifth before its join; the top-k is
    TakeOrderedAndProject (per-partition heap + driver merge of 10
    rows), never a global sort."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


ORACLE_TPCH_Q3 = """
SELECT l_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q4 — order priority checking: correlated EXISTS
# ---------------------------------------------------------------------------


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape via spark.sql with a correlated EXISTS — orders
    in a quarter-year window having at least one line shipped more
    than 60 days after the order date (the testdata has no
    commit/receipt dates, so the 'late line' predicate stands in),
    counted per priority. Catalyst decorrelates the EXISTS into a
    left-semi hash join on orderkey with the inequality as a join-side
    filter — no per-row subquery execution exists in the physical
    plan (asserted in tests). At 100 TB the date filter prunes orders
    before the semi join, and the count is 5 groups."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM tpch_orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (
            SELECT 1 FROM tpch_lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
          )
        GROUP BY o_orderpriority
        """
    )


ORACLE_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by lost revenue
# ---------------------------------------------------------------------------


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue of returned lines per customer over a
    half-year of orders, top 20 with nation attached. The nation dim
    (25 rows) is explicitly broadcast; the orders date filter lands in
    the parquet scan; top-k is TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated scalar aggregate
# ---------------------------------------------------------------------------


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape via spark.sql: average yearly revenue lost if
    small-quantity orders (below 20% of the part's mean quantity) for
    one brand went unfilled. The correlated scalar AVG subquery is
    decorrelated by Catalyst into a per-partkey aggregate joined back
    to the filtered lineitem — one extra aggregate + join, not a
    per-row subquery.

    Determinism across engines: l_quantity is integer-valued, so
    SUM(double) is exact and order-independent; the threshold
    0.2*SUM/COUNT is one double divide + multiply, bit-identical in
    both engines, so the `<` filter can never flip on accumulation
    order."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                          / 7.0, 6) AS DOUBLE) AS avg_yearly
        FROM tpch_lineitem l
        JOIN tpch_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
          AND l.l_quantity < (
            SELECT 0.2 * (SUM(l2.l_quantity) / COUNT(*))
            FROM tpch_lineitem l2
            WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


ORACLE_TPCH_Q17 = """
SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                  / 7.0, 6) AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < (
    SELECT 0.2 * (SUM(l2.l_quantity) / COUNT(*))
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING gate on a fact aggregate
# ---------------------------------------------------------------------------


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with customer attached, top 100 by quantity. The
    HAVING-gated aggregate runs first and shrinks the fact side to the
    qualifying orders before any dimension join — at 100 TB that
    ordering (aggregate → filter → join) is the whole game, and it is
    what the declarative plan produces (partial+final hash aggregate,
    then joins on the survivors)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 130.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            F.col("o_orderkey"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(100)
    )


ORACLE_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice, sum_qty
FROM (
  SELECT l_orderkey,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
) b
JOIN orders   ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > 130.0
ORDER BY sum_qty DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# UNPIVOT — wide metrics to long (id, metric, value)
# ---------------------------------------------------------------------------


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational UNPIVOT: per-nation customer stats computed wide
    (n_customers, total_bal, max_bal) then melted to long
    (nationkey, metric, value) with DataFrame.unpivot — the inverse of
    q_pivot_status. Shuffle-free after the aggregate: unpivot is a
    narrow row-expansion (Expand node), 3 output rows per input row,
    no exchange. Values are cast to one double column, as unpivot
    requires a common type."""
    c = load(spark, sf_dir, "customer")
    wide = c.groupBy(F.col("c_nationkey").cast("long").alias("nationkey")).agg(
        F.count("*").cast("double").alias("n_customers"),
        F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("total_bal"),
        F.max(F.col("c_acctbal")).alias("max_bal"),
    )
    return wide.unpivot(
        ids=["nationkey"],
        values=["n_customers", "total_bal", "max_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


ORACLE_UNPIVOT_METRICS = """
WITH wide AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_bal,
         MAX(c_acctbal) AS max_bal
  FROM customer GROUP BY c_nationkey
)
SELECT nationkey, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT nationkey, 'total_bal'   AS metric, total_bal   AS value FROM wide
UNION ALL
SELECT nationkey, 'max_bal'     AS metric, max_bal     AS value FROM wide
"""


QUERIES = {
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q4": q_tpch_q4,
    "q_tpch_q10": q_tpch_q10,
    "q_tpch_q17": q_tpch_q17,
    "q_tpch_q18": q_tpch_q18,
    "q_unpivot_metrics": q_unpivot_metrics,
}

ORACLES = {
    "q_tpch_q3": ORACLE_TPCH_Q3,
    "q_tpch_q4": ORACLE_TPCH_Q4,
    "q_tpch_q10": ORACLE_TPCH_Q10,
    "q_tpch_q17": ORACLE_TPCH_Q17,
    "q_tpch_q18": ORACLE_TPCH_Q18,
    "q_unpivot_metrics": ORACLE_UNPIVOT_METRICS,
}
