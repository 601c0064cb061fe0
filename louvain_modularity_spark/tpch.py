"""Classic TPC-H-shape OLAP queries — all 22 published query shapes
(SURVEY.md §2.13/§2.17).

These exercise the decision-support shapes the relational core (§2.7)
doesn't pin down: full-scan wide aggregates (Q1/Q6), multi-way fact
joins feeding a top-k (Q3/Q10), snowflake joins with broadcast dim
tiers (Q5/Q7/Q8/Q9), correlated EXISTS / NOT EXISTS (Q4/Q21/Q22),
correlated scalar aggregates (Q2/Q17/Q20), global-share scalar gates
(Q11), conditional aggregation (Q12/Q14/Q19), outer-join re-aggregation
(Q13), CTE reuse with a scalar MAX (Q15), blacklist anti-joins (Q16), a
group-HAVING gate (Q18), and a relational UNPIVOT. Subquery-bearing
queries route through ``spark.sql`` so Catalyst's *decorrelation* is
what runs (EXISTS → left-semi hash join, per-group scalar agg →
aggregate + join; verified by plan guards in tests/test_tpch.py).

Adaptations to the driver testdata's column set (documented per query;
the SHAPES are the published ones): no partsupp table — the DISTINCT
(l_partkey, l_suppkey) pairs from lineitem stand in (Q2/Q16/Q20); no
supplycost/availqty — supplier balance / retail price / shipped
quantity stand in (Q2/Q9/Q20); no commit/receipt dates — shipdate >
orderdate + 60 days is the lateness predicate (Q4/Q21); no
shipmode/container/phone/comment — linestatus, brand/size brackets,
nation keys, and priority filters stand in (Q12/Q19/Q22/Q13); date
constants sit inside the data's 1995–2001 range.

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


# ---------------------------------------------------------------------------
# Q1 — pricing summary report: the canonical wide scan-aggregate
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-fact-scan pricing summary per
    (returnflag, linestatus) — sums, averages and row counts over every
    line shipped before a cutoff. The 100 TB benchmark workhorse: one
    parquet scan with the date predicate pushed down, partial+final
    hash aggregate over 6 groups, zero joins. Money math in the DECIMAL
    domain; averages computed as exact-decimal-sum / count, rounded in
    one place so both engines divide identical numerators."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-06-01")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(
                    _dec("l_extendedprice") * (1 - _dec("l_discount")) * (1 + _dec("l_tax"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 6).alias(
                "avg_qty"
            ),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count("*"), 6).alias(
                "avg_price"
            ),
            F.round(F.sum(_dec("l_discount")).cast("double") / F.count("*"), 6).alias(
                "avg_disc"
            ),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                      * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-table snowflake join
# ---------------------------------------------------------------------------


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the ordering customer
    and the line's supplier share the nation, restricted to one region
    and one order year. The deepest join tree in the pack: two fact
    tables plus four dimensions. 100 TB shape: region→nation→
    customer/supplier are broadcast tiers (25 + 5 rows and the pruned
    customer/supplier columns); the only big shuffle is
    lineitem⋈orders on orderkey; the c_nationkey = s_nationkey
    equality runs as a join-side filter, never a cross product."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_TPCH_Q5 = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure pushdown filter-aggregate
# ---------------------------------------------------------------------------


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue from discounted small-quantity lines in
    one ship year — a single filter-aggregate with zero joins and zero
    groups. The pushdown probe: all three predicates (date range,
    discount band, quantity cap) must reach the parquet scan, and the
    aggregate is one partial+final sum of a two-column projection —
    the minimal possible plan over a 100 TB fact table."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


ORACLE_TPCH_Q6 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q12 — priority-class line counts: conditional aggregation over a join
# ---------------------------------------------------------------------------


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per shipping class, how many lines belong to
    high- vs low-priority orders, over one ship year. The testdata has
    no l_shipmode column, so l_linestatus stands in as the class key —
    the shape (fact⋈fact join feeding CASE-split conditional sums) is
    the published one. 100 TB: the date filter prunes lineitem at the
    scan; the join shuffles on orderkey; the conditional sums collapse
    map-side to |classes| rows."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q14 — promotion effect: conditional share of revenue
# ---------------------------------------------------------------------------


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one ship-year's revenue from
    promo-type parts. One fact⋈dim join (part is the small side —
    broadcast) feeding a ratio of two conditional decimal sums; the
    division happens once, in the double domain, identically in both
    engines."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_TPCH_Q14 = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                        * (1 - CAST(l_discount AS DECIMAL(12,2)))
                                   ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunctive multi-bracket predicate
# ---------------------------------------------------------------------------


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from lines matching any of three
    brand/size/quantity brackets — the classic OR-of-ANDs predicate
    (no p_container column exists; brand+size+quantity carry the
    shape). The optimizer test: the common p_partkey join key must be
    extracted so the join runs once with the disjunction as a post-join
    filter (Catalyst factors the join predicate; part is broadcast),
    and the shared p_size/l_quantity lower bounds push to the scans."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(bracket).agg(
        F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


ORACLE_TPCH_Q19 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations: symmetric pair predicate
# ---------------------------------------------------------------------------


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume per (supplier nation,
    customer nation, ship year) for one nation pair, either direction.
    The two nation-dim joins are broadcasts with DIFFERENT aliases of
    the same 25-row table; the symmetric pair predicate is a post-join
    filter on the broadcast outputs; the only big shuffle remains
    lineitem⋈orders on orderkey."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 — national market share: conditional share over a snowflake join
# ---------------------------------------------------------------------------


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue in an
    economy part segment, per order year. The widest join in the pack
    (2 facts + part + customer + supplier + nation×2 + region); every
    dimension is broadcast-sized; the share is a ratio of conditional
    decimal sums divided once in the double domain."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type").startswith("ECONOMY"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


ORACLE_TPCH_Q8 = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
                           THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                * (1 - CAST(l_discount AS DECIMAL(12,2)))
                           ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND p_type LIKE 'ECONOMY%'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: left join + double aggregate
# ---------------------------------------------------------------------------


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by order count,
    INCLUDING zero-order customers — the left-outer-join-then-
    re-aggregate pattern (count(o_orderkey) counts non-null matches
    only, so unmatched customers land in the 0 bucket). The order-side
    filter (urgent orders stand in for the absent comment column;
    chosen so the 0 bucket is non-empty at every test scale — the
    bucket the outer join exists to produce) applies BEFORE the join,
    preserving outer-join zeros."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


ORACLE_TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN (
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  ) o ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier: aggregate CTE + scalar-max subquery
# ---------------------------------------------------------------------------


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue
    — an aggregate reused both as the join input and inside the scalar
    MAX subquery (the published view/CTE pattern). Revenue stays exact
    DECIMAL through the max comparison (no double ties), rounded only
    at emission. 100 TB: the revenue aggregate is one map-side-combined
    shuffle; the scalar max is a 1-row broadcast; supplier is a
    broadcast dim."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
          FROM tpch_lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
        FROM tpch_supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


ORACLE_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier: correlated MIN with join-back (partsupp stands
# in as the DISTINCT (l_partkey, l_suppkey) pairs from lineitem; supplier
# account balance stands in for supply cost)
# ---------------------------------------------------------------------------


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape via spark.sql: for each part of one size, the
    supplier(s) with the MINIMUM account balance among suppliers who
    have shipped it — the correlated-scalar-MIN + join-back pattern.
    Catalyst decorrelates the per-part MIN into an aggregate joined
    back on partkey; equality on the un-arithmetic double s_acctbal is
    engine-exact. Top-k has a full (balance, partkey, suppkey)
    tiebreak."""
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM tpch_lineitem)
        SELECT s_acctbal, s_name, p_partkey, p_type
        FROM tpch_part
        JOIN ps ON p_partkey = l_partkey
        JOIN tpch_supplier ON s_suppkey = l_suppkey
        WHERE p_size = 25
          AND s_acctbal = (
            SELECT MIN(s2.s_acctbal)
            FROM ps ps2 JOIN tpch_supplier s2 ON s2.s_suppkey = ps2.l_suppkey
            WHERE ps2.l_partkey = p_partkey
          )
        ORDER BY s_acctbal DESC, p_partkey, s_name
        LIMIT 100
        """
    )


ORACLE_TPCH_Q2 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT s_acctbal, s_name, p_partkey, p_type
FROM part
JOIN ps ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size = 25
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    WHERE ps2.l_partkey = p_partkey
  )
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year (retail price stands in
# for supply cost)
# ---------------------------------------------------------------------------


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for a
    part-type segment, profit = revenue − cost, cost stood in by
    p_retailprice·quantity/2 (no supplycost column). All dims
    broadcast; lineitem⋈orders is the one big shuffle; year extraction
    groups into |nations|·|years| rows via map-side combine."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type").startswith("STANDARD"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem")
    profit = _dec("l_extendedprice") * (1 - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") * F.lit("0.5").cast("decimal(3,2)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


ORACLE_TPCH_Q9 = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                      - CAST(p_retailprice AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(0.5 AS DECIMAL(3,2))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type LIKE 'STANDARD%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q11 — important parts: aggregate gated by a global-share scalar
# subquery (lineitem revenue stands in for partsupp stock value)
# ---------------------------------------------------------------------------


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape via spark.sql: parts whose revenue exceeds a
    fixed fraction of GLOBAL revenue — a grouped aggregate filtered
    against a scalar aggregate subquery over the same fact. Both sums
    stay exact DECIMAL so the share comparison cannot flip between
    engines; the scalar is a 1-row broadcast at scale."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_partkey,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2)
                    AS DOUBLE) AS part_value
        FROM tpch_lineitem
        GROUP BY l_partkey
        HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2))))
             > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                           * (1 - CAST(l_discount AS DECIMAL(12,2))))
                FROM tpch_lineitem)
               * (1.3 / (SELECT COUNT(DISTINCT l_partkey) FROM tpch_lineitem))
        """
    )


ORACLE_TPCH_Q11 = """
SELECT l_partkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2)
            AS DOUBLE) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(12,2))))
     > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2))))
        FROM lineitem)
       * (1.3 / (SELECT COUNT(DISTINCT l_partkey) FROM lineitem))
"""


# ---------------------------------------------------------------------------
# Q16 — supplier counts per part segment with a blacklist anti-join
# (lineitem pairs stand in for partsupp; negative balance stands in
# for the complaints blacklist)
# ---------------------------------------------------------------------------


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, size)
    excluding one brand and a supplier blacklist. The NOT-IN lowers to
    a broadcast anti-join (blacklist is dimension-sized); the count is
    COUNT(DISTINCT) after a distinct pair projection."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#11")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        ps.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_TPCH_Q16 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


# ---------------------------------------------------------------------------
# Q20 — dominant suppliers: nested IN chain over a correlated-share
# aggregate (shipped quantity stands in for available stock)
# ---------------------------------------------------------------------------


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape via spark.sql: suppliers who shipped more than
    half of some part's total year volume — a supplier semi-join into
    a grouped HAVING whose threshold is a correlated scalar aggregate.
    Quantities are integer-valued doubles: both sums are exact, the
    0.5 factor is a power of two, so the comparison is engine-exact.
    Catalyst decorrelates the inner SUM to a per-part aggregate joined
    on partkey; the outer IN becomes a left-semi join."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_acctbal
        FROM tpch_supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM tpch_lineitem l1
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_partkey, l_suppkey
          HAVING SUM(l_quantity) > 0.5 * (
            SELECT SUM(l2.l_quantity) FROM tpch_lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
              AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l2.l_shipdate <  TIMESTAMP '1998-01-01'
          )
        )
        """
    )


ORACLE_TPCH_Q20 = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem l1
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
  HAVING SUM(l_quantity) > 0.5 * (
    SELECT SUM(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
      AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l2.l_shipdate <  TIMESTAMP '1998-01-01'
  )
)
"""


# ---------------------------------------------------------------------------
# Q21 — waiting suppliers: EXISTS + NOT EXISTS double correlation
# (shipdate > orderdate + 60 days stands in for the missing
# commit/receipt dates)
# ---------------------------------------------------------------------------


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape via spark.sql: suppliers who were the ONLY late
    supplier on a finished multi-supplier order — the double-correlated
    EXISTS (another supplier participated) + NOT EXISTS (no other
    supplier was late) pattern. Catalyst turns the pair into a
    left-semi and a left-anti join on orderkey; no per-row subquery
    survives in the physical plan."""
    _views(spark, sf_dir, "lineitem", "orders", "supplier")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM tpch_supplier
        JOIN tpch_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN tpch_orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
          AND EXISTS (
            SELECT 1 FROM tpch_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM tpch_lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """
    )


ORACLE_TPCH_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: anti-join + scalar-average gate
# (nation key stands in for the phone country code; 'no urgent orders'
# stands in for 'no orders' so the anti-join side is non-empty)
# ---------------------------------------------------------------------------


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape via spark.sql: per country-group, count and
    total balance of above-average-balance customers who have placed
    no urgent order — scalar AVG subquery gate + NOT EXISTS anti-join.
    The average threshold is computed as exact-decimal-sum / count
    (one double divide) so the strict inequality cannot flip between
    engines; the anti-join runs on the orders key."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_nationkey AS cntrycode,
               COUNT(*) AS numcust,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS totacctbal
        FROM tpch_customer c
        WHERE c_nationkey IN (1, 2, 3, 4, 5)
          AND c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(*)
            FROM tpch_customer c2
            WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 2, 3, 4, 5)
          )
          AND NOT EXISTS (
            SELECT 1 FROM tpch_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
          )
        GROUP BY c_nationkey
        """
    )


ORACLE_TPCH_Q22 = """
SELECT c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS totacctbal
FROM customer c
WHERE c_nationkey IN (1, 2, 3, 4, 5)
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*)
    FROM customer c2
    WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 2, 3, 4, 5)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


QUERIES = {
    "q_tpch_q1": q_tpch_q1,
    "q_tpch_q2": q_tpch_q2,
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q4": q_tpch_q4,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q6": q_tpch_q6,
    "q_tpch_q7": q_tpch_q7,
    "q_tpch_q8": q_tpch_q8,
    "q_tpch_q9": q_tpch_q9,
    "q_tpch_q11": q_tpch_q11,
    "q_tpch_q10": q_tpch_q10,
    "q_tpch_q12": q_tpch_q12,
    "q_tpch_q13": q_tpch_q13,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q15": q_tpch_q15,
    "q_tpch_q16": q_tpch_q16,
    "q_tpch_q17": q_tpch_q17,
    "q_tpch_q18": q_tpch_q18,
    "q_tpch_q19": q_tpch_q19,
    "q_tpch_q20": q_tpch_q20,
    "q_tpch_q21": q_tpch_q21,
    "q_tpch_q22": q_tpch_q22,
    "q_unpivot_metrics": q_unpivot_metrics,
}

ORACLES = {
    "q_tpch_q1": ORACLE_TPCH_Q1,
    "q_tpch_q2": ORACLE_TPCH_Q2,
    "q_tpch_q3": ORACLE_TPCH_Q3,
    "q_tpch_q4": ORACLE_TPCH_Q4,
    "q_tpch_q5": ORACLE_TPCH_Q5,
    "q_tpch_q6": ORACLE_TPCH_Q6,
    "q_tpch_q7": ORACLE_TPCH_Q7,
    "q_tpch_q8": ORACLE_TPCH_Q8,
    "q_tpch_q9": ORACLE_TPCH_Q9,
    "q_tpch_q11": ORACLE_TPCH_Q11,
    "q_tpch_q10": ORACLE_TPCH_Q10,
    "q_tpch_q12": ORACLE_TPCH_Q12,
    "q_tpch_q13": ORACLE_TPCH_Q13,
    "q_tpch_q14": ORACLE_TPCH_Q14,
    "q_tpch_q15": ORACLE_TPCH_Q15,
    "q_tpch_q16": ORACLE_TPCH_Q16,
    "q_tpch_q17": ORACLE_TPCH_Q17,
    "q_tpch_q18": ORACLE_TPCH_Q18,
    "q_tpch_q19": ORACLE_TPCH_Q19,
    "q_tpch_q20": ORACLE_TPCH_Q20,
    "q_tpch_q21": ORACLE_TPCH_Q21,
    "q_tpch_q22": ORACLE_TPCH_Q22,
    "q_unpivot_metrics": ORACLE_UNPIVOT_METRICS,
}
