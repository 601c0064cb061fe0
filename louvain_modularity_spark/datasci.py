"""Data-science / evaluation / reconciliation primitives (SURVEY.md
§2.20, §2.27, §2.30): mergeable frequency and distinct sketches,
weighted order statistics, the classical hypothesis-test family,
quantile normalization, ranking-quality metrics, time-decayed
counters, entity-resolution blocking, customer segmentation, and
snapshot reconciliation.

Every query here follows the repo's exactness conventions: integer /
DECIMAL arithmetic wherever a sum crosses an engine boundary, IEEE
exactly-rounded ops (+ − × ÷) for anything that must hash-match
DuckDB bit-for-bit, and a single trailing ROUND only where a final
scalar division is displayed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .session import fan_out, lineage_cut

from .kernels import (
    _ntile_expr,
    chunked_global_rank,
    chunked_group_rank,
    chunked_running_sum,
)
from .sources import load

# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

#: sketch geometry: depth d=4 pairwise-independent-ish hash rows, width 256
CM_DEPTH = 4
CM_WIDTH = 256
CM_PRIME = 2_147_483_647  # 2^31 − 1; (key+1)·A + B stays well inside int64
CM_A = [1103515245, 1299709, 104729, 7919]
CM_B = [12345, 7, 27644437, 104723]


def _cm_slot(key_col, i: int):
    """Row-i Count-Min slot: ((k+1)·A_i + B_i) mod P mod W — carter-
    wegman style universal hash spelled in +·% only, so Spark and
    DuckDB produce identical int64 results."""
    return (
        (key_col + F.lit(1)) * F.lit(CM_A[i]) + F.lit(CM_B[i])
    ) % F.lit(CM_PRIME) % F.lit(CM_WIDTH)


def q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over lineitem part frequencies with exact
    error accounting: build the d×w counter matrix, then report the
    sketch estimate vs the true count for the top-10 parts (count
    desc, key asc) — est ≥ true always (one-sided error).

    100 TB shape: per-key counts collapse map-side in ONE groupBy;
    the sketch is then d·|keys| tiny rows into a ≤ d·w counter table
    (a mergeable sketch: counter matrices from separate corpora ADD).
    The probe side joins the ≤1024-row counter table broadcast — the
    corpus is scanned once, checkpointed, and reused for truth and
    sketch. At 100 TB the modulus is applied per-term before the
    multiply to stay in int64 for arbitrary key magnitudes.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    kc = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .transform(lineage_cut)
    )
    hashed = kc.select(
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("depth"),
                        _cm_slot(F.col("l_partkey"), i).alias("slot"),
                    )
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("h"),
    )
    counters = hashed.groupBy("h.depth", "h.slot").agg(F.sum("cnt").alias("c"))
    top10 = kc.orderBy(F.desc("cnt"), "l_partkey").limit(10)
    probes = top10.select(
        "l_partkey",
        F.col("cnt").alias("true_cnt"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("depth"),
                        _cm_slot(F.col("l_partkey"), i).alias("slot"),
                    )
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("h"),
    )
    return (
        probes.join(
            F.broadcast(counters),
            (probes["h.depth"] == counters["depth"])
            & (probes["h.slot"] == counters["slot"]),
        )
        .groupBy("l_partkey", "true_cnt")
        .agg(F.min("c").alias("est_cnt"))
        .select(
            "l_partkey",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
        )
    )


_CM_A_SQL = "[" + ",".join(str(a) for a in CM_A) + "]"
_CM_B_SQL = "[" + ",".join(str(b) for b in CM_B) + "]"

ORACLE_COUNT_MIN = f"""
WITH kc AS (
  SELECT l_partkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1
),
depths AS (SELECT unnest([1,2,3,4]) AS depth),
counters AS (
  SELECT depth,
         ((((k + 1) * ({_CM_A_SQL})[depth] + ({_CM_B_SQL})[depth])
           % {CM_PRIME}) % {CM_WIDTH}) AS slot,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM kc CROSS JOIN depths
  GROUP BY 1, 2
),
top10 AS (SELECT k, cnt FROM kc ORDER BY cnt DESC, k LIMIT 10)
SELECT t.k                        AS l_partkey,
       t.cnt                      AS true_cnt,
       MIN(c.c)                   AS est_cnt,
       MIN(c.c) - t.cnt           AS overcount
FROM top10 t
CROSS JOIN depths d
JOIN counters c
  ON c.depth = d.depth
 AND c.slot = ((((t.k + 1) * ({_CM_A_SQL})[d.depth] + ({_CM_B_SQL})[d.depth])
                % {CM_PRIME}) % {CM_WIDTH})
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Weighted median
# ---------------------------------------------------------------------------


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest price whose cumulative quantity reaches half the group's
    total (the exact weighted-percentile definition, integer compare
    2·cum ≥ tot so no division ever happens).

    100 TB shape: the scan collapses to one row per (flag, price)
    map-side; the cumulative window then runs over the collapsed
    value-histogram (bounded by distinct prices), not the corpus —
    the same histogram-first trick as q_equi_depth_hist.
    """
    li = load(spark, sf_dir, "lineitem")
    hist = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("w")
    )
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_win = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("w").over(win).alias("cum"),
        F.sum("w").over(tot_win).alias("tot"),
    )
    return (
        cum.filter(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("wmedian"),
            F.min("tot").alias("total_qty"),
        )
    )


ORACLE_WEIGHTED_MEDIAN = """
WITH hist AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM hist
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS wmedian,
       MIN(tot)             AS total_qty
FROM cum
WHERE 2 * cum >= tot
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Ranking quality: Mann-Whitney AUC
# ---------------------------------------------------------------------------


def q_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected ROC AUC of the event ``value`` as a score for
    predicting purchases, via the Mann-Whitney U statistic on average
    ranks. All arithmetic stays in integers (U is doubled so tie
    mid-ranks are whole) until the single final division.

    100 TB shape: the corpus collapses to a per-distinct-score
    histogram (one map-side-combined groupBy); the rank walk is a
    window over the histogram, not the events; the final reduce is a
    3-scalar aggregate. No global sort of raw rows ever happens.
    """
    e = load(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").cast("long").alias("pos")
    )
    g = e.groupBy("value").agg(
        F.count("*").alias("n"), F.sum("pos").alias("p")
    )
    win = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "n",
        "p",
        F.coalesce(F.sum("n").over(win), F.lit(0)).alias("cum_before"),
    )
    agg = ranked.agg(
        F.sum("p").alias("n_pos"),
        (F.sum("n") - F.sum("p")).alias("n_neg"),
        F.sum(
            F.col("p") * (F.lit(2) * F.col("cum_before") + F.col("n") + F.lit(1))
        ).alias("u2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("u2") - F.col("n_pos") * (F.col("n_pos") + F.lit(1)))
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


ORACLE_AUC_RANK = """
WITH g AS (
  SELECT value,
         count(*) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM events GROUP BY 1
),
ranked AS (
  SELECT n, p,
         CAST(COALESCE(SUM(n) OVER (ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM g
),
agg AS (
  SELECT CAST(SUM(p) AS BIGINT)          AS n_pos,
         CAST(SUM(n) - SUM(p) AS BIGINT) AS n_neg,
         CAST(SUM(p * (2 * cum_before + n + 1)) AS BIGINT) AS u2
  FROM ranked
)
SELECT n_pos, n_neg,
       ROUND((u2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg), 6) AS auc
FROM agg
"""


# ---------------------------------------------------------------------------
# Time-decayed popularity counter
# ---------------------------------------------------------------------------

#: decay time constant: 7 days in microseconds
DECAY_TAU_DAYS = 7.0


def q_decayed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed popularity score per event type: each event
    contributes 1/(1 + Δdays/τ) where Δ is its age vs the corpus
    max timestamp (τ = 7 days). A hyperbolic kernel is used instead
    of exp() because + − × ÷ are IEEE exactly-rounded and therefore
    bit-identical across engines, while libm exp/pow are only
    faithfully rounded; an exponential kernel drops in by swapping
    one expression. Per-row weights are quantized to DECIMAL(16,12)
    so the corpus sum is order-independent (exact decimal addition),
    immune to partial-aggregation ordering at any scale.

    100 TB shape: one scalar max broadcast back over the scan, one
    map-side-combined groupBy — the classic "decayed counter" that
    replaces windowed re-aggregation of full history.
    """
    e = load(spark, sf_dir, "events")
    tmax = e.agg(F.max("ts_us").alias("tmax"))
    delta_days = (F.col("tmax") - F.col("ts_us")) / F.lit(86400.0 * 1e6)
    w = F.lit(1.0) / (F.lit(1.0) + delta_days / F.lit(DECAY_TAU_DAYS))
    return (
        e.crossJoin(F.broadcast(tmax))
        .select("event_type", F.round(w, 12).cast("decimal(16,12)").alias("wq"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("wq").cast("double"), 6).alias("decayed_score"),
        )
    )


ORACLE_DECAYED_COUNT = f"""
WITH t AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events)
SELECT event_type,
       count(*) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(
           1.0 / (1.0 + ((t.tmax - epoch_us(ts)) / 86400000000.0)
                         / {DECAY_TAU_DAYS}), 12) AS DECIMAL(16,12))) AS DOUBLE), 6)
         AS decayed_score
FROM events CROSS JOIN t
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Sorted-neighborhood entity-resolution blocking (Hernández & Stolfo 1995)
# ---------------------------------------------------------------------------

#: neighborhood width: each record pairs with its w successors in-block
SNM_WINDOW = 3
#: edit-distance acceptance gate
SNM_MAX_DIST = 1


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution candidates over customer
    names: sort within hash-friendly blocks (the name's leading digit
    prefix), slide a w=3 window via lead(), keep pairs within
    levenshtein distance 1. Output: candidate pair keys + distance.

    100 TB shape: the sort is PER BLOCK (a window partitioned by the
    sort-key prefix), never a global single-partition sort; the
    candidate set is O(n·w) rather than the O(n²) all-pairs compare.
    Cross-block boundary pairs are traded away exactly as in the
    published multi-pass SNM method (a second pass with a shifted
    block key would recover them).
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 10, 7).alias("blk")
    )
    win = Window.partitionBy("blk").orderBy("c_name")
    leads = c.select(
        "c_custkey",
        "c_name",
        *[
            F.lead("c_custkey", i).over(win).alias(f"k{i}")
            for i in range(1, SNM_WINDOW + 1)
        ],
        *[
            F.lead("c_name", i).over(win).alias(f"n{i}")
            for i in range(1, SNM_WINDOW + 1)
        ],
    )
    with_leads = leads.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"k{i}").alias("b_key"),
                        F.col(f"n{i}").alias("b_name"),
                    )
                    for i in range(1, SNM_WINDOW + 1)
                ]
            )
        ).alias("nb"),
    )
    return (
        with_leads.filter(F.col("nb.b_key").isNotNull())
        .select(
            F.col("c_custkey").alias("a_key"),
            F.col("nb.b_key").alias("b_key"),
            F.levenshtein("c_name", F.col("nb.b_name")).alias("dist"),
        )
        .filter(F.col("dist") <= SNM_MAX_DIST)
    )


ORACLE_SORTED_NEIGHBORHOOD = f"""
WITH c AS (
  SELECT c_custkey, c_name, substring(c_name, 10, 7) AS blk FROM customer
),
leads AS (
  SELECT c_custkey AS a_key, c_name AS a_name,
         lead(c_custkey, 1) OVER w AS k1, lead(c_name, 1) OVER w AS n1,
         lead(c_custkey, 2) OVER w AS k2, lead(c_name, 2) OVER w AS n2,
         lead(c_custkey, 3) OVER w AS k3, lead(c_name, 3) OVER w AS n3
  FROM c
  WINDOW w AS (PARTITION BY blk ORDER BY c_name)
),
pairs AS (
  SELECT a_key, a_name, k1 AS b_key, n1 AS b_name FROM leads
  UNION ALL SELECT a_key, a_name, k2, n2 FROM leads
  UNION ALL SELECT a_key, a_name, k3, n3 FROM leads
)
SELECT a_key, b_key,
       CAST(levenshtein(a_name, b_name) AS INTEGER) AS dist
FROM pairs
WHERE b_key IS NOT NULL AND levenshtein(a_name, b_name) <= {SNM_MAX_DIST}
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency / frequency / monetary
    from the orders fact, quintile scores (ntile with a custkey
    tiebreak so every rank is total-ordered and engine-independent),
    a rule-based segment label, and a per-segment rollup.

    100 TB shape (r7): the fact collapses to one row per customer
    first (map-side combine); each quintile then comes from the
    DISTRIBUTED rank kernel (chunked_global_rank: range chunks +
    prefix-offset stitch) and the exact-NTILE integer formula — at
    10⁹ customers no single sorted partition ever holds the dimension
    (the previous formulation's three global ntile windows each did).
    Monetary is summed as DECIMAL — exact and order-independent.
    """
    o = load(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    cust = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.min("maxd"), F.max("o_orderdate")).alias("rec_days"),
            F.count("*").alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("mon"),
        )
    )
    n_cust = cust.agg(F.count("*").alias("n_cust"))
    ranked = chunked_global_rank(cust, [F.asc("rec_days"), F.asc("o_custkey")], "rn_r")
    ranked = chunked_global_rank(
        ranked, [F.desc("freq"), F.asc("o_custkey")], "rn_f"
    )
    ranked = chunked_global_rank(
        ranked, [F.desc("mon"), F.asc("o_custkey")], "rn_m"
    )
    n = F.col("n_cust")
    scored = ranked.crossJoin(F.broadcast(n_cust)).select(
        "rec_days",
        "freq",
        "mon",
        _ntile_expr(F.col("rn_r"), n, 5).alias("r_q"),
        _ntile_expr(F.col("rn_f"), n, 5).alias("f_q"),
        _ntile_expr(F.col("rn_m"), n, 5).alias("m_q"),
    )
    seg = (
        F.when(
            (F.col("r_q") <= 2) & (F.col("f_q") <= 2) & (F.col("m_q") <= 2),
            "champion",
        )
        .when((F.col("r_q") >= 4) & ((F.col("f_q") <= 2) | (F.col("m_q") <= 2)), "at_risk")
        .when(F.col("f_q") <= 2, "loyal")
        .when(F.col("m_q") <= 2, "big_spender")
        .when(F.col("r_q") >= 4, "hibernating")
        .otherwise("regular")
    )
    return (
        scored.select(seg.alias("segment"), "rec_days", "freq", "mon")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("rec_days"), 2).alias("avg_recency_days"),
            F.round(F.avg("freq"), 2).alias("avg_frequency"),
            F.sum("mon").cast("double").alias("total_monetary"),
        )
    )


ORACLE_RFM = """
WITH t AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
cust AS (
  SELECT o_custkey,
         CAST(datediff('day', MAX(o_orderdate), MIN(t.maxd)) AS INTEGER) AS rec_days,
         count(*) AS freq,
         SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS mon
  FROM orders CROSS JOIN t
  GROUP BY 1
),
scored AS (
  SELECT rec_days, freq, mon,
         ntile(5) OVER (ORDER BY rec_days, o_custkey)     AS r_q,
         ntile(5) OVER (ORDER BY freq DESC, o_custkey)    AS f_q,
         ntile(5) OVER (ORDER BY mon DESC, o_custkey)     AS m_q
  FROM cust
),
seg AS (
  SELECT CASE
           WHEN r_q <= 2 AND f_q <= 2 AND m_q <= 2 THEN 'champion'
           WHEN r_q >= 4 AND (f_q <= 2 OR m_q <= 2) THEN 'at_risk'
           WHEN f_q <= 2 THEN 'loyal'
           WHEN m_q <= 2 THEN 'big_spender'
           WHEN r_q >= 4 THEN 'hibernating'
           ELSE 'regular'
         END AS segment,
         rec_days, freq, mon
  FROM scored
)
SELECT segment,
       count(*) AS n_customers,
       ROUND(AVG(rec_days), 2)          AS avg_recency_days,
       ROUND(AVG(freq), 2)              AS avg_frequency,
       CAST(SUM(mon) AS DOUBLE)         AS total_monetary
FROM seg
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Snapshot diff / reconciliation
# ---------------------------------------------------------------------------


def q_diff_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconciliation between two derived order snapshots
    (deterministic mutations of the same fixture: A drops keys ≡3
    mod 97; B drops keys ≡5 mod 89, reclassifies priority on keys ≡0
    mod 11 and bumps price by 1.00 on keys ≡0 mod 13): classify every
    key as added / removed / changed / same and count per-column
    drifts — the data-reconciliation shape behind CDC validation and
    blue-green migration checks.

    100 TB shape: ONE full outer join on the snapshot key (both sides
    shuffle-partitioned on it — bucketed layouts make it co-located),
    then a map-side-combined rollup; per-column compares are plain
    projections. Price compares in DECIMAL so equality is exact.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
    )
    a = o.filter(F.col("o_orderkey") % 97 != 3).select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderpriority").alias("a_prio"),
        F.col("price").alias("a_price"),
    )
    b = o.filter(F.col("o_orderkey") % 89 != 5).select(
        F.col("o_orderkey").alias("b_key"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("9-RECLASS"))
        .otherwise(F.col("o_orderpriority"))
        .alias("b_prio"),
        (
            F.col("price")
            + F.when(F.col("o_orderkey") % 13 == 0, F.lit(1.00)).otherwise(
                F.lit(0.00)
            ).cast("decimal(4,2)")
        ).alias("b_price"),
    )
    j = a.join(b, a.a_key == b.b_key, "full_outer")
    prio_chg = (
        F.col("a_key").isNotNull()
        & F.col("b_key").isNotNull()
        & (F.col("a_prio") != F.col("b_prio"))
    ).cast("long")
    price_chg = (
        F.col("a_key").isNotNull()
        & F.col("b_key").isNotNull()
        & (F.col("a_price") != F.col("b_price"))
    ).cast("long")
    cls = (
        F.when(F.col("a_key").isNull(), "added")
        .when(F.col("b_key").isNull(), "removed")
        .when((prio_chg + price_chg) > 0, "changed")
        .otherwise("same")
    )
    return (
        j.select(
            cls.alias("diff_class"),
            prio_chg.alias("pc"),
            price_chg.alias("vc"),
        )
        .groupBy("diff_class")
        .agg(
            F.count("*").alias("n"),
            F.sum("pc").alias("priority_changes"),
            F.sum("vc").alias("price_changes"),
        )
    )


ORACLE_DIFF_SNAPSHOT = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(14,2)) AS price
  FROM orders
),
a AS (
  SELECT o_orderkey AS a_key, o_orderpriority AS a_prio, price AS a_price
  FROM o WHERE o_orderkey % 97 != 3
),
b AS (
  SELECT o_orderkey AS b_key,
         CASE WHEN o_orderkey % 11 = 0 THEN '9-RECLASS'
              ELSE o_orderpriority END AS b_prio,
         price + CASE WHEN o_orderkey % 13 = 0
                      THEN CAST(1.00 AS DECIMAL(4,2))
                      ELSE CAST(0.00 AS DECIMAL(4,2)) END AS b_price
  FROM o WHERE o_orderkey % 89 != 5
),
j AS (
  SELECT a_key, b_key,
         CASE WHEN a_key IS NOT NULL AND b_key IS NOT NULL
                   AND a_prio != b_prio THEN 1 ELSE 0 END AS pc,
         CASE WHEN a_key IS NOT NULL AND b_key IS NOT NULL
                   AND a_price != b_price THEN 1 ELSE 0 END AS vc
  FROM a FULL OUTER JOIN b ON a_key = b_key
)
SELECT CASE WHEN a_key IS NULL THEN 'added'
            WHEN b_key IS NULL THEN 'removed'
            WHEN pc + vc > 0 THEN 'changed'
            ELSE 'same' END AS diff_class,
       count(*) AS n,
       CAST(SUM(pc) AS BIGINT) AS priority_changes,
       CAST(SUM(vc) AS BIGINT) AS price_changes
FROM j
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Distributed PCA (one-pass Gram aggregate + driver eigendecomposition)
# ---------------------------------------------------------------------------


def _gram_partials(emb: DataFrame, dim: int) -> list:
    """Per-partition (n, Σx, ΣxxᵀT flattened) partial moments via
    mapInPandas — the canonical tall-skinny covariance shape: the
    corpus is scanned once, each partition reduces to 1 + d + d² ≈ 4 KB
    of state, and only #partitions such rows reach the driver."""
    import pandas as pd

    schema = "n long, s array<double>, g array<double>"

    def part(batches):
        import numpy as np

        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return emb.select("embedding").mapInPandas(part, schema).collect()


def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed 2-component PCA of the embeddings table: one
    map-side pass reduces the corpus to per-partition (count, sum,
    Gram) moments; the driver combines them, eigendecomposes the d×d
    covariance (d=64 — trivially driver-sized at ANY corpus scale),
    pins each component's sign (largest-|loading| coordinate made
    positive), and the components are broadcast back as plan literals
    for one projection scan. Output: (vec_id, pc1, pc2).

    rows-only: eigenvectors aren't SQL-expressible; a numpy golden in
    tests/test_llm_ops.py checks the projections against single-node
    PCA and the explained-variance ordering.

    100 TB shape: this IS the large-n/small-d PCA published as
    tall-skinny covariance — network traffic is #partitions·(d²+d)
    doubles, the corpus never shuffles, and the projection pass is a
    shuffle-free map. For d where d² no longer fits (≥ ~10⁴), swap the
    driver eig for distributed randomized SVD.
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    parts = _gram_partials(emb, dim)
    n = sum(p["n"] for p in parts)
    s = np.sum([np.array(p["s"]) for p in parts], axis=0)
    g = np.sum([np.array(p["g"]).reshape(dim, dim) for p in parts], axis=0)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comps = []
    for k in range(2):
        v = evecs[:, order[k]]
        v = v * np.sign(v[int(np.argmax(np.abs(v)))])
        comps.append(v)

    def proj(v):
        centered = F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.array(*[F.lit(float(m)) for m in mu]),
            lambda x, m: x - m,
        )
        return F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in v]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return emb.select(
        "vec_id",
        F.round(proj(comps[0]), 6).alias("pc1"),
        F.round(proj(comps[1]), 6).alias("pc2"),
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN (Jégou, Douze & Schmid 2011)
# ---------------------------------------------------------------------------

#: PQ geometry: M subspaces of SUB dims each, K codewords per subspace
PQ_M = 8
PQ_K = 16
#: codebooks train on this deterministic id-prefix sample
PQ_TRAIN_IDS = 256
#: queries = this id prefix; recall measured at top-10
PQ_QUERIES = 5
PQ_TOPK = 10


def _pq_codebooks(emb: DataFrame, dim: int, m: int = PQ_M, kk: int = PQ_K):
    """Train per-subspace codebooks with 5 Lloyd iterations of numpy
    k-means on the vec_id < PQ_TRAIN_IDS sample (init = the K first
    sample rows). Deterministic: fixed sample, fixed iteration count,
    fixed init order — identical across runs, engines, partitionings."""
    import numpy as np

    sub = dim // m
    rows = (
        emb.filter(F.col("vec_id") < PQ_TRAIN_IDS)
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    books = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        c = xs[:kk].copy()
        for _ in range(5):
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for k in range(kk):
                mk = xs[a == k]
                if len(mk):
                    c[k] = mk.mean(axis=0)
        books.append(c)
    return books


def q_pq_ann(
    spark: SparkSession, sf_dir: str, m: int = PQ_M, kk: int = PQ_K
) -> DataFrame:
    """Product-quantization ANN with measured recall: train M=8
    per-subspace K=16 codebooks on a bounded deterministic sample,
    encode the corpus to 8 one-byte codes (64× memory compression of
    the float32 vectors), answer the first-5-vector queries by
    asymmetric-distance (ADC) lookup-table sums, and report
    recall@10 of the PQ candidate list against the exact L2 top-10
    computed in the same scan. Output: (query_id, recall_at_10).

    Oracle: _oracle_pq_ann (r13) — the deterministic Lloyd training
    unrolls as chained CTEs; every float hazard is an argmin/rank
    decision and the margins are audited in
    tests/test_llm_ops.py::test_pq_ann_oracle_margins. Recall ≥
    floor, code-range, and determinism invariants remain pinned in
    tests/test_llm_ops.py.

    100 TB shape: encoding is one shuffle-free scan against K·d
    broadcast codebook literals (same layout as q_kmeans); each query
    ships only an M×K LUT (128 doubles); candidate ranking is a
    per-query TakeOrdered over est-distance — the published IVF-PQ
    scale path adds the coarse IVF stage already implemented in
    q_ann_ivf. The exact arm stays the verification baseline.
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    sub = dim // m
    books = _pq_codebooks(emb, dim, m, kk)
    qrows = (
        emb.filter(F.col("vec_id") < PQ_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qrows.sort(key=lambda r: r["vec_id"])
    queries = [(int(r["vec_id"]), np.array(list(r["embedding"]), dtype=np.float64)) for r in qrows]

    def code_col(j: int):
        sl = F.slice(F.col("embedding").cast("array<double>"), j * sub + 1, sub)
        cands = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sl,
                            F.array(*[F.lit(float(v)) for v in books[j][k]]),
                            lambda x, c: (x - c) * (x - c),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(k).alias("k"),
                )
                for k in range(kk)
            ]
        )
        return F.array_min(cands).getField("k")

    enc = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("x"),
        *[code_col(j).alias(f"c{j}") for j in range(m)],
    )

    per_query = []
    for qid, qv in queries:
        lut = [
            [float(((books[j][k] - qv[j * sub : (j + 1) * sub]) ** 2).sum()) for k in range(kk)]
            for j in range(m)
        ]
        est = sum(
            F.element_at(
                F.array(*[F.lit(v) for v in lut[j]]), F.col(f"c{j}") + 1
            )
            for j in range(m)
        )
        exact = F.aggregate(
            F.zip_with(
                F.col("x"),
                F.array(*[F.lit(float(v)) for v in qv]),
                lambda x, q: (x - q) * (x - q),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        per_query.append(
            enc.select(
                F.lit(qid).alias("query_id"),
                "vec_id",
                est.alias("est"),
                exact.alias("exact"),
            )
        )
    scored = per_query[0]
    for df in per_query[1:]:
        scored = scored.unionByName(df)
    w_est = Window.partitionBy("query_id").orderBy("est", "vec_id")
    w_ex = Window.partitionBy("query_id").orderBy("exact", "vec_id")
    flagged = scored.select(
        "query_id",
        (F.row_number().over(w_est) <= PQ_TOPK).cast("int").alias("in_pq"),
        (F.row_number().over(w_ex) <= PQ_TOPK).cast("int").alias("in_exact"),
    )
    return (
        flagged.groupBy("query_id")
        .agg(
            (
                F.sum(F.col("in_pq") * F.col("in_exact")) / F.lit(float(PQ_TOPK))
            ).alias("recall_at_10")
        )
    )


#: the shipped embeddings tables are d=64; the static oracle SQL pins
#: this (the query discovers dim at runtime). Guarded loudly:
#: tests/test_llm_ops.py::test_pq_ann_oracle_margins asserts the
#: fixture dim equals this constant before trusting the oracle.
PQ_DIM = 64


def _oracle_pq_ann(m: int = PQ_M, kk: int = PQ_K, iters: int = 5) -> str:
    """Unrolled-CTE oracle for q_pq_ann (r13, the §2.37 technique
    applied to sketch TRAINING): the 5 Lloyd iterations of the
    per-subspace codebook k-means are deterministic (fixed vec_id<256
    sample, init = the 16 smallest-vec_id rows, argmin ties to the
    lowest codeword — numpy argmin keeps the first minimum, mirrored
    as ROW_NUMBER ORDER BY d, k; empty clusters keep their previous
    centroid, mirrored as COALESCE over a LEFT JOIN), so each
    iteration is a pure function of the previous codebook and the
    fixed budget unrolls like LPA's rounds.

    Float story — decision-level, audited, not bitwise-assumed: the
    engine trains in numpy (pairwise-summation means) while this SQL
    trains in DuckDB (sequential AVG), so centroid low bits MAY
    differ; every place a low-bit difference could change the OUTPUT
    is an argmin/rank decision, and
    tests/test_llm_ops.py::test_pq_ann_oracle_margins recomputes all
    of them (5 iterations x 256 training assignments x 8 subspaces,
    the corpus encode argmins, and the est/exact top-10 rank
    boundaries) asserting each margin clears float noise by >1e-9 or
    is an exact tie between identical candidates (which both engines
    break identically, by codeword id / vec_id). The exact-distance
    arm involves no numpy values at all: both engines left-fold the
    same doubles in the same order. The final recall values are
    sums-of-ten divided by 10.0 — identical doubles by construction
    once the top-10 sets agree."""
    sub = PQ_DIM // m

    def dist(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({a}, {b}),"
            f" p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
            f" * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
        )

    parts = [
        f"js AS (SELECT unnest(range(0, {m})) AS j)",
        f"dims AS (SELECT unnest(range(1, {sub + 1})) AS i)",
        # corpus split into per-subspace DOUBLE subvectors (1-based
        # slicing; the FLOAT->DOUBLE widening is exact)
        f"csub AS MATERIALIZED (SELECT vec_id, j,"
        f" list_transform(range(1, {sub + 1}),"
        f"  i -> CAST(embedding[j * {sub} + i] AS DOUBLE)) AS sv"
        f" FROM embeddings, js)",
        f"tsub AS MATERIALIZED"
        f" (SELECT * FROM csub WHERE vec_id < {PQ_TRAIN_IDS})",
        # init = the kk smallest-vec_id sample rows (xs[:kk])
        f"c0 AS MATERIALIZED (SELECT j, k, sv AS c FROM ("
        f" SELECT j, sv, ROW_NUMBER() OVER"
        f"  (PARTITION BY j ORDER BY vec_id) - 1 AS k FROM tsub)"
        f" WHERE k < {kk})",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT vec_id, j, k FROM ("
            f" SELECT t.vec_id, t.j, c.k, ROW_NUMBER() OVER"
            f"  (PARTITION BY t.vec_id, t.j"
            f"   ORDER BY {dist('t.sv', 'c.c')}, c.k) AS rn"
            f" FROM tsub t JOIN c{p} c USING (j)) WHERE rn = 1)"
        )
        parts.append(
            f"m{t} AS (SELECT j, k, list(v ORDER BY i) AS c FROM ("
            f" SELECT a.j, a.k, d.i, AVG(t.sv[d.i]) AS v"
            f" FROM a{t} a JOIN tsub t USING (vec_id, j), dims d"
            f" GROUP BY a.j, a.k, d.i) GROUP BY j, k)"
        )
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT c.j, c.k,"
            f" COALESCE(m.c, c.c) AS c"
            f" FROM c{p} c LEFT JOIN m{t} m USING (j, k))"
        )
    parts.append(
        f"codes AS MATERIALIZED (SELECT vec_id, j, k AS code FROM ("
        f" SELECT s.vec_id, s.j, c.k, ROW_NUMBER() OVER"
        f"  (PARTITION BY s.vec_id, s.j"
        f"   ORDER BY {dist('s.sv', 'c.c')}, c.k) AS rn"
        f" FROM csub s JOIN c{iters} c USING (j)) WHERE rn = 1)"
    )
    parts.append(
        f"qsub AS (SELECT vec_id AS qid, j, sv FROM csub"
        f" WHERE vec_id < {PQ_QUERIES})"
    )
    parts.append(
        f"lut AS MATERIALIZED (SELECT q.qid, c.j, c.k,"
        f" {dist('q.sv', 'c.c')} AS d"
        f" FROM qsub q JOIN c{iters} c USING (j))"
    )
    parts.append(
        "est AS (SELECT l.qid, co.vec_id,"
        " list_sum(list(l.d ORDER BY l.j)) AS est"
        " FROM codes co JOIN lut l ON l.j = co.j AND l.k = co.code"
        " GROUP BY l.qid, co.vec_id)"
    )
    parts.append(
        "ex AS (SELECT q.vec_id AS qid, e.vec_id, "
        + dist(
            "list_transform(e.embedding, v -> CAST(v AS DOUBLE))",
            "list_transform(q.embedding, v -> CAST(v AS DOUBLE))",
        )
        + f" AS exact FROM embeddings e CROSS JOIN"
        f" (SELECT * FROM embeddings WHERE vec_id < {PQ_QUERIES}) q)"
    )
    parts.append(
        f"fl AS (SELECT qid,"
        f" CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY est, vec_id)"
        f"  <= {PQ_TOPK} AS INT) AS in_pq,"
        f" CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY exact, vec_id)"
        f"  <= {PQ_TOPK} AS INT) AS in_exact"
        f" FROM est JOIN ex USING (qid, vec_id))"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT CAST(qid AS INT) AS query_id,"
        f" SUM(in_pq * in_exact) / {float(PQ_TOPK)} AS recall_at_10"
        f" FROM fl GROUP BY qid"
    )


# ---------------------------------------------------------------------------
# Time-series statistics: OLS trend, Theil-Sen, autocorrelation
# ---------------------------------------------------------------------------


def q_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group OLS trend: revenue vs order-day index per order
    priority, closed form from five sufficient moments. n/Σx/Σx² are
    exact BIGINTs, Σy/Σxy are exact DECIMAL sums (y in cents stays
    under 2⁵³, so the double casts are exact at this scale — the
    docstring contract says to re-scale the moments at SF where cents
    exceed 2⁵³); the closed-form division is spelled with identical
    parenthesization in both engines, so every IEEE op matches.

    100 TB shape: ONE map-side-combined aggregate per group — the
    moments are the entire network traffic (5 numbers/group); no sort,
    no window, no per-row regression library.
    """
    o = load(spark, sf_dir, "orders")
    mind = o.agg(F.min("o_orderdate").alias("mind"))
    base = o.crossJoin(F.broadcast(mind)).select(
        "o_orderpriority",
        F.datediff("o_orderdate", "mind").cast("long").alias("x"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("y"),
    )
    agg = base.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("x")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    return agg.select(
        "o_orderpriority",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n").cast("double"), 4
        ).alias("intercept"),
    )


ORACLE_TREND_FIT = """
WITH t AS (SELECT MIN(o_orderdate) AS mind FROM orders),
base AS (
  SELECT o_orderpriority,
         CAST(datediff('day', t.mind, o_orderdate) AS BIGINT) AS x,
         CAST(o_totalprice AS DECIMAL(14,2)) AS y
  FROM orders CROSS JOIN t
),
agg AS (
  SELECT o_orderpriority,
         count(*) AS n,
         CAST(SUM(x) AS BIGINT)     AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS DOUBLE)     AS sy,
         CAST(SUM(y * x) AS DOUBLE) AS sxy
  FROM base GROUP BY 1
)
SELECT o_orderpriority, n,
       ROUND((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
         AS slope_per_day,
       ROUND((sy - ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE))
                    * sx) / CAST(n AS DOUBLE), 4)
         AS intercept
FROM agg
"""


def q_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of DAILY total revenue: the median of
    all pairwise slopes — the estimator that shrugs off the outlier
    days OLS chases. Runs on the collapsed per-day series (the day
    domain is bounded: ~2400 days here, ~37k days of commerce ever),
    so the O(D²) pair enumeration is over aggregate rows, never the
    fact table; slopes are exactly-rounded double divisions of exact
    inputs, and the median interpolates identically in both engines.

    100 TB shape: fact → per-day DECIMAL aggregate (map-side), ONE
    co-partitioned self-join on the bounded day table, one exact
    percentile. For day domains too large for D², the published
    repeated-median / sampled variant drops in above the same per-day
    aggregate.
    """
    o = load(spark, sf_dir, "orders")
    mind = o.agg(F.min("o_orderdate").alias("mind"))
    # checkpoint the collapsed day series once (r7): both sides of the
    # pair self-join consume it — without the cut each re-evaluated
    # the orders scan + aggregate
    daily = (
        o.crossJoin(F.broadcast(mind))
        .groupBy(F.datediff("o_orderdate", "mind").cast("long").alias("x"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("v"))
        .select("x", F.col("v").cast("double").alias("v"))
        .transform(lineage_cut)
    )
    # fan the STREAM side of the non-equi pair join out (r19): the day
    # table checkpoints to ~1 post-AQE partition, so the nested-loop
    # pair expansion (D²/2 probes) and the rank kernel's range-exchange
    # map ran as ONE task (a measured 1.5 s single-task job at sf0.1).
    # Round-robin on the tiny day table parallelizes the expansion;
    # the broadcast build side stays on the raw checkpoint. Pair
    # multiset (and therefore every order statistic) is unchanged.
    a = fan_out(daily).select(F.col("x").alias("x1"), F.col("v").alias("v1"))
    b = daily.select(F.col("x").alias("x2"), F.col("v").alias("v2"))
    # keep the (x1, x2) pair identity: slopes tie heavily (~2.9M pairs
    # over repeated daily values), and the rank kernel's contract
    # requires a UNIQUE total order for balanced range chunks — the
    # day pair is a deterministic tiebreak (r7 ADVICE; order
    # statistics are tie-invariant, so values are unchanged)
    pairs = a.join(b, F.col("x2") > F.col("x1")).select(
        ((F.col("v2") - F.col("v1")) / (F.col("x2") - F.col("x1")).cast("double")).alias(
            "slope"
        ),
        "x1",
        "x2",
    )
    # exact median WITHOUT the single-buffer percentile aggregate
    # (r7): Spark's exact `percentile` collects every slope into ONE
    # aggregation buffer — at 37k days that is 680M doubles in one
    # task, the plan that actually breaks first at scale. Instead rank
    # the slopes with the distributed-rank kernel and pick the two
    # middle order statistics: median = lo + g·(hi − lo) with g = 0.5
    # iff n is even (the same continuous-percentile interpolation both
    # engines define; for odd n the two picks coincide).
    ranked = chunked_global_rank(
        pairs, [F.asc("slope"), F.asc("x1"), F.asc("x2")], "rn"
    )
    n_tbl = ranked.agg(F.count("*").alias("n"))
    mid = (
        ranked.crossJoin(F.broadcast(n_tbl))
        .filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("n div 2 + 1"))
        )
        .agg(
            F.min("n").alias("n_pairs"),
            F.min("slope").alias("lo"),
            F.max("slope").alias("hi"),
        )
    )
    g = F.when(F.col("n_pairs") % 2 == 0, F.lit(0.5)).otherwise(F.lit(0.0))
    return mid.select(
        "n_pairs",
        F.round(F.col("lo") + g * (F.col("hi") - F.col("lo")), 6).alias(
            "theil_slope"
        ),
    )


ORACLE_THEILSEN = """
WITH t AS (SELECT MIN(o_orderdate) AS mind FROM orders),
daily AS (
  SELECT CAST(datediff('day', t.mind, o_orderdate) AS BIGINT) AS x,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS v
  FROM orders CROSS JOIN t GROUP BY 1
),
pairs AS (
  SELECT (b.v - a.v) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON b.x > a.x
)
SELECT count(*) AS n_pairs,
       ROUND(quantile_cont(slope, 0.5), 6) AS theil_slope
FROM pairs
"""


#: autocorrelation lags measured (days)
AUTOCORR_LAGS = [1, 7]


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1, 7 days) of daily total revenue:
    Pearson r over (v_t, v_{t+k}) calendar pairs. All five moments
    are exact DECIMAL sums (products of DECIMAL(14,2) daily values);
    the r formula runs on their double casts with identical
    parenthesization both engines — sqrt is IEEE exactly-rounded.

    100 TB shape: fact collapses to the bounded day table map-side;
    the lag pairing is an equi-join of that table with itself on
    x + k (co-partitioned, no window, handles missing days exactly);
    one 5-moment aggregate per lag ends the job.
    """
    o = load(spark, sf_dir, "orders")
    mind = o.agg(F.min("o_orderdate").alias("mind"))
    daily = (
        o.crossJoin(F.broadcast(mind))
        .groupBy(F.datediff("o_orderdate", "mind").cast("long").alias("x"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("v"))
    )
    lagged = daily.select(
        "x", "v", F.explode(F.array(*[F.lit(k) for k in AUTOCORR_LAGS])).alias("k")
    )
    b = daily.select(F.col("x").alias("xb"), F.col("v").alias("vb"))
    pairs = lagged.join(b, lagged.x + lagged.k == b.xb).select(
        "k", F.col("v").alias("a"), F.col("vb").alias("b")
    )
    agg = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("a").cast("double").alias("sa"),
        F.sum("b").cast("double").alias("sb"),
        F.sum(F.col("a") * F.col("b")).cast("double").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("double").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("double").alias("sbb"),
    )
    r = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")) / F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
        * (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
    )
    return agg.select(
        F.col("k").alias("lag_days"), "n", F.round(r, 6).alias("autocorr")
    )


ORACLE_AUTOCORR = """
WITH t AS (SELECT MIN(o_orderdate) AS mind FROM orders),
daily AS (
  SELECT CAST(datediff('day', t.mind, o_orderdate) AS BIGINT) AS x,
         SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS v
  FROM orders CROSS JOIN t GROUP BY 1
),
lags AS (SELECT unnest([1, 7]) AS k),
pairs AS (
  SELECT l.k, a.v AS a, b.v AS b
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.x = a.x + l.k
),
agg AS (
  SELECT k, count(*) AS n,
         CAST(SUM(a) AS DOUBLE)     AS sa,
         CAST(SUM(b) AS DOUBLE)     AS sb,
         CAST(SUM(a * b) AS DOUBLE) AS sab,
         CAST(SUM(a * a) AS DOUBLE) AS saa,
         CAST(SUM(b * b) AS DOUBLE) AS sbb
  FROM pairs GROUP BY 1
)
SELECT k AS lag_days, n,
       ROUND((n * sab - sa * sb)
             / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)), 6)
         AS autocorr
FROM agg
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

#: Benford expected shares log10(1 + 1/d), baked as literals so both
#: engines use the SAME constants (no cross-engine libm log calls)
import math as _math  # noqa: E402

BENFORD = {d: round(_math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals —
    the classic fraud/data-quality screen. The digit is extracted by
    integer/string arithmetic (never log10 of a double, which is not
    exactly-rounded libm and could differ across engines); expected
    shares are baked literals; output is the per-digit observed
    share, Benford share, and excess.

    100 TB shape: one narrow projection + 9-group map-side-combined
    aggregate — a full-corpus screen in a single pass.
    """
    o = load(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    per = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    tot = per.agg(F.sum("n").alias("tot"))
    bmap = F.element_at(
        F.array(*[F.lit(BENFORD[d]) for d in range(1, 10)]), F.col("digit")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("tot").cast("double"), 6).alias("share"),
            bmap.alias("benford_share"),
            F.round(
                F.col("n") / F.col("tot").cast("double") - bmap, 6
            ).alias("excess"),
        )
    )


_BENFORD_SQL = "[" + ",".join(str(BENFORD[d]) for d in range(1, 10)) + "]"

ORACLE_BENFORD = f"""
WITH per AS (
  SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit,
         count(*) AS n
  FROM orders GROUP BY 1
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM per)
SELECT digit, n,
       ROUND(n / CAST(tot AS DOUBLE), 6)                    AS share,
       CAST(({_BENFORD_SQL})[digit] AS DOUBLE)              AS benford_share,
       ROUND(n / CAST(tot AS DOUBLE)
             - CAST(({_BENFORD_SQL})[digit] AS DOUBLE), 6)  AS excess
FROM per CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Temporal graph snapshots
# ---------------------------------------------------------------------------


def q_temporal_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year snapshots of the co-purchase graph: edge count,
    vertex counts per side, total and max edge weight for each order
    year — the temporal-graph-profile query behind drift dashboards
    ("is this quarter's graph denser than last?").

    100 TB shape: the lineitem⋈orders join shuffles once on orderkey
    (bucketed layouts make it free); the year-keyed edge collapse and
    the snapshot rollup are both map-side-combined; distinct vertex
    counts per year are exact two-column countDistincts over the
    already-collapsed edge table, not the fact.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("yr", "o_custkey", "l_suppkey")
        .agg(F.count("*").alias("w"))
    )
    return edges.groupBy("yr").agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.sum("w").alias("total_weight"),
        F.max("w").alias("max_weight"),
    )


ORACLE_TEMPORAL_GRAPH = """
WITH edges AS (
  SELECT year(o_orderdate) AS yr, o_custkey, l_suppkey,
         count(*) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2, 3
)
SELECT yr,
       count(*)                                  AS n_edges,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(SUM(w) AS BIGINT)                    AS total_weight,
       CAST(MAX(w) AS BIGINT)                    AS max_weight
FROM edges
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Categorical statistics and feature preprocessing
# ---------------------------------------------------------------------------


def q_crosstab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between customer market segment
    and order priority: contingency counts, expected cells from the
    marginals, χ² and degrees of freedom — the categorical sibling of
    q_ab_ttest. Counts stay BIGINT-exact; χ² combines them in doubles
    with identical parenthesization in both engines.

    100 TB shape: the fact joins the broadcast customer dimension,
    collapses to the R×C contingency map-side, and everything after
    runs on ≤ R·C rows (marginals via two tiny rollups joined back
    broadcast). One corpus shuffle total.
    """
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cont = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .transform(lineage_cut)
    )
    rows = cont.groupBy("c_mktsegment").agg(F.sum("n").alias("rn"))
    cols = cont.groupBy("o_orderpriority").agg(F.sum("n").alias("cn"))
    tot = cont.agg(F.sum("n").alias("tot"))
    cells = (
        cont.join(F.broadcast(rows), "c_mktsegment")
        .join(F.broadcast(cols), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
    )
    e = (F.col("rn") * F.col("cn")).cast("double") / F.col("tot").cast("double")
    chi2_cell = (F.col("n").cast("double") - e) * (F.col("n").cast("double") - e) / e
    return cells.agg(
        F.sum("n").alias("n_orders"),
        F.round(F.sum(chi2_cell), 4).alias("chi2"),
        (
            (F.countDistinct("c_mktsegment") - F.lit(1))
            * (F.countDistinct("o_orderpriority") - F.lit(1))
        ).alias("dof"),
    )


ORACLE_CROSSTAB_CHI2 = """
WITH cont AS (
  SELECT c_mktsegment, o_orderpriority, count(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
r AS (SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS rn FROM cont GROUP BY 1),
c AS (SELECT o_orderpriority, CAST(SUM(n) AS BIGINT) AS cn FROM cont GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM cont)
SELECT CAST(SUM(n) AS BIGINT) AS n_orders,
       ROUND(SUM((CAST(n AS DOUBLE) - CAST(rn * cn AS DOUBLE) / CAST(tot AS DOUBLE))
                 * (CAST(n AS DOUBLE) - CAST(rn * cn AS DOUBLE) / CAST(tot AS DOUBLE))
                 / (CAST(rn * cn AS DOUBLE) / CAST(tot AS DOUBLE))), 4) AS chi2,
       CAST((count(DISTINCT cont.c_mktsegment) - 1)
            * (count(DISTINCT cont.o_orderpriority) - 1) AS BIGINT) AS dof
FROM cont
JOIN r USING (c_mktsegment)
JOIN c USING (o_orderpriority)
CROSS JOIN t
"""


def q_null_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation audit (the ML-preprocessing step done
    honestly): account balances are masked NULL on a deterministic
    key slice (custkey ≡ 0 mod 19), refilled with their segment's
    non-null mean, and the per-segment report shows how many cells
    were imputed and how the mean moved. Sums stay DECIMAL-exact;
    the imputed mean is recombined from exact parts in doubles.

    100 TB shape: ONE map-side-combined aggregate computes all parts
    (non-null sum/count, null count) per segment; no second scan, no
    join — the refill statistics are pure arithmetic on the
    aggregate. An actual materialized refill would be the same scan
    plus a broadcast of the per-segment means.
    """
    c = load(spark, sf_dir, "customer")
    masked = c.select(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 19 == 0, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .cast("decimal(12,2)")
        .alias("bal"),
    )
    agg = masked.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.count("bal").alias("n_obs"),
        F.sum("bal").cast("double").alias("s"),
    )
    mean_obs = F.col("s") / F.col("n_obs").cast("double")
    mean_after = (
        F.col("s") + (F.col("n") - F.col("n_obs")).cast("double") * mean_obs
    ) / F.col("n").cast("double")
    return agg.select(
        "c_mktsegment",
        "n",
        (F.col("n") - F.col("n_obs")).alias("n_imputed"),
        F.round(mean_obs, 4).alias("mean_observed"),
        F.round(mean_after, 4).alias("mean_after_impute"),
    )


ORACLE_NULL_IMPUTATION = """
WITH masked AS (
  SELECT c_mktsegment,
         CASE WHEN c_custkey % 19 = 0 THEN NULL
              ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS bal
  FROM customer
),
agg AS (
  SELECT c_mktsegment,
         count(*) AS n,
         count(bal) AS n_obs,
         CAST(SUM(bal) AS DOUBLE) AS s
  FROM masked GROUP BY 1
)
SELECT c_mktsegment, n,
       n - n_obs AS n_imputed,
       ROUND(s / CAST(n_obs AS DOUBLE), 4) AS mean_observed,
       ROUND((s + CAST(n - n_obs AS DOUBLE) * (s / CAST(n_obs AS DOUBLE)))
             / CAST(n AS DOUBLE), 4) AS mean_after_impute
FROM agg
"""


#: fixed one-hot domain — ML encoders need a pinned schema, not a pivot
ONE_HOT_SEGMENTS = [
    "AUTOMOBILE",
    "BUILDING",
    "FURNITURE",
    "HOUSEHOLD",
    "MACHINERY",
]


def q_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-domain one-hot encoding of the market segment (plus an
    out-of-domain indicator) — the feature-engineering step where the
    COLUMN SET is part of the model contract, which is why this is a
    static projection and not a data-driven pivot (a new upstream
    category must land in `other`, not silently reshape the schema).

    100 TB shape: a narrow shuffle-free projection; indicator columns
    are codegen'd CASE expressions. Composes with q_target_encode for
    high-cardinality categoricals where one-hot explodes.
    """
    c = load(spark, sf_dir, "customer")
    return one_hot_frame(c)


def one_hot_frame(c: DataFrame) -> DataFrame:
    """q_one_hot's projection over a caller-supplied customer frame.
    Split out for the r16 vacuity audit: the fixture's segments all
    belong to the fixed domain, so seg_other is all-zero at every
    scale — the out-of-domain branch is pinned on crafted input by
    tests/test_llm_ops.py::test_one_hot_other_branch."""
    cols = [
        (F.col("c_mktsegment") == s).cast("int").alias(f"seg_{s.lower()}")
        for s in ONE_HOT_SEGMENTS
    ]
    other = (
        ~F.col("c_mktsegment").isin(*ONE_HOT_SEGMENTS)
    ).cast("int").alias("seg_other")
    return c.select("c_custkey", *cols, other)


ORACLE_ONE_HOT = """
SELECT c_custkey,
       CAST(c_mktsegment = 'AUTOMOBILE' AS INTEGER) AS seg_automobile,
       CAST(c_mktsegment = 'BUILDING'   AS INTEGER) AS seg_building,
       CAST(c_mktsegment = 'FURNITURE'  AS INTEGER) AS seg_furniture,
       CAST(c_mktsegment = 'HOUSEHOLD'  AS INTEGER) AS seg_household,
       CAST(c_mktsegment = 'MACHINERY'  AS INTEGER) AS seg_machinery,
       CAST(c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE',
                                 'HOUSEHOLD','MACHINERY') AS INTEGER)
         AS seg_other
FROM customer
"""


def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D binned histogram of lineitem (quantity × price): counts and
    DECIMAL-exact revenue per cell — the aggregation that backs every
    density heatmap. Bin ids are integer arithmetic (floor division),
    so binning is engine-exact by construction.

    100 TB shape: one narrow projection + one map-side-combined
    groupBy on the bounded bin grid (≤ 10 × ~11 cells) — the corpus
    collapses in the map stage; nothing downstream sees raw rows.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            ((F.col("l_quantity").cast("long") - 1) / F.lit(5))
            .cast("long")
            .alias("qty_bin"),
            F.floor(F.col("l_extendedprice") / F.lit(10000.0)).alias("price_bin"),
            F.col("l_extendedprice").cast("decimal(14,2)").alias("rev"),
        )
        .groupBy("qty_bin", "price_bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


ORACLE_HISTOGRAM_2D = """
SELECT CAST((CAST(l_quantity AS BIGINT) - 1) // 5 AS BIGINT) AS qty_bin,
       CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT)      AS price_bin,
       count(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Graph feature aggregation, graph drift, rolling bands
# ---------------------------------------------------------------------------


def q_neighbor_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style mean-aggregation layer over the co-purchase
    graph: each supplier vertex aggregates its customer neighbors'
    account-balance features (mean, min, max, degree) — the
    message-passing primitive under every GNN feature pipeline,
    expressed as plain relational ops. Sums are DECIMAL-exact; the
    mean divides once in double.

    100 TB shape: edges shuffle once on the customer key to pick up
    the feature (broadcast when the feature table is dimension-sized,
    as here), then ONE map-side-combined groupBy on the destination —
    identical cost to a degree count. Stacking L layers = L such
    joins, which is exactly how distributed GNN samplers schedule it.
    """
    from .sources import copurchase_edges

    e = copurchase_edges(spark, sf_dir)
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("src"),
        F.col("c_acctbal").cast("decimal(12,2)").alias("feat"),
    )
    return (
        e.join(F.broadcast(c), "src")
        .groupBy(F.col("dst").alias("supplier_vertex"))
        .agg(
            F.count("*").alias("n_neighbors"),
            F.round(
                F.sum("feat").cast("double") / F.count("*").cast("double"), 4
            ).alias("mean_feat"),
            F.min("feat").cast("double").alias("min_feat"),
            F.max("feat").cast("double").alias("max_feat"),
        )
    )


ORACLE_NEIGHBOR_AGG = """
WITH e AS (
  SELECT o_custkey AS src, l_suppkey + 1000000 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT dst AS supplier_vertex,
       count(*) AS n_neighbors,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4)                AS mean_feat,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_feat,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_feat
FROM e JOIN customer ON src = c_custkey
GROUP BY 1
"""


def q_graph_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year co-purchase graph drift: Jaccard similarity of
    consecutive yearly edge SETS plus the added/removed edge counts —
    the structural-drift metric a graph platform alerts on. All
    counts are exact BIGINTs from one full-outer join per year pair.

    100 TB shape: year-keyed edge collapse (one shuffle), then the
    consecutive-year comparison joins the edge table to itself on
    (year+1, src, dst) — co-partitioned on the edge key, so each year
    pair is a local merge; the rollup is map-side-combined.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("yr", "o_custkey", "l_suppkey")
        .distinct()
        .transform(lineage_cut)
    )
    a = edges.select(
        F.col("yr").alias("y"),
        F.col("o_custkey").alias("c"),
        F.col("l_suppkey").alias("s"),
        F.lit(1).alias("in_cur"),
    )
    b = edges.select(
        (F.col("yr") - 1).alias("y"),
        F.col("o_custkey").alias("c"),
        F.col("l_suppkey").alias("s"),
        F.lit(1).alias("in_next"),
    )
    j = a.join(b, ["y", "c", "s"], "full_outer")
    per = j.groupBy("y").agg(
        F.sum(
            (F.col("in_cur").isNotNull() & F.col("in_next").isNotNull()).cast("long")
        ).alias("kept"),
        F.sum(
            (F.col("in_cur").isNotNull() & F.col("in_next").isNull()).cast("long")
        ).alias("removed"),
        F.sum(
            (F.col("in_cur").isNull() & F.col("in_next").isNotNull()).cast("long")
        ).alias("added"),
    )
    years = edges.select("yr").distinct()
    valid = years.select(F.col("yr").alias("y")).join(
        years.select((F.col("yr") - 1).alias("y")), "y"
    )
    return (
        per.join(valid, "y")
        .select(
            F.col("y").alias("year"),
            (F.col("y") + 1).alias("next_year"),
            "kept",
            "removed",
            "added",
            F.round(
                F.col("kept").cast("double")
                / (F.col("kept") + F.col("removed") + F.col("added")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


ORACLE_GRAPH_DRIFT = """
WITH edges AS (
  SELECT DISTINCT year(o_orderdate) AS yr, o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
j AS (
  SELECT COALESCE(a.yr, b.yr - 1) AS y,
         CASE WHEN a.yr IS NOT NULL AND b.yr IS NOT NULL THEN 1 ELSE 0 END AS kept,
         CASE WHEN a.yr IS NOT NULL AND b.yr IS NULL THEN 1 ELSE 0 END     AS removed,
         CASE WHEN a.yr IS NULL AND b.yr IS NOT NULL THEN 1 ELSE 0 END     AS added
  FROM edges a
  FULL OUTER JOIN edges b
    ON b.yr = a.yr + 1 AND b.c = a.c AND b.s = a.s
),
per AS (
  SELECT y,
         CAST(SUM(kept) AS BIGINT)    AS kept,
         CAST(SUM(removed) AS BIGINT) AS removed,
         CAST(SUM(added) AS BIGINT)   AS added
  FROM j GROUP BY 1
),
years AS (SELECT DISTINCT yr FROM edges)
SELECT p.y AS year, p.y + 1 AS next_year, kept, removed, added,
       ROUND(CAST(kept AS DOUBLE)
             / CAST(kept + removed + added AS DOUBLE), 6) AS jaccard
FROM per p
JOIN years y1 ON y1.yr = p.y
JOIN years y2 ON y2.yr = p.y + 1
"""


#: Bollinger window: current day + 6 preceding calendar days
BOLLINGER_DAYS = 6


def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily revenue: 7-calendar-day rolling
    mean ± 2σ plus a breakout flag — the rolling-variance sibling of
    q_rolling_7d. Σv and Σv² accumulate as exact DECIMALs inside a
    RANGE window over the collapsed day series; mean/σ divide once in
    double (sqrt is IEEE exactly-rounded), and the breakout compare
    re-derives both sides from the same exact moments.

    100 TB shape: the fact collapses to the bounded day table
    map-side BEFORE the window (the q_rolling_7d precedent); the
    RANGE frame holds ≤ 7 rows of state per step and partitions by
    nothing bigger than the day domain.
    """
    o = load(spark, sf_dir, "orders")
    mind = o.agg(F.min("o_orderdate").alias("mind"))
    daily = (
        o.crossJoin(F.broadcast(mind))
        .groupBy(F.datediff("o_orderdate", "mind").cast("long").alias("x"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("v"))
    )
    win = (
        Window.orderBy("x").rangeBetween(-BOLLINGER_DAYS, 0)
    )
    m = daily.select(
        "x",
        F.col("v").cast("double").alias("v"),
        F.count("*").over(win).alias("n"),
        F.sum("v").over(win).cast("double").alias("s1"),
        F.sum(F.col("v") * F.col("v")).over(win).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n").cast("double")
    var = F.col("s2") / F.col("n").cast("double") - mean * mean
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return m.select(
        "x",
        F.round("v", 2).alias("revenue"),
        F.round(mean, 4).alias("ma7"),
        F.round(sd, 4).alias("sd7"),
        (F.col("v") > mean + F.lit(2.0) * sd).alias("breakout_up"),
    )


ORACLE_BOLLINGER = """
WITH t AS (SELECT MIN(o_orderdate) AS mind FROM orders),
daily AS (
  SELECT CAST(datediff('day', t.mind, o_orderdate) AS BIGINT) AS x,
         SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS v
  FROM orders CROSS JOIN t GROUP BY 1
),
m AS (
  SELECT x, CAST(v AS DOUBLE) AS v,
         CAST(COUNT(*) OVER w AS BIGINT)      AS n,
         CAST(SUM(v) OVER w AS DOUBLE)        AS s1,
         CAST(SUM(v * v) OVER w AS DOUBLE)    AS s2
  FROM daily
  WINDOW w AS (ORDER BY x RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT x,
       ROUND(v, 2) AS revenue,
       ROUND(s1 / CAST(n AS DOUBLE), 4) AS ma7,
       ROUND(sqrt(GREATEST(s2 / CAST(n AS DOUBLE)
                           - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)),
                           0.0)), 4) AS sd7,
       (v > s1 / CAST(n AS DOUBLE)
            + 2.0 * sqrt(GREATEST(s2 / CAST(n AS DOUBLE)
                                  - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)),
                                  0.0))) AS breakout_up
FROM m
"""




# ---------------------------------------------------------------------------
# Exact financial allocation, survivorship, concentration metrics
# ---------------------------------------------------------------------------


def q_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder allocation: split each order's total across
    its lineitems proportional to extended price, EXACTLY in integer
    cents — base shares by integer division, the leftover cents going
    to the items with the largest remainders (ties to the lowest line
    number). The per-order output proves conservation (allocated ==
    total to the cent) while max/min expose the item-level result —
    the financial-allocation kernel (invoice splits, cost
    apportionment, tax rounding) where floating point is disallowed.

    100 TB shape: one orderkey-shuffled join, one per-order window
    over its ≤7 items for the remainder ranks, one map-side-combined
    rollup. All arithmetic is int64 (products bounded by
    total_cents·item_cents < 2⁶³) with DIV — no doubles anywhere.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("t_cents"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    tot_w = Window.partitionBy("l_orderkey")
    with_w = j.select(
        "l_orderkey",
        "l_linenumber",
        "t_cents",
        "w",
        F.sum("w").over(tot_w).alias("wsum"),
    )
    base = F.expr("t_cents * w DIV wsum")
    frac = F.col("t_cents") * F.col("w") - base * F.col("wsum")
    staged = with_w.select(
        "l_orderkey",
        "l_linenumber",
        "t_cents",
        base.alias("base"),
        frac.alias("frac"),
    )
    rem = F.col("t_cents") - F.sum("base").over(tot_w)
    rk = F.row_number().over(
        Window.partitionBy("l_orderkey").orderBy(
            F.desc("frac"), F.asc("l_linenumber")
        )
    )
    alloc = staged.select(
        "l_orderkey",
        "t_cents",
        (F.col("base") + (rk <= rem).cast("long")).alias("alloc_cents"),
    )
    return alloc.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        F.min("t_cents").alias("total_cents"),
        F.sum("alloc_cents").alias("allocated_cents"),
        F.max("alloc_cents").alias("max_item_cents"),
        F.min("alloc_cents").alias("min_item_cents"),
    )


ORACLE_ALLOCATION = """
WITH o AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS t_cents
  FROM orders
),
li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS w
  FROM lineitem
),
with_w AS (
  SELECT l_orderkey, l_linenumber, t_cents, w,
         CAST(SUM(w) OVER (PARTITION BY l_orderkey) AS BIGINT) AS wsum
  FROM li JOIN o ON l_orderkey = o_orderkey
),
staged AS (
  SELECT l_orderkey, l_linenumber, t_cents,
         (t_cents * w) // wsum                      AS base,
         t_cents * w - ((t_cents * w) // wsum) * wsum AS frac
  FROM with_w
),
alloc AS (
  SELECT l_orderkey, t_cents,
         base + CASE WHEN row_number() OVER (PARTITION BY l_orderkey
                          ORDER BY frac DESC, l_linenumber)
                     <= t_cents - CAST(SUM(base) OVER (PARTITION BY l_orderkey) AS BIGINT)
                     THEN 1 ELSE 0 END AS alloc_cents
  FROM staged
)
SELECT l_orderkey,
       count(*) AS n_items,
       MIN(t_cents) AS total_cents,
       CAST(SUM(alloc_cents) AS BIGINT) AS allocated_cents,
       MAX(alloc_cents) AS max_item_cents,
       MIN(alloc_cents) AS min_item_cents
FROM alloc
GROUP BY 1
"""


#: synthetic duplicate groups: entity id = custkey mod this
SURVIVOR_ENTITIES = 300


def q_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden-record merge (master-data-management):
    collapse each duplicate group (entity = custkey mod 300 — the
    deterministic stand-in for a resolved match cluster) into one
    record under per-column rules: name from the LATEST member
    (max custkey), balance = group max, nation = deterministic mode
    (count desc, smallest value — q_mode_agg's composite argmax),
    segment from the EARLIEST member. Every rule is an aggregate;
    no window, no sort, no per-group collect.

    100 TB shape: two map-side-combined aggregates (one for the mode
    pre-count, one for everything else) joined on the bounded entity
    key — the cheapest possible golden-record pass; rules extend
    per-column without new shuffles.
    """
    c = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % SURVIVOR_ENTITIES).alias("entity"),
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        "c_nationkey",
        "c_mktsegment",
    )
    main = c.groupBy("entity").agg(
        F.count("*").alias("n_members"),
        F.max_by("c_name", "c_custkey").alias("name_latest"),
        F.max("bal").cast("double").alias("bal_max"),
        F.min_by("c_mktsegment", "c_custkey").alias("segment_first"),
    )
    nation_counts = c.groupBy("entity", "c_nationkey").agg(
        F.count("*").alias("cnt")
    )
    nation_mode = nation_counts.groupBy("entity").agg(
        F.max_by(
            "c_nationkey", F.col("cnt") * 1000 - F.col("c_nationkey")
        ).alias("nation_mode")
    )
    return main.join(nation_mode, "entity")


ORACLE_SURVIVORSHIP = f"""
WITH c AS (
  SELECT c_custkey % {SURVIVOR_ENTITIES} AS entity, c_custkey, c_name,
         CAST(c_acctbal AS DECIMAL(12,2)) AS bal, c_nationkey, c_mktsegment
  FROM customer
),
main AS (
  SELECT entity,
         count(*) AS n_members,
         arg_max(c_name, c_custkey)       AS name_latest,
         CAST(MAX(bal) AS DOUBLE)         AS bal_max,
         arg_min(c_mktsegment, c_custkey) AS segment_first
  FROM c GROUP BY 1
),
nc AS (
  SELECT entity, c_nationkey, count(*) AS cnt FROM c GROUP BY 1, 2
),
nm AS (
  SELECT entity,
         arg_max(c_nationkey, cnt * 1000 - c_nationkey) AS nation_mode
  FROM nc GROUP BY 1
)
SELECT main.*, nm.nation_mode FROM main JOIN nm USING (entity)
"""


def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: parts are
    ranked by revenue (desc, key asc), A = the head reaching 80% of
    cumulative revenue, B = to 95%, C = the tail. Thresholds compare
    in exact integer cents (5·cum ≤ 4·tot and 20·cum ≤ 19·tot) so the
    class boundary can never flip on float noise.

    100 TB shape (r7): fact collapses to the part dimension map-side;
    the cumulative revenue comes from the chunked running-sum kernel
    (range chunks + broadcast prefix of chunk totals) — no single
    sorted partition of the part dimension; the output is the 3-row
    class rollup.
    """
    li = load(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents")
    )
    tot = per.agg(F.sum("cents").alias("tot"))
    cum = chunked_running_sum(
        per, [F.desc("cents"), F.asc("l_partkey")], "cents", "cum"
    ).crossJoin(F.broadcast(tot))
    cls = (
        F.when(F.lit(5) * F.col("cum") <= F.lit(4) * F.col("tot"), "A")
        .when(F.lit(20) * F.col("cum") <= F.lit(19) * F.col("tot"), "B")
        .otherwise("C")
    )
    return (
        cum.select(cls.alias("abc_class"), "cents", "tot")
        .groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(
                F.sum("cents").cast("double") / F.min("tot").cast("double"), 6
            ).alias("revenue_share"),
        )
    )


ORACLE_PARETO_ABC = """
WITH per AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM per),
cum AS (
  SELECT l_partkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         tot
  FROM per CROSS JOIN t
)
SELECT CASE WHEN 5 * cum <= 4 * tot THEN 'A'
            WHEN 20 * cum <= 19 * tot THEN 'B'
            ELSE 'C' END AS abc_class,
       count(*) AS n_parts,
       ROUND(CAST(SUM(cents) AS DOUBLE) / CAST(MIN(tot) AS DOUBLE), 6)
         AS revenue_share
FROM cum
GROUP BY 1
"""


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    the inequality metric behind "top-1% of customers" dashboards.
    Computed from the exact sorted-rank identity
    G = (2·Σ iᐧxᵢ − (n+1)·Σx) / (n·Σx) with x ascending (ties broken
    by key); the rank-weighted sum accumulates in DECIMAL(38,0) cents
    so it cannot overflow int64 or lose a cent at any scale.

    100 TB shape (r7): fact → per-customer cents (map-side), then the
    rank comes from the distributed-rank kernel (chunked_global_rank —
    range chunks + prefix-offset stitch, never one sorted partition of
    the customer dimension), one 3-scalar reduce. The final identity
    is four exact integers and one division.
    """
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = chunked_global_rank(
        per, [F.asc("cents"), F.asc("o_custkey")], "i"
    ).select(
        "cents", (F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("ix")
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum("ix").alias("six"),
    )
    g = (
        F.lit(2.0) * F.col("six").cast("double")
        - (F.col("n") + 1).cast("double") * F.col("sx").cast("double")
    ) / (F.col("n").cast("double") * F.col("sx").cast("double"))
    return agg.select(
        "n",
        F.round(F.col("sx").cast("double") / 100.0, 2).alias("total_revenue"),
        F.round(g, 6).alias("gini"),
    )


ORACLE_GINI = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents, o_custkey) AS DECIMAL(38,0))
           * cents AS ix
  FROM per
),
agg AS (
  SELECT count(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS sx,
         SUM(ix) AS six
  FROM ranked
)
SELECT n,
       ROUND(CAST(sx AS DOUBLE) / 100.0, 2) AS total_revenue,
       ROUND((2.0 * CAST(six AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
FROM agg
"""



# ---------------------------------------------------------------------------
# Survival analysis, cohort LTV, association rules
# ---------------------------------------------------------------------------

#: customers whose last order falls in the final window are censored
KM_CENSOR_DAYS = 180


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer lifetime (days between
    first and last order; customers still ordering in the final 180
    days are right-CENSORED — the estimator's whole point). At each
    event time: n_at_risk from a descending cumulative window over the
    collapsed duration histogram, S(t) = Π(1 − d/n) via exp-Σ-ln with
    an exact zero-factor flag (Spark ln(0) is NULL, DuckDB -inf — the
    flag sidesteps both).

    100 TB shape: fact → per-customer (duration, censored) rollup →
    duration HISTOGRAM (bounded by distinct day counts) → two windows
    over the histogram → done. The corpus is touched once.
    """
    o = load(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    per = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("dur"),
            (
                F.datediff(F.min("maxd"), F.max("o_orderdate"))
                < F.lit(KM_CENSOR_DAYS)
            ).cast("long").alias("censored"),
        )
    )
    hist = per.groupBy("dur").agg(
        F.sum(F.lit(1) - F.col("censored")).alias("d"),
        F.count("*").alias("c"),
    )
    risk_win = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km_win = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    staged = hist.select(
        "dur",
        "d",
        F.sum("c").over(risk_win).alias("n_risk"),
    ).filter(F.col("d") > 0)
    factor = F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double")
    events = staged.select(
        "dur",
        "d",
        "n_risk",
        factor.alias("f"),
    )
    surv = F.when(
        F.min("f").over(km_win) <= F.lit(0.0), F.lit(0.0)
    ).otherwise(F.exp(F.sum(F.log("f")).over(km_win)))
    return events.select(
        F.col("dur").alias("t_days"),
        F.col("d").alias("n_events"),
        F.col("n_risk").alias("n_at_risk"),
        F.round(surv, 6).alias("survival"),
    )


ORACLE_KAPLAN_MEIER = f"""
WITH t AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
per AS (
  SELECT o_custkey,
         CAST(datediff('day', MIN(o_orderdate), MAX(o_orderdate)) AS INTEGER) AS dur,
         CASE WHEN datediff('day', MAX(o_orderdate), MIN(t.maxd))
                   < {KM_CENSOR_DAYS} THEN 1 ELSE 0 END AS censored
  FROM orders CROSS JOIN t GROUP BY 1
),
hist AS (
  SELECT dur,
         CAST(SUM(1 - censored) AS BIGINT) AS d,
         count(*) AS c
  FROM per GROUP BY 1
),
staged AS (
  SELECT dur, d,
         CAST(SUM(c) OVER (ORDER BY dur DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
  FROM hist
),
events AS (
  SELECT dur, d, n_risk,
         1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM staged WHERE d > 0
)
SELECT dur AS t_days, d AS n_events, n_risk AS n_at_risk,
       ROUND(CASE WHEN MIN(f) OVER w <= 0.0 THEN 0.0
                  ELSE exp(SUM(ln(f)) OVER w) END, 6) AS survival
FROM events
WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


#: LTV horizon: months 0..5 after the cohort month
LTV_MONTHS = 5


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers grouped by first-order month, the
    cumulative revenue per customer tracked for the first 6 months —
    the curve every subscription/commerce dashboard draws next to
    q_retention_cohort's counts. Month ids are pure integer
    arithmetic (year·12+month); revenue is DECIMAL-exact until the
    one per-cell division.

    100 TB shape: two map-side-combined aggregates (first-month per
    customer, then per-(cohort, offset) revenue) + one ≤6-row
    cumulative window per cohort over the cohort×offset grid —
    windows never see the fact.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("rev"),
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sizes = first.groupBy("m0").agg(F.count("*").alias("n_customers"))
    cells = (
        o.join(first, "o_custkey")
        .select("m0", (F.col("m") - F.col("m0")).alias("off"), "rev")
        .filter(F.col("off") <= LTV_MONTHS)
        .groupBy("m0", "off")
        .agg(F.sum("rev").alias("rev"))
    )
    cum_win = Window.partitionBy("m0").orderBy("off").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "m0",
        "off",
        (F.sum("rev").over(cum_win) * 100).cast("long").alias("cum_cents"),
    )
    # per-customer LTV reported in whole cents via integer DIV — the
    # fractional quotient lands on exact .xxx5 half-cases (cents / small
    # n) where Spark's and DuckDB's double ROUND disagree, so the
    # output stays in the integer domain (plus an unrounded exact-
    # division dollars column, IEEE-identical in both engines)
    ltv_cents = F.expr("cum_cents DIV n_customers")
    return (
        cum.join(F.broadcast(sizes), "m0")
        .select(
            F.col("m0").alias("cohort_month"),
            F.col("off").alias("months_since"),
            "n_customers",
            ltv_cents.alias("ltv_cents_per_customer"),
            (ltv_cents.cast("double") / F.lit(100.0)).alias("ltv_dollars"),
        )
    )


ORACLE_COHORT_LTV = f"""
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS m,
         CAST(o_totalprice AS DECIMAL(14,2)) AS rev
  FROM orders
),
first AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1),
sizes AS (SELECT m0, count(*) AS n_customers FROM first GROUP BY 1),
cells AS (
  SELECT m0, m - m0 AS off, SUM(rev) AS rev
  FROM o JOIN first USING (o_custkey)
  WHERE m - m0 <= {LTV_MONTHS}
  GROUP BY 1, 2
),
cum AS (
  SELECT m0, off,
         CAST(SUM(rev) OVER (PARTITION BY m0 ORDER BY off
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT)
           AS cum_cents
  FROM cells
)
SELECT m0 AS cohort_month, off AS months_since, n_customers,
       cum_cents // n_customers AS ltv_cents_per_customer,
       CAST(cum_cents // n_customers AS DOUBLE) / 100.0 AS ltv_dollars
FROM cum JOIN sizes USING (m0)
"""


#: association rules kept at or above this pair support
ASSOC_MIN_SUPPORT = 40


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets at brand granularity:
    support, both confidences, and lift for every brand pair with
    support ≥ {ASSOC_MIN_SUPPORT} — q_freq_pairs' pair mining
    completed into the rule statistics (Agrawal-Srikant 1994). All
    counts are exact BIGINTs; confidence/lift divide once in double.

    100 TB shape: baskets collapse to DISTINCT (order, brand) first
    (the A-priori fan-out bound), the pair join is co-partitioned on
    the basket key, single-item supports come from one tiny
    brand-count rollup broadcast twice.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # lazy cut + fused count (r20, guide §1.2): the distinct-orderkey
    # count is the checkpoint's materializing job — the r19 shape paid
    # a separate eager-cut execution before the count
    baskets = lineage_cut(
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct(),
        eager=False,
    )
    n_baskets = int(
        baskets.agg(F.countDistinct("l_orderkey").alias("n")).collect()[0][0]
    )
    singles = baskets.groupBy("p_brand").agg(F.count("*").alias("n1"))
    # pair mining stays the order-key self-join (r20, examined and
    # KEPT): a sorted-basket-array rewrite (groupBy + collect_list +
    # pair explode) was prototyped on the claim "2 shuffle sides → 1",
    # but the executed plan shows the claim was false — both self-join
    # sides come from the same checkpoint, so Spark plans ONE Exchange
    # and a ReusedExchange (verified in
    # plans/r20/q_assoc_rules_exec_before.txt op (8) "Reuses operator
    # id: 4"): the join already shuffles the basket bytes once at any
    # scale. The rewrite traded the join's two sorts for an
    # ObjectHashAggregate + explode and measured ~0.3 s WORSE in every
    # quiet interleaved leg at sf0.1 (2.27/2.39 old vs 2.48/2.75 new),
    # value-identical. Rejected; receipts in OPTIMIZATION_r20.md.
    a = baskets.select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("ba"))
    b = baskets.select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("bb"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= ASSOC_MIN_SUPPORT)
    )
    sa = singles.select(F.col("p_brand").alias("ba"), F.col("n1").alias("n_a"))
    sb = singles.select(F.col("p_brand").alias("bb"), F.col("n1").alias("n_b"))
    out = pairs.join(F.broadcast(sa), "ba").join(F.broadcast(sb), "bb")
    lift = (
        F.col("n_ab").cast("double") * F.lit(float(n_baskets))
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return out.select(
        F.col("ba").alias("brand_a"),
        F.col("bb").alias("brand_b"),
        "n_ab",
        F.round(F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6).alias(
            "conf_a_to_b"
        ),
        F.round(F.col("n_ab").cast("double") / F.col("n_b").cast("double"), 6).alias(
            "conf_b_to_a"
        ),
        F.round(lift, 6).alias("lift"),
    )


ORACLE_ASSOC_RULES = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM baskets),
singles AS (SELECT p_brand, count(*) AS n1 FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.p_brand AS ba, b.p_brand AS bb, count(*) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
  HAVING count(*) >= {ASSOC_MIN_SUPPORT}
)
SELECT ba AS brand_a, bb AS brand_b, n_ab,
       ROUND(CAST(n_ab AS DOUBLE) / CAST(sa.n1 AS DOUBLE), 6) AS conf_a_to_b,
       ROUND(CAST(n_ab AS DOUBLE) / CAST(sb.n1 AS DOUBLE), 6) AS conf_b_to_a,
       ROUND(CAST(n_ab AS DOUBLE) * CAST(nb.n AS DOUBLE)
             / (CAST(sa.n1 AS DOUBLE) * CAST(sb.n1 AS DOUBLE)), 6) AS lift
FROM pairs
JOIN singles sa ON sa.p_brand = pairs.ba
JOIN singles sb ON sb.p_brand = pairs.bb
CROSS JOIN nb
"""




# ---------------------------------------------------------------------------
# HyperLogLog register algebra (Flajolet et al. 2007)
# ---------------------------------------------------------------------------

#: m = 64 buckets (p = 6); α_64 = 0.709 (Flajolet et al. 2007, Fig. 3)
HLL_BUCKETS = 64
HLL_ALPHA = "0.709"
HLL_A, HLL_B = 48271, 16807
HLL_P = 2_147_483_647
#: suffix width: 31-bit hash minus 6 bucket bits → w ∈ [0, 2^25)
HLL_WBITS = 25


def _hll_rho_spark(w):
    """ρ(w) = 1 + trailing-zero count of the 25-bit suffix (26 for
    w = 0) — spelled as a %-ladder so no engine needs a clz/log2
    builtin (libm-free, exact in both engines)."""
    expr = F.lit(HLL_WBITS + 1)
    for k in range(HLL_WBITS - 1, -1, -1):
        expr = F.when(w % (2 ** (k + 1)) == 2**k, F.lit(k + 1)).otherwise(expr)
    return expr


def _hll_rho_sql(w: str) -> str:
    cases = " ".join(
        f"WHEN {w} % {2 ** (k + 1)} = {2 ** k} THEN {k + 1}"
        for k in range(HLL_WBITS)
    )
    return f"CASE {cases} ELSE {HLL_WBITS + 1} END"


def q_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register ALGEBRA with exact error accounting: build
    m=64 registers for two customer sets (buyers with 'F' vs 'O'
    orders), estimate each cardinality, merge registers by MAX for the
    union estimate, and derive the intersection by inclusion–
    exclusion — the mergeable-sketch property that makes distributed /
    incremental COUNT DISTINCT possible. Every register is an exact
    integer (pure-LCG hash, %-ladder ρ — no libm anywhere); the
    harmonic sum Σ2^−M_j is a sum of 64 single-bit doubles spanning
    < 53 bits, hence EXACT and order-independent, so even the
    estimates hash-match across engines. True distinct counts ride
    along for the error report.

    100 TB shape: per-(side, bucket) MAX registers collapse map-side
    in one groupBy over the distinct key set; the sketch state is
    ≤ 2·64 rows no matter the corpus — register tables from separate
    partitions/corpora merge by the same MAX.
    """
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .select(F.col("o_orderstatus").alias("side"), "o_custkey")
        .distinct()
        .transform(lineage_cut)
    )
    h = ((F.col("o_custkey") + 1) * HLL_A + HLL_B) % HLL_P
    hashed = o.select(
        "side",
        (h % HLL_BUCKETS).alias("bucket"),
        _hll_rho_spark((h / F.lit(HLL_BUCKETS)).cast("long")).alias("rho"),
    )
    reg = hashed.groupBy("side", "bucket").agg(F.max("rho").alias("m"))
    reg_u = hashed.groupBy("bucket").agg(F.max("rho").alias("m"))

    def estimate(r, label):
        return r.agg(
            F.round(
                F.lit(float(HLL_ALPHA))
                * F.lit(HLL_BUCKETS * HLL_BUCKETS)
                / (
                    F.sum(F.pow(F.lit(2.0), -F.col("m")))
                    + (F.lit(HLL_BUCKETS) - F.count("*"))
                ),
                4,
            ).alias("est")
        ).select(F.lit(label).alias("measure"), "est")

    est_f = estimate(reg.filter(F.col("side") == "F"), "F")
    est_o = estimate(reg.filter(F.col("side") == "O"), "O")
    est_u = estimate(reg_u, "union")
    est_i = (
        est_f.select(F.col("est").alias("ef"))
        .crossJoin(est_o.select(F.col("est").alias("eo")))
        .crossJoin(est_u.select(F.col("est").alias("eu")))
        .select(
            F.lit("intersect").alias("measure"),
            F.round(F.col("ef") + F.col("eo") - F.col("eu"), 4).alias("est"),
        )
    )
    keys = o.select("side", "o_custkey")
    ex_f = keys.filter(F.col("side") == "F").select("o_custkey").distinct()
    ex_o = keys.filter(F.col("side") == "O").select("o_custkey").distinct()
    def counted(df, label):
        return df.agg(F.count("*").alias("exact")).select(
            F.lit(label).alias("measure"), "exact"
        )

    exact = (
        counted(ex_f, "F")
        .unionByName(counted(ex_o, "O"))
        .unionByName(counted(ex_f.unionByName(ex_o).distinct(), "union"))
        .unionByName(counted(ex_f.join(ex_o, "o_custkey", "semi"), "intersect"))
    )
    return (
        est_f.unionByName(est_o)
        .unionByName(est_u)
        .unionByName(est_i)
        .join(exact, "measure")
        .orderBy("measure")
    )


_HLL_HASH_SQL = f"((o_custkey + 1) * {HLL_A} + {HLL_B}) % {HLL_P}"

ORACLE_SKETCH_UNION = f"""
WITH keys AS (
  SELECT DISTINCT o_orderstatus AS side, o_custkey
  FROM orders WHERE o_orderstatus IN ('F', 'O')
),
hashed AS (
  SELECT side,
         ({_HLL_HASH_SQL}) % {HLL_BUCKETS} AS bucket,
         {_hll_rho_sql(f"(({_HLL_HASH_SQL}) // {HLL_BUCKETS})")} AS rho
  FROM keys
),
reg AS (SELECT side, bucket, MAX(rho) AS m FROM hashed GROUP BY 1, 2),
reg_u AS (SELECT bucket, MAX(rho) AS m FROM hashed GROUP BY 1),
est AS (
  SELECT side AS measure,
         ROUND({HLL_ALPHA} * {HLL_BUCKETS * HLL_BUCKETS}
               / (SUM(pow(2.0, -m)) + ({HLL_BUCKETS} - COUNT(*))), 4) AS est
  FROM reg GROUP BY side
  UNION ALL
  SELECT 'union',
         ROUND({HLL_ALPHA} * {HLL_BUCKETS * HLL_BUCKETS}
               / (SUM(pow(2.0, -m)) + ({HLL_BUCKETS} - COUNT(*))), 4)
  FROM reg_u
),
est_i AS (
  SELECT 'intersect' AS measure,
         ROUND((SELECT est FROM est WHERE measure = 'F')
               + (SELECT est FROM est WHERE measure = 'O')
               - (SELECT est FROM est WHERE measure = 'union'), 4) AS est
),
exact AS (
  SELECT side AS measure, CAST(COUNT(*) AS BIGINT) AS exact
  FROM keys GROUP BY side
  UNION ALL
  SELECT 'union', CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM keys
  UNION ALL
  SELECT 'intersect', CAST(COUNT(*) AS BIGINT)
  FROM (SELECT o_custkey FROM keys WHERE side = 'F')
       NATURAL JOIN (SELECT o_custkey FROM keys WHERE side = 'O')
)
SELECT e.measure, e.est, x.exact
FROM (SELECT * FROM est UNION ALL SELECT * FROM est_i) e
JOIN exact x ON e.measure = x.measure
ORDER BY e.measure
"""


# ---------------------------------------------------------------------------
# Classical hypothesis tests over the event stream (SURVEY §2.27)
# ---------------------------------------------------------------------------

#: the two event types compared by the Mann-Whitney U test — chosen as
#: the conversion-funnel endpoints so the test asks a real question
#: ("do purchases carry different values than clicks?")
MW_GROUP_A = "purchase"
MW_GROUP_B = "click"


def _value_cents(col):
    """events.value is 2-dp by fixture contract; cents as exact int64
    (the repo-wide decimal(12,2)·100 convention, e.g. tsml.q_ewma)."""
    return (F.col(col).cast("decimal(12,2)") * 100).cast("long")


def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across the five event types
    (Fisher 1925): between/within sums of squares from per-group
    moments, the F statistic and effect size η². The continuous
    sibling of q_crosstab_chi2 and q_ab_ttest (k groups, not 2).

    Exactness: per-group n, Σcents, Σcents² are INTEGER-exact
    (order-independent partial aggregation); F and η² are scale-
    invariant, so the cents domain needs no rescaling and doubles
    appear only in the final k-row combination behind one ROUND —
    the q_crosstab_chi2 convention.

    100 TB shape: ONE map-side-combined groupBy collapses the fact
    table to k ≈ 5 moment rows; everything after is driver-trivial
    arithmetic on those rows. No second scan, no window.
    """
    e = load(spark, sf_dir, "events").select(
        "event_type", _value_cents("value").alias("c")
    )
    g = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    sg = F.col("s").cast("double")
    term = sg * sg / F.col("n").cast("double")
    stats = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_obs"),
        F.sum("s").alias("s_tot"),
        F.sum("q").alias("q_tot"),
        F.sum(term).alias("between_raw"),
    )
    s_tot = F.col("s_tot").cast("double")
    n_tot = F.col("n_obs").cast("double")
    ssb = F.col("between_raw") - s_tot * s_tot / n_tot
    ssw = F.col("q_tot").cast("double") - F.col("between_raw")
    f_stat = (ssb / (F.col("k") - F.lit(1)).cast("double")) / (
        ssw / (F.col("n_obs") - F.col("k")).cast("double")
    )
    return stats.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(f_stat, 4).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
    )


ORACLE_ANOVA = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                  * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY event_type
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_obs,
         CAST(SUM(s) AS DOUBLE) AS s_tot,
         CAST(SUM(q) AS DOUBLE) AS q_tot,
         SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS between_raw
  FROM g
)
SELECT k AS k_groups, n_obs,
       ROUND(((between_raw - s_tot * s_tot / CAST(n_obs AS DOUBLE))
               / CAST(k - 1 AS DOUBLE))
             / ((q_tot - between_raw) / CAST(n_obs - k AS DOUBLE)), 4) AS f_stat,
       ROUND((between_raw - s_tot * s_tot / CAST(n_obs AS DOUBLE))
             / ((between_raw - s_tot * s_tot / CAST(n_obs AS DOUBLE))
                + (q_tot - between_raw)), 6) AS eta_sq
FROM t
"""


def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event VALUE and ARRIVAL ORDER
    within each event type — 'is this event type's value drifting over
    time?' asked robustly (rank space, so outliers and the value
    distribution's shape don't matter). Ties get average (midrank)
    ranks; ρ uses the classical 1 − 6Σd²/(n(n²−1)) formula on those
    midranks (scipy's convention without the tie-correction term,
    stated in the column name as rho_d2).

    Exactness: midranks are half-integers, so 2·rank is INTEGER;
    Σ(2d)² = 4Σd² accumulates as exact int64 and ρ is ONE final
    double division. Nothing order-dependent crosses the engines.

    100 TB shape (r7): the VALUE midranks never rank rows — every row
    with value c in type g has 2·midrank = 2·cum_before(g,c) + t(g,c)
    + 1, so they come from the per-(type, value) HISTOGRAM (a walk
    over the domain-sized histogram, joined back on (type, c)); the
    ARRIVAL rank (tie-free by (ts_us, event_id)) comes from the
    group-aware distributed-rank kernel (chunked_group_rank) — no
    event type's full slice ever sits in one sorted partition, which
    Window.partitionBy(event_type) would force at any per-type
    volume.
    """
    e = load(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts_us", _value_cents("value").alias("c")
    )
    hist = e.groupBy("event_type", "c").agg(F.count("*").alias("t"))
    w_h = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mid = hist.select(
        "event_type",
        "c",
        (
            F.lit(2) * F.coalesce(F.sum("t").over(w_h), F.lit(0))
            + F.col("t")
            + F.lit(1)
        ).alias("r2"),
    )
    t_ranked = chunked_group_rank(
        e, ["event_type"], [F.asc("ts_us"), F.asc("event_id")], "trn"
    )
    ranked = t_ranked.join(mid, ["event_type", "c"]).select(
        "event_type", "r2", (F.lit(2) * F.col("trn")).alias("t2")
    )
    d2 = (F.col("r2") - F.col("t2")) * (F.col("r2") - F.col("t2"))
    n = F.col("n").cast("double")
    return (
        ranked.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(d2).alias("sum4d2"))
        .select(
            "event_type",
            "n",
            "sum4d2",
            F.round(
                F.lit(1.0)
                - F.lit(1.5) * F.col("sum4d2").cast("double") / (n * (n * n - 1.0)),
                6,
            ).alias("rho_d2"),
        )
        .orderBy("event_type")
    )


ORACLE_SPEARMAN = """
WITH e AS (
  SELECT event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
  FROM events
),
ranked AS (
  SELECT event_type,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY c)
           + COUNT(*) OVER (PARTITION BY event_type, c) - 1 AS r2,
         2 * ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts_us, event_id) AS t2
  FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((r2 - t2) * (r2 - t2)) AS BIGINT) AS sum4d2,
       ROUND(1.0 - 1.5 * CAST(SUM((r2 - t2) * (r2 - t2)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE)
                * (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) - 1.0)), 6)
         AS rho_d2
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test (Mann & Wilcoxon 1945/47): do purchase
    events carry systematically different values than click events?
    Midrank-based U with the tie-corrected normal approximation —
    the nonparametric sibling of q_ab_ttest (no normality assumption).

    Exactness: 2·midrank and 2·R₁ are INTEGER-exact, so U₁ arrives as
    an exact half-integer; the tie term Σ(t³−t) is an exact int64 from
    one value-frequency aggregate; σ and z combine those integers in
    doubles with identical parenthesization behind one ROUND.

    100 TB shape (r7, the plan the r6 docstring promised): the corpus
    collapses to the per-distinct-value histogram in ONE map-side-
    combined aggregate carrying both the group-A count and the tie
    count; the midrank walk is a window over the HISTOGRAM (value-
    domain-sized, never event rows — every A-row at value v has
    2·midrank = 2·cum_before(v) + t_v + 1, so Σ midranks decomposes
    over the histogram exactly); the final reduce is a 4-scalar
    aggregate. No row-level global sort ever happens — the same
    histogram-offset plan as q_auc_rank.
    """
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(MW_GROUP_A, MW_GROUP_B))
        .select("event_type", _value_cents("value").alias("c"))
    )
    freq = e.groupBy("c").agg(
        F.count("*").alias("t"),
        F.sum(
            F.when(F.col("event_type") == MW_GROUP_A, 1).otherwise(0)
        ).alias("a_cnt"),
    )
    win = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    ranked = freq.select(
        "t",
        "a_cnt",
        F.coalesce(F.sum("t").over(win), F.lit(0)).alias("cum_before"),
    )
    j = ranked.agg(
        F.sum(
            F.col("a_cnt")
            * (F.lit(2) * F.col("cum_before") + F.col("t") + F.lit(1))
        ).alias("r1_2"),
        F.sum("a_cnt").alias("n1"),
        (F.sum("t") - F.sum("a_cnt")).alias("n2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_sum"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    u1 = (F.col("r1_2").cast("double") - F.col("n1").cast("double") * (n1 + 1.0)) / 2.0
    sigma_sq = (
        n1 * n2 / 12.0 * ((n + 1.0) - F.col("tie_sum").cast("double") / (n * (n - 1.0)))
    )
    z = (u1 - n1 * n2 / 2.0) / F.sqrt(sigma_sq)
    return j.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(u1, 1).alias("u1"),
        F.round(z, 4).alias("z_score"),
    )


ORACLE_MANN_WHITNEY = f"""
WITH e AS (
  SELECT event_type, CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
  FROM events WHERE event_type IN ('{MW_GROUP_A}', '{MW_GROUP_B}')
),
ranked AS (
  SELECT event_type,
         2 * RANK() OVER (ORDER BY c) + COUNT(*) OVER (PARTITION BY c) - 1 AS r2
  FROM e
),
ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
  FROM (SELECT COUNT(*) AS t FROM e GROUP BY c)
),
s AS (
  SELECT CAST(SUM(CASE WHEN event_type = '{MW_GROUP_A}' THEN r2 END) AS BIGINT) AS r1_2,
         CAST(SUM(CASE WHEN event_type = '{MW_GROUP_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN event_type = '{MW_GROUP_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM ranked
)
SELECT n1, n2,
       ROUND((CAST(r1_2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0, 1) AS u1,
       ROUND(((CAST(r1_2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                    * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                       - CAST(tie_sum AS DOUBLE)
                         / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                            * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))), 4) AS z_score
FROM s CROSS JOIN ties
"""


def q_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) — the PAIRED member
    of the test family (q_ab_ttest/q_mann_whitney are unpaired): per
    user, the difference d = Σ purchase cents − Σ click cents; ranks
    of |d| (midranks, zero-differences dropped per the classic
    convention), W⁺ = Σ ranks of positive d, tie-corrected normal z.

    Exactness: d is an exact int64 (conditional cent sums in one
    map-side-combined groupBy); 2·midrank and 2W⁺ are exact integers;
    μ, σ², and z combine exact integers in doubles with identical
    parenthesization behind one ROUND.

    100 TB shape (r7): fact → per-user collapse (one shuffle), then
    the |d| HISTOGRAM (one map-side-combined aggregate carrying the
    positive-d count per |d|) and a midrank walk over that histogram —
    2·midrank(|d|) = 2·cum_before + t + 1, so W⁺ decomposes exactly
    over (|d|, pos_cnt) rows; no row-level rank window over the user
    table. Same histogram-offset plan as q_auc_rank/q_mann_whitney.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(MW_GROUP_A, MW_GROUP_B)
    )
    cents = _value_cents("value")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == MW_GROUP_A, cents).otherwise(0)).alias(
                "a"
            ),
            F.sum(F.when(F.col("event_type") == MW_GROUP_B, cents).otherwise(0)).alias(
                "b"
            ),
        )
        .select("user_id", (F.col("a") - F.col("b")).alias("d"))
        .filter(F.col("d") != 0)
    )
    absd = F.abs(F.col("d"))
    freq = per_user.groupBy(absd.alias("ad")).agg(
        F.count("*").alias("t"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("pos_cnt"),
    )
    win = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = freq.select(
        "t",
        "pos_cnt",
        F.coalesce(F.sum("t").over(win), F.lit(0)).alias("cum_before"),
    )
    stats = ranked.agg(
        F.sum("t").alias("n"),
        F.sum(
            F.col("pos_cnt")
            * (F.lit(2) * F.col("cum_before") + F.col("t") + F.lit(1))
        ).alias("wp_2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_sum"),
    )
    n = F.col("n").cast("double")
    w_plus = F.col("wp_2").cast("double") / 2.0
    mu = n * (n + 1.0) / 4.0
    sigma_sq = n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - F.col(
        "tie_sum"
    ).cast("double") / 48.0
    return stats.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(w_plus, 1).alias("w_plus"),
        F.round((w_plus - mu) / F.sqrt(sigma_sq), 4).alias("z_score"),
    )


ORACLE_WILCOXON = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = '{MW_GROUP_A}'
                  THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                  ELSE 0 END)
              - SUM(CASE WHEN event_type = '{MW_GROUP_B}'
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS d
  FROM events WHERE event_type IN ('{MW_GROUP_A}', '{MW_GROUP_B}')
  GROUP BY user_id
),
nz AS (SELECT d, abs(d) AS ad FROM per_user WHERE d <> 0),
ranked AS (
  SELECT d,
         2 * RANK() OVER (ORDER BY ad) + COUNT(*) OVER (PARTITION BY ad) - 1 AS r2
  FROM nz
),
ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
  FROM (SELECT COUNT(*) AS t FROM nz GROUP BY ad)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS wp_2
  FROM ranked
)
SELECT n AS n_pairs,
       ROUND(CAST(wp_2 AS DOUBLE) / 2.0, 1) AS w_plus,
       ROUND((CAST(wp_2 AS DOUBLE) / 2.0
              - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
             / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                    * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                    - CAST(tie_sum AS DOUBLE) / 48.0), 4) AS z_score
FROM s CROSS JOIN ties
"""


#: probe stride for q_quantile_normalize's per-row output (every 50th
#: event) — bounds result size while the normalization itself runs on
#: every row
QN_PROBE_MOD = 50


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (Bolstad 2003, the omics/feature-prep
    staple): map each group's values onto the POOLED distribution so
    every event type's value column becomes identically distributed —
    value at within-group percentile p is replaced by the pooled
    linear-interpolated quantile at p. Distribution-shift removal
    without a parametric model.

    Exactness: within-group percentile p = (rn−1)/(n_g−1) with a
    deterministic (value, event_id) tiebreak; the pooled quantile
    interpolates BIGINT cents at ⌊p·(N−1)⌋ and its successor — each
    output is ONE double expression from three exact integers, no
    cross-row double sums, ROUNDed once.

    100 TB shape: both ranks (per-group and pooled) are DISTRIBUTED —
    range-chunked local row_numbers stitched with partition-count-sized
    prefix-offset tables (see the inline note) — + an equi join on the
    pooled rank index; no single sorted partition ever holds the corpus
    or a full event type. The probe filter bounds the OUTPUT, not the
    computation.
    """
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", _value_cents("value").alias("c")
    )
    # Distributed rank (r7): the straight formulation — ROW_NUMBER over
    # ORDER BY (c, event_id) pooled, and per-type windows partitioned
    # only by the low-cardinality event_type — puts the WHOLE corpus
    # (or a type's full slice) through single sorted partitions. Range-
    # partition on the sort key instead; every rank then decomposes as
    # (prefix offset of the range chunk) + (rank within the chunk):
    # both the pooled and per-type windows below partition on pid
    # (chunk size ≈ N / shuffle-partitions by construction), and the
    # offsets come from per-(pid[, type]) COUNT tables whose size is
    # the partition-count domain — the same bounded-stitch pattern as
    # q_interval_overlap's day-chunked sweep. Ranks are unchanged:
    # (c, event_id) is a total order and range chunks are ascending,
    # so chunk-prefix + local rank == global rank.
    n_chunks = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    r = (
        e.repartitionByRange(n_chunks, "c", "event_id")
        .withColumn("pid", F.spark_partition_id())
        .transform(lineage_cut)
    )
    w_pool_local = Window.partitionBy("pid").orderBy("c", "event_id")
    w_type_local = Window.partitionBy("pid", "event_type").orderBy("c", "event_id")
    local = r.select(
        "event_id",
        "event_type",
        "c",
        "pid",
        F.row_number().over(w_pool_local).alias("lrn"),
        F.row_number().over(w_type_local).alias("lrn_g"),
    )
    chunk_counts = r.groupBy("pid", "event_type").agg(F.count("*").alias("n"))
    # offset tables: ≤ n_chunks × |types| rows — partition-count-sized
    w_pool_off = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    pool_off = (
        chunk_counts.groupBy("pid")
        .agg(F.sum("n").alias("n"))
        .select(
            "pid",
            F.coalesce(F.sum("n").over(w_pool_off), F.lit(0)).alias("off"),
        )
    )
    w_type_off = (
        Window.partitionBy("event_type")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    type_off = chunk_counts.select(
        "pid",
        "event_type",
        F.coalesce(F.sum("n").over(w_type_off), F.lit(0)).alias("off_g"),
    )
    ng_tbl = chunk_counts.groupBy("event_type").agg(F.sum("n").alias("ng"))
    ranked = (
        local.join(F.broadcast(pool_off), "pid")
        .join(F.broadcast(type_off), ["pid", "event_type"])
        .join(F.broadcast(ng_tbl), "event_type")
        .select(
            "event_id",
            "event_type",
            "c",
            (F.col("off_g") + F.col("lrn_g")).alias("rn"),
            "ng",
            (F.col("off") + F.col("lrn")).alias("pool_rn"),
        )
    )
    tot = e.agg(F.count("*").alias("n_tot"))
    pooled = ranked.select(
        F.col("c").alias("pc"), (F.col("pool_rn") - 1).alias("k")
    )
    p = (F.col("rn") - 1).cast("double") / (F.col("ng") - 1).cast("double")
    pos = p * (F.col("n_tot") - 1).cast("double")
    k = F.floor(pos).cast("long")
    joined = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("k", k)
        .withColumn("frac", pos - F.col("k").cast("double"))
        .join(pooled.select(F.col("k"), F.col("pc").alias("v0")), "k")
        .join(
            pooled.select((F.col("k") - 1).alias("k"), F.col("pc").alias("v1")),
            "k",
            "left",
        )
    )
    norm = (
        F.col("v0").cast("double")
        + F.col("frac")
        * (F.coalesce("v1", F.col("v0")).cast("double") - F.col("v0").cast("double"))
    ) / 100.0
    return (
        joined.filter(F.col("event_id") % QN_PROBE_MOD == 0)
        .select(
            "event_id",
            "event_type",
            F.round(F.col("c") / 100.0, 2).alias("value"),
            F.round(norm, 6).alias("norm_value"),
        )
        .orderBy("event_id")
    )


ORACLE_QUANTILE_NORMALIZE = f"""
WITH e AS (
  SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
  FROM events
),
ranked AS (
  SELECT event_id, event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS ng
  FROM e
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM e),
pooled AS (
  SELECT c AS pc, ROW_NUMBER() OVER (ORDER BY c, event_id) - 1 AS k FROM e
),
pos AS (
  SELECT r.event_id, r.event_type, r.c,
         CAST(r.rn - 1 AS DOUBLE) / CAST(r.ng - 1 AS DOUBLE)
           * CAST(t.n_tot - 1 AS DOUBLE) AS pk
  FROM ranked r CROSS JOIN tot t
)
SELECT p.event_id, p.event_type,
       ROUND(p.c / 100.0, 2) AS value,
       ROUND((CAST(p0.pc AS DOUBLE)
              + (p.pk - CAST(FLOOR(p.pk) AS DOUBLE))
                * (CAST(COALESCE(p1.pc, p0.pc) AS DOUBLE) - CAST(p0.pc AS DOUBLE)))
             / 100.0, 6) AS norm_value
FROM pos p
JOIN pooled p0 ON p0.k = CAST(FLOOR(p.pk) AS BIGINT)
LEFT JOIN pooled p1 ON p1.k = CAST(FLOOR(p.pk) AS BIGINT) + 1
WHERE p.event_id % {QN_PROBE_MOD} = 0
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# K-minimum-values (theta) distinct sketch (SURVEY §2.30)
# ---------------------------------------------------------------------------

#: sketch size — k smallest hash values retained (Bar-Yossef 2002 /
#: theta-sketch KMV form); (k−1)/θ estimator, ~1/√(k−2) relative error
KMV_K = 64
KMV_A, KMV_B = 1103515245, 12345
KMV_P = 2_147_483_647


def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef 2002; the KMV form
    of the theta sketch): hash every order's customer key to [0, P),
    keep the K smallest DISTINCT hash values, estimate distinct
    customers as (K−1)·P/h_K. Completes the sketch family next to
    Count-Min (frequency) and HLL (bit-pattern distinct): KMV is the
    mergeable-by-union form with a tunable-k error knob, and — unlike
    HLL — supports set intersection via the theta framework. Exact
    distinct count reported alongside for error accounting, the
    q_sketch_union convention.

    Exactness: the Carter–Wegman-style hash is +·% integer arithmetic
    (identical in both engines); h_K and the estimator numerator are
    exact integers, ONE final division is displayed.

    100 TB shape: the distinct-hash set collapses map-side (partial
    aggregation on the hash key), and TakeOrderedAndProject keeps only
    K rows per partition before the single-partition merge — the
    mergeable-sketch property expressed as a physical plan. No full
    sort, no full dedup shuffle of the raw fact.
    """
    o = load(spark, sf_dir, "orders").select("o_custkey")
    h = ((F.col("o_custkey") + 1) * KMV_A + KMV_B) % KMV_P
    mins = (
        o.select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    kth = mins.agg(F.max("h").alias("h_k"), F.count("*").alias("k_got"))
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return kth.crossJoin(F.broadcast(exact)).select(
        F.col("k_got").cast("long").alias("k"),
        F.col("h_k").cast("long").alias("h_k"),
        F.round(
            (F.col("k_got") - 1).cast("double")
            * F.lit(float(KMV_P))
            / F.col("h_k").cast("double"),
            2,
        ).alias("est_distinct"),
        F.col("n_exact").cast("long").alias("n_exact"),
    )


ORACLE_KMV_SKETCH = f"""
WITH mins AS (
  SELECT DISTINCT ((o_custkey + 1) * {KMV_A} + {KMV_B}) % {KMV_P} AS h
  FROM orders ORDER BY h LIMIT {KMV_K}
),
kth AS (SELECT MAX(h) AS h_k, CAST(COUNT(*) AS BIGINT) AS k_got FROM mins),
ex AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM orders)
SELECT k_got AS k, CAST(h_k AS BIGINT) AS h_k,
       ROUND(CAST(k_got - 1 AS DOUBLE) * {float(KMV_P)} / CAST(h_k AS DOUBLE), 2)
         AS est_distinct,
       n_exact
FROM kth CROSS JOIN ex
"""


QUERIES = {
    "q_count_min": q_count_min,
    "q_weighted_median": q_weighted_median,
    "q_auc_rank": q_auc_rank,
    "q_decayed_count": q_decayed_count,
    "q_sorted_neighborhood": q_sorted_neighborhood,
    "q_rfm": q_rfm,
    "q_diff_snapshot": q_diff_snapshot,
    "q_pca_power": q_pca_power,
    "q_pq_ann": q_pq_ann,
    "q_trend_fit": q_trend_fit,
    "q_theilsen": q_theilsen,
    "q_autocorr": q_autocorr,
    "q_benford": q_benford,
    "q_temporal_graph": q_temporal_graph,
    "q_crosstab_chi2": q_crosstab_chi2,
    "q_null_imputation": q_null_imputation,
    "q_one_hot": q_one_hot,
    "q_histogram_2d": q_histogram_2d,
    "q_neighbor_agg": q_neighbor_agg,
    "q_graph_drift": q_graph_drift,
    "q_bollinger": q_bollinger,
    "q_allocation": q_allocation,
    "q_survivorship": q_survivorship,
    "q_pareto_abc": q_pareto_abc,
    "q_gini": q_gini,
    "q_kaplan_meier": q_kaplan_meier,
    "q_cohort_ltv": q_cohort_ltv,
    "q_assoc_rules": q_assoc_rules,
    "q_sketch_union": q_sketch_union,
    "q_anova": q_anova,
    "q_spearman": q_spearman,
    "q_mann_whitney": q_mann_whitney,
    "q_wilcoxon": q_wilcoxon,
    "q_quantile_normalize": q_quantile_normalize,
    "q_kmv_sketch": q_kmv_sketch,
}

# rows-only: q_pca_power (eigendecomposition not SQL-expressible;
# numpy golden in tests/test_llm_ops.py), q_pq_ann (iterative k-means
# codebooks; recall/determinism invariants in tests/test_llm_ops.py)
ORACLES = {
    "q_count_min": ORACLE_COUNT_MIN,
    "q_weighted_median": ORACLE_WEIGHTED_MEDIAN,
    "q_auc_rank": ORACLE_AUC_RANK,
    "q_decayed_count": ORACLE_DECAYED_COUNT,
    "q_sorted_neighborhood": ORACLE_SORTED_NEIGHBORHOOD,
    "q_rfm": ORACLE_RFM,
    "q_diff_snapshot": ORACLE_DIFF_SNAPSHOT,
    "q_trend_fit": ORACLE_TREND_FIT,
    "q_theilsen": ORACLE_THEILSEN,
    "q_autocorr": ORACLE_AUTOCORR,
    "q_benford": ORACLE_BENFORD,
    "q_temporal_graph": ORACLE_TEMPORAL_GRAPH,
    "q_crosstab_chi2": ORACLE_CROSSTAB_CHI2,
    "q_null_imputation": ORACLE_NULL_IMPUTATION,
    "q_one_hot": ORACLE_ONE_HOT,
    "q_histogram_2d": ORACLE_HISTOGRAM_2D,
    "q_neighbor_agg": ORACLE_NEIGHBOR_AGG,
    "q_graph_drift": ORACLE_GRAPH_DRIFT,
    "q_bollinger": ORACLE_BOLLINGER,
    "q_allocation": ORACLE_ALLOCATION,
    "q_survivorship": ORACLE_SURVIVORSHIP,
    "q_pareto_abc": ORACLE_PARETO_ABC,
    "q_gini": ORACLE_GINI,
    "q_kaplan_meier": ORACLE_KAPLAN_MEIER,
    "q_cohort_ltv": ORACLE_COHORT_LTV,
    "q_assoc_rules": ORACLE_ASSOC_RULES,
    "q_sketch_union": ORACLE_SKETCH_UNION,
    "q_anova": ORACLE_ANOVA,
    "q_spearman": ORACLE_SPEARMAN,
    "q_mann_whitney": ORACLE_MANN_WHITNEY,
    "q_wilcoxon": ORACLE_WILCOXON,
    "q_quantile_normalize": ORACLE_QUANTILE_NORMALIZE,
    "q_kmv_sketch": ORACLE_KMV_SKETCH,
    "q_pq_ann": _oracle_pq_ann(),
}
