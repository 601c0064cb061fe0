"""Statistical / source-format / graph-metric analytics (SURVEY.md
§2.16, round-2 pack, second batch): moment aggregates, FILTER-clause
aggregation, ordered string aggregation, time-hierarchy ROLLUP, an
explicitly salted skew join, JSON and ORC source round trips, local
clustering coefficients, Adamic–Adar link prediction, degree
distributions, degree assortativity, BM25 ranking, unigram
cross-entropy scoring, and z-score outlier flagging.

Scale notes: every operator is a single map-side-combined aggregation,
a broadcast-joined scalar, or a bounded wedge join on a small graph
fixture; the salted join demonstrates the manual hot-key remedy whose
output is provably identical to the unsalted plan (same oracle).
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .session import lineage_cut

from .graph import _KARATE_SQL, _KARATE_W_SQL, symmetrize, vertices_of
from .llm_ops import tokens_of
from .sources import COPURCHASE_EDGES_SQL, copurchase_edges, karate_edges, load

#: BM25 free parameters (Robertson–Spärck Jones defaults)
BM25_K1 = 1.2
BM25_B = 0.75
#: fixed keyword query for the BM25 ranking demo (synthetic-corpus vocab)
BM25_TERMS = ("spark", "join", "filter")
#: salt fan-out for the skewed-key join demo
SALTS = 8


# ---------------------------------------------------------------------------
# statistical aggregates
# ---------------------------------------------------------------------------


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate family per return flag: Pearson
    correlation, population/sample covariance, population/sample
    standard deviation of (quantity, extendedprice). All are single
    map-side-combinable aggregates (Spark's central-moment partial
    state merges associatively — the 100 TB shape). Rounded for
    cross-engine accumulation-order stability."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("covar_pop_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_samp_qp"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("stddev_pop_q"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("stddev_samp_q"),
    )


ORACLE_STATS_AGG = """
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 6)       AS corr_qp,
       ROUND(covar_pop(l_quantity, l_extendedprice), 2)  AS covar_pop_qp,
       ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_samp_qp,
       ROUND(stddev_pop(l_quantity), 4)                  AS stddev_pop_q,
       ROUND(stddev_samp(l_quantity), 4)                 AS stddev_samp_q
FROM lineitem
GROUP BY l_returnflag
"""


def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregation: conditional counts/sums without
    a self-join or CASE pyramid — one pass, partial+final aggregate.
    (l_quantity is integer-valued, so double sums are exact.)"""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_fa")
    return spark.sql(
        """
        SELECT l_linestatus,
               COUNT(*)                                              AS n_rows,
               COUNT(*)    FILTER (WHERE l_quantity > 25)            AS n_bulk,
               SUM(l_quantity) FILTER (WHERE l_discount > 0.05)      AS qty_discounted,
               COUNT(*)    FILTER (WHERE l_tax = 0.0)                AS n_taxfree
        FROM lineitem_fa
        GROUP BY l_linestatus
        """
    )


ORACLE_FILTERED_AGG = """
SELECT l_linestatus,
       COUNT(*)                                              AS n_rows,
       COUNT(*)    FILTER (WHERE l_quantity > 25)            AS n_bulk,
       SUM(l_quantity) FILTER (WHERE l_discount > 0.05)      AS qty_discounted,
       COUNT(*)    FILTER (WHERE l_tax = 0.0)                AS n_taxfree
FROM lineitem
GROUP BY l_linestatus
"""


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per nation: the distinct market
    segments of its customers as one sorted delimited string (the
    collect_set is bounded by the segment domain, not the row count —
    safe at scale)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
                "segments"
            ),
        )
    )


ORACLE_STRING_AGG = """
SELECT n_name,
       COUNT(*) AS n_customers,
       string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy ROLLUP (year → month → grand total) over orders
    — the standard reporting cube along the natural date drill path.
    Money summed as DECIMAL(18,2) — exact, order-independent — then the
    final total cast to DOUBLE so both engines emit the same column type
    (the driver's value-hash is type-sensitive)."""
    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return o.rollup("o_year", "o_month").agg(
        F.count("*").alias("n_orders"),
        F.sum("price").cast("double").alias("sum_price"),
    )


ORACLE_ROLLUP_TIME = """
SELECT year(o_orderdate)  AS o_year,
       month(o_orderdate) AS o_month,
       COUNT(*)           AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
"""


# ---------------------------------------------------------------------------
# salted skew join
# ---------------------------------------------------------------------------


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly salted hot-key join: events' 5-value event_type is
    the canonical skew shape (every row of a key lands on one shuffle
    partition). The dimension side is replicated across SALTS salt
    values and the fact side picks a deterministic salt, so each hot
    key fans out over SALTS reducers; the post-join aggregate ignores
    the salt, making the result provably identical to the unsalted
    join — the oracle IS the unsalted join. AQE's skew handling only
    rewrites sort-merge plans after a stage materializes; manual
    salting is the source-side fix that also covers hash joins.
    """
    e = load(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .select("event_type", F.length("event_type").alias("type_weight"))
    )
    dim_salted = dim.crossJoin(
        spark.range(SALTS).select(F.col("id").cast("int").alias("salt"))
    )
    fact = e.select(
        "event_type",
        "value",
        F.pmod(F.xxhash64("event_id"), F.lit(SALTS)).cast("int").alias("salt"),
    )
    return (
        fact.join(F.broadcast(dim_salted), ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("type_weight")), 2).alias(
                "weighted_value"
            ),
        )
    )


ORACLE_SALTED_JOIN = """
WITH dim AS (SELECT DISTINCT event_type, strlen(event_type) AS type_weight FROM events)
SELECT e.event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(e.value * d.type_weight), 2) AS weighted_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
"""


# ---------------------------------------------------------------------------
# source-format round trips
# ---------------------------------------------------------------------------


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return os.path.join("/root/repo/.tmp", f"{fmt}_sink_{tag}")


def q_read_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round trip: export events to JSONL, read back
    with an explicit schema (no inference pass), aggregate. The oracle
    recomputes from the parquet source, so the trip must be lossless —
    doubles survive via Jackson's shortest-round-trip repr, int64 via
    exact decimal text. At 100 TB: JSONL splits by newline across
    executors; the explicit schema avoids a full inference scan."""
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value", "ts_us")
    out = _roundtrip_dir(sf_dir, "json")
    e.write.mode("overwrite").json(out)
    back = spark.read.json(
        out, schema="event_id LONG, event_type STRING, value DOUBLE, ts_us LONG"
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("ts_us").alias("max_ts_us"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


ORACLE_READ_JSON = """
SELECT event_type,
       COUNT(*)               AS n_events,
       MIN(event_id)          AS min_event_id,
       MAX(CAST(epoch_us(ts) AS BIGINT)) AS max_ts_us,
       ROUND(SUM(value), 2)   AS sum_value
FROM events
GROUP BY event_type
"""


def q_read_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source round trip with full quoting: export documents
    (free text with embedded commas/quotes) to headered CSV, read back
    with an explicit schema — no inference pass, no malformed-row
    tolerance (FAILFAST surfaces quoting bugs instead of nulling them).
    The per-group aggregate includes Σ len(text), so any mis-quoted
    split corrupts the checksum and the oracle (which recomputes from
    parquet) catches it. At 100 TB: CSV splits by newline; multiLine
    stays off (quoted newlines would serialize the split, and the
    corpus has none)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source", "n_chars")
    out = _roundtrip_dir(sf_dir, "csv")
    d.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.csv(
        out,
        header=True,
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        mode="FAILFAST",
    )
    return back.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("total_text_len"),
        F.min("doc_id").alias("min_doc_id"),
    )


ORACLE_READ_CSV = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_text_len,
       MIN(doc_id) AS min_doc_id
FROM documents
GROUP BY lang, source
"""


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an 'old' extract (2 columns) unioned
    with a 'new' extract that gained a column — ``unionByName(
    allowMissingColumns=True)`` aligns by NAME and null-fills the
    missing column, the lakehouse append pattern when producers
    upgrade schemas at different times. The aggregate separates old
    rows (NULL priority → '(pre-schema)') from new, so a positional
    union or wrong fill breaks the hash."""
    o = load(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderdate") < "1997-01-01").select(
        "o_orderkey", "o_totalprice"
    )
    new = o.filter(F.col("o_orderdate") >= "1997-01-01").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    u = old.unionByName(new, allowMissingColumns=True)
    return u.groupBy(
        F.coalesce("o_orderpriority", F.lit("(pre-schema)")).alias("priority")
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


ORACLE_UNION_BY_NAME = """
WITH u AS (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
)
SELECT COALESCE(o_orderpriority, '(pre-schema)') AS priority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
         AS total_price
FROM u GROUP BY 1
"""


def q_read_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution on READ: two batches written with
    different schemas (the second gained event_type) merged into one
    unified scan via ``mergeSchema`` — the reader-side half of the
    lakehouse evolution story (q_union_by_name is the writer-side
    half). Old-batch rows surface NULL for the new column; the oracle
    recomputes the same split from the source, so a mis-merge or
    wrong fill breaks the hash. At 100 TB mergeSchema is a
    footer-only operation (schemas union across files; data is not
    rewritten)."""
    import hashlib
    import os

    e = load(spark, sf_dir, "events")
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = os.path.join("/root/repo/.tmp", f"evolve_{tag}")
    old_half = e.filter(F.col("event_id") % 2 == 0).select("event_id", "value")
    new_half = e.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "value", "event_type"
    )
    old_half.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    new_half.write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
    back = spark.read.option("mergeSchema", True).parquet(
        os.path.join(out, "batch=1"), os.path.join(out, "batch=2")
    )
    return back.groupBy(
        F.coalesce("event_type", F.lit("(pre-schema)")).alias("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


ORACLE_READ_MERGE_SCHEMA = """
SELECT COALESCE(CASE WHEN event_id % 2 = 1 THEN event_type END,
                '(pre-schema)') AS event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


#: compaction bin target payload (chars) — sized so test scales yield
#: several bins per language
BINPACK_TARGET = 50_000


def q_bin_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction / OPTIMIZE planner: pack per-(lang, source) document
    groups into target-sized bins by running-total assignment over the
    size-descending manifest — the deterministic windowed equivalent
    of first-fit-decreasing that lakehouse OPTIMIZE jobs use to plan
    small-file rewrites. bin = floor((running Σ bytes − 1) / target):
    pure integer arithmetic over MANIFEST rows.

    100 TB shape: the planner touches metadata only — the fact scan
    collapses to the (lang, source) manifest first (one map-side
    aggregate), and the ranking window sorts manifest rows within
    each lang partition, never data. The plan's output (which groups
    co-locate) is what a rewrite job would then execute."""
    d = load(spark, sf_dir, "documents")
    manifest = d.groupBy("lang", "source").agg(F.sum("n_chars").alias("bytes"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("bytes"), "source")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = manifest.select(
        "lang",
        "source",
        "bytes",
        ((F.sum("bytes").over(w) - 1) / F.lit(BINPACK_TARGET))
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("bytes").alias("bin_bytes"),
        )
        .orderBy("lang", "bin")
    )


ORACLE_BIN_PACK = f"""
WITH manifest AS (
  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY 1, 2
),
binned AS (
  SELECT lang, source, bytes,
         CAST((SUM(bytes) OVER (PARTITION BY lang ORDER BY bytes DESC, source
                                ROWS UNBOUNDED PRECEDING) - 1)
              // {BINPACK_TARGET} AS BIGINT) AS bin
  FROM manifest
)
SELECT lang, bin, COUNT(*) AS n_groups,
       CAST(SUM(bytes) AS BIGINT) AS bin_bytes
FROM binned GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_nested_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-schema round trip with NESTED FIELD PRUNING: write a
    parquet whose rows carry a struct (price, priority) and an array,
    read it back touching ONLY struct.priority, and aggregate. The
    read-back scan's ReadSchema must contain just the one struct leaf
    (plan-guarded in tests/test_coverage.py) — Spark's
    ``nestedSchemaPruning`` pushes the projection into the parquet
    column chunks, so at 100 TB the untouched price/array columns are
    never decoded or even read off storage. Oracle recomputes from
    the flat source, so a lossy nested round trip breaks values."""
    import hashlib
    import os

    o = load(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        ).alias("info"),
        F.array(F.col("o_custkey"), F.col("o_orderkey") % 97).alias("tags"),
    )
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = os.path.join("/root/repo/.tmp", f"nested_{tag}")
    nested.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("info.prio").alias("prio"))
        .agg(F.count("*").alias("n"), F.max("o_orderkey").alias("max_key"))
        .orderBy("prio")
    )


ORACLE_NESTED_PRUNE = """
SELECT o_orderpriority AS prio, COUNT(*) AS n,
       MAX(o_orderkey) AS max_key
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics parity surface: three-valued logic pinned
    value-exactly across engines — null-safe equality (``<=>`` / IS
    NOT DISTINCT FROM), COUNT(*) vs COUNT(col), null-skipping
    aggregates, and coalesce fills, over a derived column that is NULL
    for sub-threshold values. This is where engines silently diverge;
    the oracle spells each construct in DuckDB's dialect."""
    e = load(spark, sf_dir, "events")
    v = F.when(F.col("value") >= 50.0, F.col("value"))
    return (
        e.select("event_type", v.alias("v"), F.col("value").alias("raw"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("v").alias("n_nonnull"),
            F.sum(F.col("v").eqNullSafe(F.lit(None).cast("double")).cast("long")).alias(
                "n_null_safe_eq_null"
            ),
            F.round(F.sum(F.coalesce(F.col("v"), F.lit(0.0)).cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_filled"),
            # exact-decimal sum / nonnull count: both engines divide the
            # SAME double numerator (decimal-avg internals round 6ths
            # differently across engines)
            F.round(
                F.sum(F.col("v").cast("decimal(12,2)")).cast("double")
                / F.count("v"),
                6,
            ).alias("avg_nonnull"),
        )
    )


ORACLE_NULL_SEMANTICS = """
WITH t AS (
  SELECT event_type,
         CASE WHEN value >= 50.0 THEN value END AS v
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(v) AS n_nonnull,
       CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_safe_eq_null,
       CAST(ROUND(SUM(CAST(COALESCE(v, 0.0) AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS sum_filled,
       ROUND(CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) / COUNT(v), 6)
         AS avg_nonnull
FROM t GROUP BY event_type
"""


def q_read_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round trip (the second columnar format Spark ships
    a vectorized reader for): write lineitem's projection to ORC, read
    it back, aggregate. Oracle recomputes from parquet — the binary
    round trip is exact. Column pruning and predicate pushdown work on
    ORC scans exactly as on parquet."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    out = _roundtrip_dir(sf_dir, "orc")
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.filter(F.col("l_quantity") >= 30)
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


ORACLE_READ_ORC = """
SELECT l_linestatus,
       COUNT(*)        AS n_rows,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_quantity >= 30
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# graph metrics
# ---------------------------------------------------------------------------


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node (karate): the fraction of
    a node's neighbor pairs that are themselves connected —
    lcc(u) = 2·tri(u) / (deg(u)·(deg(u)−1)). Wedge join bounded by
    Σ deg², the same rank-oriented shape as q_triangle_count. The
    division is a single IEEE op over exact integers → bit-identical
    across engines, no rounding needed."""
    edges = karate_edges(spark).select("src", "dst")
    sym = symmetrize(edges.withColumn("weight", F.lit(1.0))).select("src", "dst")
    canon = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
    wedges = (
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(
            sym.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            "u",
        )
        .filter(F.col("v") < F.col("w"))
    )
    tri = (
        wedges.join(
            canon,
            (F.col("v") == F.col("a")) & (F.col("w") == F.col("b")),
        )
        .groupBy(F.col("u").alias("id"))
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


ORACLE_CLUSTERING_COEFF = f"""
WITH e AS (SELECT src, dst FROM ({_KARATE_SQL})),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
canon AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
deg AS (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src),
tri AS (
  SELECT s1.src AS id, COUNT(*) AS triangles
  FROM sym s1 JOIN sym s2 ON s1.src = s2.src AND s1.dst < s2.dst
  JOIN canon c ON s1.dst = c.a AND s2.dst = c.b
  GROUP BY s1.src
)
SELECT deg.id, deg.degree,
       COALESCE(tri.triangles, 0) AS triangles,
       CASE WHEN deg.degree >= 2
            THEN 2.0 * COALESCE(tri.triangles, 0) / (deg.degree * (deg.degree - 1.0))
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN tri ON deg.id = tri.id
"""


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction on karate: for every non-adjacent
    node pair sharing ≥1 common neighbor, score = Σ_z 1/ln(deg(z))
    over common neighbors z. Inverted-index join on the shared
    neighbor (only co-neighbor pairs materialize — never all pairs);
    common neighbors have deg ≥ 2 so ln never vanishes. Score rounded
    6 dp (summation order differs across engines)."""
    edges = karate_edges(spark).select("src", "dst")
    sym = symmetrize(edges.withColumn("weight", F.lit(1.0))).select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("z")).agg(F.count("*").alias("deg_z"))
    canon = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    pairs = (
        sym.select(F.col("dst").alias("z"), F.col("src").alias("a"))
        .join(sym.select(F.col("dst").alias("z"), F.col("src").alias("b")), "z")
        .filter(F.col("a") < F.col("b"))
        .join(canon, ["a", "b"], "left_anti")
        .join(deg, "z")
    )
    return pairs.groupBy("a", "b").agg(
        F.count("*").alias("n_common"),
        F.round(F.sum(1.0 / F.log(F.col("deg_z").cast("double"))), 6).alias("aa_score"),
    )


ORACLE_ADAMIC_ADAR = f"""
WITH e AS (SELECT src, dst FROM ({_KARATE_SQL})),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
deg AS (SELECT src AS z, COUNT(*) AS deg_z FROM sym GROUP BY src),
canon AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
cand AS (
  SELECT s1.src AS a, s2.src AS b, s1.dst AS z
  FROM sym s1 JOIN sym s2 ON s1.dst = s2.dst AND s1.src < s2.src
  WHERE NOT EXISTS (SELECT 1 FROM canon c WHERE c.a = s1.src AND c.b = s2.src)
)
SELECT a, b, COUNT(*) AS n_common,
       ROUND(SUM(1.0 / ln(CAST(deg_z AS DOUBLE))), 6) AS aa_score
FROM cand JOIN deg USING (z)
GROUP BY a, b
"""


def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph: how many vertices
    have each (unweighted) degree — the first diagnostic of skew (a
    power-law tail here means hub salting is needed). Two map-side-
    combined aggregates, both on already-small domains."""
    edges = copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count("*").alias("n_vertices"))


ORACLE_DEGREE_DIST = f"""
WITH e AS ({COPURCHASE_EDGES_SQL}),
deg AS (
  SELECT id, COUNT(*) AS degree
  FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
  GROUP BY id
)
SELECT degree, COUNT(*) AS n_vertices FROM deg GROUP BY degree
"""


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: Pearson
    correlation of endpoint degrees over the symmetrized edge list
    (negative for hub-and-spoke bipartite graphs like this one). One
    degree aggregate + two broadcast-sized joins + one moment
    aggregate."""
    edges = copurchase_edges(spark, sf_dir)
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
    both = (
        sym.join(deg.select(F.col("id").alias("src"), F.col("degree").alias("deg_src")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("deg_dst")), "dst")
    )
    return both.agg(
        F.count("*").alias("n_edge_ends"),
        F.round(F.corr("deg_src", "deg_dst"), 6).alias("assortativity"),
    )


ORACLE_ASSORTATIVITY = f"""
WITH e AS ({COPURCHASE_EDGES_SQL}),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
deg AS (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src)
SELECT COUNT(*) AS n_edge_ends,
       ROUND(corr(ds.degree, dd.degree), 6) AS assortativity
FROM sym JOIN deg ds ON sym.src = ds.id JOIN deg dd ON sym.dst = dd.id
"""


# ---------------------------------------------------------------------------
# text ranking / scoring
# ---------------------------------------------------------------------------


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword ranking (k1=1.2, b=0.75) of documents against a
    fixed term query — the classic retrieval scorer and the lexical
    half of hybrid (BM25 + embedding) search. Corpus stats (N, avgdl,
    per-term df) are broadcast-sized; the per-doc score is one
    aggregate over ≤|query| rows per doc. Rounded 6 dp (cross-engine
    term-sum order)."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_of(d).filter(F.col("token").isin(*BM25_TERMS))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = d.agg(F.count("*").alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_hit"),
        F.round(F.sum("term_score"), 6).alias("bm25"),
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

ORACLE_BM25 = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks
  WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token
),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT AVG(dl) FROM dl) AS avgdl
),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({BM25_K1!r} + 1.0))
           / (tf.tf + {BM25_K1!r} * (1.0 - {BM25_B!r} + {BM25_B!r} * dl.dl / stats.avgdl))
           AS term_score
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats
)
SELECT doc_id, COUNT(*) AS n_terms_hit, ROUND(SUM(term_score), 6) AS bm25
FROM scored GROUP BY doc_id
"""


def q_unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy per document (bits/token): −mean log₂ of
    the corpus-frequency probability of each token — the classic
    cheap 'perplexity' quality signal for training-data filtering
    (low = repetitive boilerplate, high = rare-token noise). Corpus LM
    is a broadcast-sized token table; per-doc score is one aggregate.
    Rounded 6 dp."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_of(d).filter(F.col("token") != "")
    lm = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = lm.agg(F.sum("cnt").alias("total"))
    probs = lm.crossJoin(F.broadcast(total)).select(
        "token", (F.col("cnt") / F.col("total")).alias("p")
    )
    return (
        toks.join(F.broadcast(probs), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(-F.avg(F.log("p")) / F.log(F.lit(2.0)), 6).alias("bits_per_token"),
        )
    )


ORACLE_UNIGRAM_SURPRISE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
t AS (SELECT doc_id, token FROM toks WHERE token <> ''),
lm AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
probs AS (SELECT token, cnt / (SELECT SUM(cnt) FROM lm) AS p FROM lm)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(-AVG(ln(p)) / ln(2.0), 6) AS bits_per_token
FROM t JOIN probs USING (token)
GROUP BY doc_id
"""


def q_zscore_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flagging of event values — the
    standard streaming-adjacent anomaly screen, expressed as one stats
    aggregate broadcast back over the fact table (no window sort over
    the full stream). The flag derives from the ROUNDED z so the
    boundary decision is identical in both engines."""
    e = load(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("zscore"),
            (F.abs(z) > 2.0).alias("is_outlier"),
        )
    )


ORACLE_ZSCORE_OUTLIER = """
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       ROUND((value - mu) / sigma, 4) AS zscore,
       abs(ROUND((value - mu) / sigma, 4)) > 2.0 AS is_outlier
FROM events e JOIN stats USING (event_type)
"""


# ---------------------------------------------------------------------------
# iterative graph algorithms with bounded SQL oracles
# ---------------------------------------------------------------------------

#: Bellman–Ford round budget for the SSSP oracle query. The weighted
#: karate fixture's true shortest paths use ≤ 4 hops (asserted against
#: networkx Dijkstra in tests), so 6 synchronized rounds reach the
#: fixpoint with margin, and the oracle's walk enumeration stays small.
SSSP_MAX_HOPS = 6
SSSP_SOURCE = 0

#: personalized-PageRank parameters (restart mass concentrated on the
#: source node; total rank mass = 1)
PPR_ALPHA = 0.85
PPR_ITERS = 20
PPR_SOURCE = 0


def sssp_weighted(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    max_hops: int,
) -> DataFrame:
    """Single-source shortest path distances by synchronized
    Bellman–Ford relaxation: ``max_hops`` rounds of (frontier ⋈ edges →
    min-aggregate). Returns (id, dist) for reached nodes.

    100 TB shape: each round is one join of the n-row distance table
    against the (cached) edge list plus one map-side-combined min
    aggregate — the Pregel message pattern, same as
    connected_components; lineage truncated per round. Round count is
    bounded by the hop diameter, not n.
    """
    sym = symmetrize(edges).transform(lineage_cut)
    dist = spark.createDataFrame([(source, 0.0)], "id LONG, dist DOUBLE")
    for _ in range(max_hops):
        contrib = sym.join(
            dist.select(F.col("id").alias("src"), "dist"), "src"
        ).select(F.col("dst").alias("id"), (F.col("dist") + F.col("weight")).alias("dist"))
        dist = (
            dist.unionByName(contrib)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .transform(lineage_cut)
        )
    return dist


def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest hops/distances from node 0 on
    the weighted karate fixture (6 relaxation rounds = fixpoint, see
    SSSP_MAX_HOPS). Distances are exact float equality with the
    oracle: IEEE addition is monotone, so round-k relaxation computes
    exactly min over ≤k-edge left-associated path sums — the same set
    the oracle's bounded walk enumeration minimizes."""
    edges = karate_edges(spark, weighted=True)
    return sssp_weighted(spark, edges, SSSP_SOURCE, SSSP_MAX_HOPS)


ORACLE_SSSP_WEIGHTED = f"""
WITH RECURSIVE e AS (
  SELECT src, dst, weight FROM ({_KARATE_W_SQL})
),
sym AS (
  SELECT src, dst, weight FROM e
  UNION ALL SELECT dst, src, weight FROM e WHERE src <> dst
),
walk(id, dist, hops) AS (
  SELECT CAST({SSSP_SOURCE} AS BIGINT) AS id, CAST(0.0 AS DOUBLE) AS dist, 0 AS hops
  UNION ALL
  SELECT sym.dst AS id, walk.dist + sym.weight AS dist, walk.hops + 1 AS hops
  FROM walk JOIN sym ON sym.src = walk.id
  WHERE walk.hops < {SSSP_MAX_HOPS}
)
SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
"""


def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    iters: int = PPR_ITERS,
    alpha: float = PPR_ALPHA,
) -> DataFrame:
    """Personalized PageRank with restart mass on one source node:
    r ← (1−α)·e_source + α·Wᵀr, r₀ = e_source. Same superstep shape
    as pagerank (one edge join + one map-side-combined aggregate per
    iteration, static degree table cached, lineage truncated); the
    restart vector replaces the uniform teleport, which is what powers
    'related items' / local-community queries at scale. Assumes no
    dangling nodes (symmetrized input), matching the oracle."""
    verts = vertices_of(edges).transform(lineage_cut)
    wout = edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("wout"))
    base = verts.join(wout, "id").transform(lineage_cut)
    restart = F.when(F.col("id") == source, 1.0).otherwise(0.0)
    ranks = base.select("id", "wout", restart.alias("r"))
    for _ in range(iters):
        flow = (
            edges.join(
                ranks.select(F.col("id").alias("src"), "r", F.col("wout").alias("w_src")),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("r") * F.col("weight") / F.col("w_src")).alias("flow"))
        )
        ranks = (
            base.join(flow, "id", "left")
            .select(
                "id",
                "wout",
                (
                    F.lit(1.0 - alpha) * restart
                    + F.lit(alpha) * F.coalesce("flow", F.lit(0.0))
                ).alias("r"),
            )
            .transform(lineage_cut)
        )
    return ranks.select("id", "r")


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from node 0 on symmetrized karate, 20
    iterations, α=0.85 — oracle is the same 20 iterations unrolled as
    chained SQL CTEs (exactly SQL-expressible because the iteration
    count is fixed; rounded 6 dp for cross-engine accumulation
    order)."""
    sym = symmetrize(karate_edges(spark))
    return personalized_pagerank(spark, sym, PPR_SOURCE).select(
        "id", F.round("r", 6).alias("ppr")
    )


def _oracle_personalized_pagerank() -> str:
    a = PPR_ALPHA
    restart = f"(CASE WHEN v.id = {PPR_SOURCE} THEN 1.0 ELSE 0.0 END)"
    # AS MATERIALIZED: without it DuckDB inlines the whole 20-level CTE
    # chain into one nested tree and spends ~45 s planning it; with it
    # each iteration is one tiny hash join (measured: <1 s total)
    parts = [
        f"e AS MATERIALIZED (SELECT src, dst, weight FROM ({_KARATE_SQL}))",
        "sym AS MATERIALIZED (SELECT src, dst, weight FROM e"
        " UNION ALL SELECT dst, src, weight FROM e WHERE src <> dst)",
        "v AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym)",
        "deg AS MATERIALIZED (SELECT src AS id, SUM(weight) AS wout FROM sym GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT v.id, {restart} AS r FROM v)",
    ]
    for k in range(1, PPR_ITERS + 1):
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT v.id,"
            f" (1.0 - {a!r}) * {restart} + {a!r} * COALESCE(f.flow, 0.0) AS r"
            f" FROM v LEFT JOIN ("
            f"SELECT sym.dst AS id, SUM(p.r * sym.weight / deg.wout) AS flow"
            f" FROM r{k-1} p JOIN sym ON sym.src = p.id JOIN deg ON deg.id = p.id"
            f" GROUP BY sym.dst) f ON v.id = f.id)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT id, ROUND(r, 6) AS ppr FROM r{PPR_ITERS}"
    )


# ---------------------------------------------------------------------------
# text-log source
# ---------------------------------------------------------------------------


def q_read_text_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-log source round trip: format events as log lines,
    land them through the text sink, re-parse with regexp_extract (the
    classic 'ingest a service log' path), aggregate. The oracle
    recomputes from the structured source, so format→parse must be
    lossless for the extracted fields (integers and enum strings only;
    float repr is deliberately NOT round-tripped through text). At
    100 TB: text files split by newline; the regex projection is a
    shuffle-free map feeding an ordinary aggregate."""
    e = load(spark, sf_dir, "events")
    lines = e.select(
        F.concat_ws(
            " ",
            F.col("ts_us").cast("string"),
            F.lit("INFO"),
            F.concat(F.lit("user="), F.col("user_id")),
            F.concat(F.lit("type="), F.col("event_type")),
            F.concat(F.lit("event="), F.col("event_id")),
        ).alias("value")
    )
    out = _roundtrip_dir(sf_dir, "textlog")
    lines.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    parsed = back.select(
        F.regexp_extract("value", r"^(\d+) ", 1).cast("long").alias("ts_us"),
        F.regexp_extract("value", r"user=(\d+)", 1).cast("long").alias("user_id"),
        F.regexp_extract("value", r"type=(\w+)", 1).alias("event_type"),
        F.regexp_extract("value", r"event=(\d+)", 1).cast("long").alias("event_id"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("event_id").alias("max_event_id"),
    )


ORACLE_READ_TEXT_LOG = """
SELECT event_type,
       COUNT(*)                 AS n_events,
       COUNT(DISTINCT user_id)  AS n_users,
       MIN(CAST(epoch_us(ts) AS BIGINT)) AS first_ts_us,
       MAX(event_id)            AS max_event_id
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# event analytics: funnel, cohort retention, SCD2 intervals
# ---------------------------------------------------------------------------

#: microseconds per week (cohort bucketing is pure integer arithmetic
#: on epoch-micros — timezone-independent, identical in both engines)
WEEK_US = 7 * 24 * 3_600_000_000


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    converts at a stage only with an event strictly after their entry
    to the previous stage. Three chained (filter → join on user →
    min-aggregate) stages — each stage's event filter prunes the
    stream *before* its shuffle, and every shuffle key is user_id, so
    a 100 TB event log reduces to per-user scalars immediately; no
    sorting, no per-user event collection."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("view_us"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("click_us"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("purchase_us"))
    )
    nv = v.agg(F.count("*").alias("n_viewers"))
    nc = c.agg(F.count("*").alias("n_clickers"))
    np_ = p.agg(F.count("*").alias("n_purchasers"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_viewers",
            "n_clickers",
            "n_purchasers",
            F.round(F.col("n_clickers").cast("double") / F.col("n_viewers"), 6).alias(
                "click_rate"
            ),
            F.round(
                F.col("n_purchasers").cast("double") / F.col("n_clickers"), 6
            ).alias("purchase_rate"),
        )
    )


ORACLE_FUNNEL = """
WITH v AS (
  SELECT user_id, MIN(CAST(epoch_us(ts) AS BIGINT)) AS view_us
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(CAST(epoch_us(e.ts) AS BIGINT)) AS click_us
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND CAST(epoch_us(e.ts) AS BIGINT) > v.view_us
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND CAST(epoch_us(e.ts) AS BIGINT) > c.click_us
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_viewers,
       (SELECT COUNT(*) FROM c) AS n_clickers,
       (SELECT COUNT(*) FROM p) AS n_purchasers,
       ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
             / (SELECT COUNT(*) FROM v), 6) AS click_rate,
       ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM c), 6) AS purchase_rate
"""


def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active week
    (epoch-aligned), counted per (cohort_week, week_offset). Shape:
    distinct (user, week) → per-user min → join back → count-distinct
    aggregate — all shuffles keyed on user_id or the tiny
    (cohort, offset) pair; the distinct pass collapses the event log to
    at most |users|·|weeks| rows before anything else."""
    e = load(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.expr(f"ts_us div {WEEK_US}").alias("week")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


ORACLE_RETENTION_COHORT = f"""
WITH uw AS (
  SELECT DISTINCT user_id, CAST(epoch_us(ts) AS BIGINT) // {WEEK_US} AS week
  FROM events
),
first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT cohort_week, week - cohort_week AS week_offset,
       COUNT(DISTINCT uw.user_id) AS n_users
FROM uw JOIN first ON uw.user_id = first.user_id
GROUP BY cohort_week, week_offset
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: compress each user's
    event-type stream into validity intervals — keep only rows where
    the state *changes* (lag), then close each interval with the next
    change's timestamp (lead); the current state stays open
    (valid_to_us NULL). Ordering is (ts_us, event_id) — a total order
    (the harness ships micro-precision timestamps, so ts_us is
    tie-free up to event_id), so both window passes are deterministic.
    One shuffle on user_id serves both window functions (same
    partitioning)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        e.select("user_id", "event_type", "ts_us", "event_id")
        .withColumn("prev_state", F.lag("event_type").over(w))
        .filter(F.col("prev_state").isNull() | (F.col("prev_state") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
    )


ORACLE_SCD2_INTERVALS = """
WITH o AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM events
),
ch AS (
  SELECT * FROM o WHERE prev_state IS NULL OR prev_state <> event_type
)
SELECT user_id, event_type AS state, us AS valid_from_us,
       LEAD(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
FROM ch
"""


DAY_US = 86_400_000_000


def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window activity features: per (user, active day), the
    event count and exact-decimal value sum over that user's trailing
    7 days — the RANGE-frame window shape (frame bounded by the DAY
    VALUE, not by row offsets, so gaps in activity shrink the window)
    that powers rate limits and recency features in training-data
    pipelines.

    100 TB shape: the pre-aggregate collapses events to one row per
    (user, day) map-side before the single user-partitioned window
    sort; the window state is ≤7 rows per user at a time. Users are
    independent — perfectly parallel."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    daily = (
        e.withColumn("day", (F.col("ts_us") / F.lit(DAY_US)).cast("long"))
        .groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_day"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("v_day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        F.sum("n_day").over(w).alias("n_7d"),
        F.round(F.sum("v_day").over(w), 2).cast("double").alias("value_7d"),
    )


ORACLE_ROLLING_7D = f"""
WITH daily AS (
  SELECT user_id,
         CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day,
         COUNT(*) AS n_day,
         SUM(CAST(value AS DECIMAL(12,2))) AS v_day
  FROM events GROUP BY 1, 2
)
SELECT user_id, day,
       CAST(SUM(n_day) OVER w AS BIGINT) AS n_7d,
       CAST(ROUND(SUM(v_day) OVER w, 2) AS DOUBLE) AS value_7d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's event value — the correct
    mean for irregularly sampled series (a value 'holds' until the next
    observation, so each sample is weighted by its holding duration).
    TWA = Σ value·Δt / Σ Δt over consecutive-event gaps; users with one
    event have no gaps and are excluded (SQL and Spark agree by
    construction: the lead() is NULL).

    100 TB shape: one user-partitioned window for lead(), then a
    map-side-combined aggregate — two shuffles on the same key (AQE
    reuses the partitioning). The numerator Σ value·Δt is summed in
    exact DECIMAL (value is 2-dp, Δt integer micros — same hash-
    stability convention as q_tpch_q1) and divided once in double."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = e.select(
        "user_id",
        "value",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)") * F.col("dt_us"))
            .cast("double")
            / F.sum("dt_us"),
            6,
        ).alias("twa_value"),
    )


ORACLE_TIME_WEIGHTED_AVG = """
WITH gaps AS (
  SELECT user_id, value,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id)
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2)) * dt_us) AS DOUBLE)
             / SUM(dt_us), 6) AS twa_value
FROM gaps WHERE dt_us IS NOT NULL
GROUP BY user_id
"""


def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the textbook case where the
    naive plan (COUNT(DISTINCT) over an expanding window, or a
    collect_set accumulator) holds O(users) state per row and dies at
    scale. Distributed-safe identity: a user enters the cumulative
    count on exactly one day (their first), so first-seen day per user
    (one map-side-combined min aggregate) → new users per day → one
    running sum over the tiny day domain. Two shuffles total, state
    O(days)."""
    e = load(spark, sf_dir, "events")
    first = (
        e.select("user_id", (F.col("ts_us") / F.lit(DAY_US)).cast("long").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))
    )
    daily = first.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


ORACLE_RUNNING_DISTINCT = f"""
WITH fs AS (
  SELECT user_id, MIN(CAST(epoch_us(ts) // {DAY_US} AS BIGINT)) AS day
  FROM events GROUP BY user_id
),
d AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM d
"""


#: interval span opened by each event for the sweep-line demo (15 min)
SESSION_SPAN_US = 900_000_000


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: each event opens a 15-minute
    interval; how many overlap at the worst moment? The naive plan is
    an O(n²) self-range-join; the sweep-line identity turns it into ±1
    deltas and running sums. A single per-type running sum would put
    EVERY delta of a type in one sorted partition (event_type is
    low-cardinality, so that partition is data-proportional — the r6
    window-bound audit's one offender in this file); the sweep is
    therefore day-chunked: the running sum partitions on (type, day)
    — bounded by one day's events per type — and per-day prefixes are
    stitched with a carry-in window over the per-(type, day) AGGREGATE
    table, whose group size is the day domain, never data. Identity:
    global running sum at a row = carry-in (Σ of previous days' totals)
    + within-day running sum, because (day, t, d, event_id) ordering
    equals the global (t, d, event_id) ordering (day is monotone in t).
    Delta order is pinned (time, then closes before opens, then
    event_id) so both engines walk the identical sequence;
    end-exclusive interval semantics."""
    e = load(spark, sf_dir, "events")
    opens = e.select(
        "event_type",
        F.col("ts_us").alias("t"),
        F.lit(1).alias("d"),
        "event_id",
    )
    closes = e.select(
        "event_type",
        (F.col("ts_us") + F.lit(SESSION_SPAN_US)).alias("t"),
        F.lit(-1).alias("d"),
        "event_id",
    )
    deltas = opens.unionByName(closes).withColumn(
        "day", (F.col("t") / F.lit(DAY_US)).cast("long")
    )
    w_day = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per_day = (
        deltas.withColumn("run_in_day", F.sum("d").over(w_day))
        .groupBy("event_type", "day")
        .agg(
            F.max("run_in_day").alias("day_max"),
            F.sum("d").alias("day_total"),
            F.count("*").alias("n_deltas"),
        )
    )
    # carry-in prefix over the per-day aggregate: group size = days per
    # type (bounded by the calendar), never event rows
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = per_day.withColumn(
        "carry", F.coalesce(F.sum("day_total").over(w_carry), F.lit(0).cast("long"))
    )
    return carried.groupBy("event_type").agg(
        F.max(F.col("carry") + F.col("day_max")).alias("max_concurrent"),
        F.expr("sum(n_deltas) div 2").alias("n_events"),
    )


ORACLE_INTERVAL_OVERLAP = f"""
WITH deltas AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t, 1 AS d, event_id
  FROM events
  UNION ALL
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) + {SESSION_SPAN_US}, -1, event_id
  FROM events
),
run AS (
  SELECT event_type,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS concurrent
  FROM deltas
)
SELECT event_type,
       CAST(MAX(concurrent) AS BIGINT) AS max_concurrent,
       COUNT(*) // 2                   AS n_events
FROM run GROUP BY event_type
"""


def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-streak detection per user (the gaps-and-islands
    pattern): collapse events to distinct active days, then
    consecutive days share ``day − row_number()`` — one keyed window
    turns streak detection into a plain groupBy, no self-join over the
    calendar. Output: per user the streak count, the longest streak,
    and when it started (argmax with a pinned earliest-start
    tiebreak). State is O(active days per user)."""
    e = load(spark, sf_dir, "events")
    days = (
        e.select("user_id", (F.col("ts_us") / F.lit(DAY_US)).cast("long").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = (
        days.withColumn("island", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("len_days"), F.min("day").alias("start_day"))
    )
    key = F.col("len_days") * 1_000_000 - F.col("start_day")
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len_days").alias("max_streak_days"),
        F.max_by("start_day", key).alias("max_streak_start_day"),
    )


ORACLE_GAPS_ISLANDS = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day
  FROM events
),
islands AS (
  SELECT user_id,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island,
         day
  FROM days
),
agg AS (
  SELECT user_id, island, COUNT(*) AS len_days, MIN(day) AS start_day
  FROM islands GROUP BY user_id, island
)
SELECT user_id, COUNT(*) AS n_streaks,
       MAX(len_days) AS max_streak_days,
       arg_max(start_day, len_days * 1000000 - start_day)
         AS max_streak_start_day
FROM agg GROUP BY user_id
"""


#: MAD outlier gate: |v − median| > MAD_K · 1.4826 · MAD
MAD_K = 3.0


def q_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counting per event type via the median absolute
    deviation — the heavy-tail-safe alternative to q_zscore_outlier's
    mean/stddev gate (one extreme value corrupts a z-score's own
    baseline; it cannot move a median). Two grouped exact medians
    (values, then absolute deviations), each on the group-aware
    bracketing-order-statistic kernel (r7: the builtin grouped
    `percentile` buffered each event type's whole slice — a fifth of
    the fact table — in one aggregation task), broadcast back over
    the scan."""
    from .kernels import chunked_group_quantiles

    e = load(spark, sf_dir, "events")
    med = chunked_group_quantiles(e, ["event_type"], "value", [(0.5, "med")])
    dev = (
        e.join(F.broadcast(med), "event_type")
        .select("event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev"))
        # consumed by the MAD aggregate AND the final gate — checkpoint
        # so the events scan runs twice total (median pass + this),
        # not three times (the cluster analogue is persist(DISK_ONLY))
        .transform(lineage_cut)
    )
    mad = chunked_group_quantiles(dev, ["event_type"], "adev", [(0.5, "mad")])
    gate = F.col("adev") > F.lit(MAD_K * 1.4826) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(gate.cast("long")).alias("n_outliers"),
            F.count("*").alias("n_rows"),
        )
    )


ORACLE_MAD_OUTLIER = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       ROUND(MAX(d.med), 6) AS med,
       ROUND(MAX(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.adev > {MAD_K * 1.4826} * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       COUNT(*) AS n_rows
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


# ---------------------------------------------------------------------------
# round-5 second batch (SURVEY §2.19): sequence / seasonality / encoding /
# market-basket analytics
# ---------------------------------------------------------------------------

#: hour in microseconds (seasonal bucketing)
HOUR_US = 3_600_000_000
#: smoothing pseudo-count for target encoding (larger → shrink to global mean)
ENCODE_M = 100.0
#: minimum pair support (fraction of baskets) for frequent-pair mining
PAIR_MIN_SUPPORT = 0.01


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: one keyed ``lead`` window (state O(1) per user stream,
    orderable within each user partition at any scale) emits
    (from_type → to_type) bigrams; one map-side-combined aggregate
    counts them, and row-normalization is a window over the already
    |types|²-sized count table — so the event scan and its window run
    exactly ONCE (a totals-join formulation would recompute the lead
    subtree per branch; the plan guard pins the single scan). The
    classic clickstream / session-model building block — no self-join
    over the event table, no driver state. Ties in event time break
    on event_id so the sequence (and thus the matrix) is
    deterministic."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = (
        e.select("user_id", "event_id", "ts_us", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    trans = (
        seq.groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("n_trans"))
    )
    wt = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_trans",
        F.round(F.col("n_trans") / F.sum("n_trans").over(wt), 6).alias("p"),
    )


ORACLE_MARKOV_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, COUNT(*) AS n_trans
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_trans,
       ROUND(n_trans / SUM(n_trans) OVER (PARTITION BY from_type), 6) AS p
FROM trans
"""


def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) baseline + residual anomaly count per
    event type — the degenerate-but-distributed core of STL-style
    seasonal decomposition: the baseline is a (type, hour) mean/stddev
    from ONE exact map-side-combined aggregate (2-dp values summed in
    DECIMAL so the stats are bit-stable), broadcast back over the scan
    for the residual gate |v − μ| > 2σ. Two passes over events, zero
    windows, zero shuffles beyond the 24×|types| stats rollup."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        ((F.col("ts_us") / F.lit(HOUR_US)).cast("long") % 24).alias("hod"),
        "value",
    )
    dec = F.col("value").cast("decimal(12,2)")
    stats = base.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.greatest(
        F.col("ss").cast("double") / F.col("n") - mean * mean, F.lit(0.0)
    )
    enriched = stats.select(
        "event_type", "hod", "n", mean.alias("mean"), F.sqrt(var).alias("std")
    )
    gate = F.abs(F.col("value") - F.col("mean")) > 2.0 * F.col("std")
    return (
        base.join(F.broadcast(enriched), ["event_type", "hod"])
        .groupBy("event_type", "hod")
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("mean"), 6).alias("mean"),
            F.round(F.max("std"), 6).alias("std"),
            F.sum(gate.cast("long")).alias("n_anom"),
        )
    )


ORACLE_SEASONAL_BASELINE = f"""
WITH base AS (
  SELECT event_type,
         CAST(epoch_us(ts) // {HOUR_US} AS BIGINT) % 24 AS hod,
         value
  FROM events
),
stats AS (
  SELECT event_type, hod, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(12,2))) AS s,
         SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS ss
  FROM base GROUP BY event_type, hod
),
enriched AS (
  SELECT event_type, hod, n,
         CAST(s AS DOUBLE) / n AS mean,
         SQRT(GREATEST(CAST(ss AS DOUBLE) / n
                       - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                       0.0)) AS std
  FROM stats
)
SELECT b.event_type, b.hod, MAX(e.n) AS n,
       ROUND(MAX(e.mean), 6) AS mean,
       ROUND(MAX(e.std), 6) AS std,
       CAST(SUM(CASE WHEN ABS(b.value - e.mean) > 2.0 * e.std
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
FROM base b JOIN enriched e USING (event_type, hod)
GROUP BY b.event_type, b.hod
"""


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical — the
    leakage-light ML feature-engineering staple: encoded(k) =
    (Σ_k y + M·ȳ)/(n_k + M) shrinks rare categories toward the global
    mean (M = 100 pseudo-observations). One exact DECIMAL
    aggregate per category plus one global scalar broadcast via a
    1-row crossJoin — nothing about this changes at 100 TB; the
    category table is the only shuffle and it is tiny."""
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    per_key = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum(dec).alias("s")
    ).transform(lineage_cut)
    # the global mean rolls up from the (tiny, checkpointed) per-key
    # state — DECIMAL addition is associative, so this equals a direct
    # scan without paying for one
    glob = per_key.agg(
        F.sum("s").alias("gs"), F.sum("n").alias("gn")
    )
    gmean = F.col("gs").cast("double") / F.col("gn")
    raw = F.col("s").cast("double") / F.col("n")
    enc = (F.col("s").cast("double") + F.lit(ENCODE_M) * gmean) / (
        F.col("n") + F.lit(ENCODE_M)
    )
    return per_key.crossJoin(F.broadcast(glob)).select(
        "o_orderpriority",
        "n",
        F.round(raw, 6).alias("raw_mean"),
        F.round(enc, 6).alias("encoded"),
    )


ORACLE_TARGET_ENCODE = f"""
WITH per_key AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
  FROM orders GROUP BY o_orderpriority
),
corpus AS (
  SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS gs, COUNT(*) AS gn
  FROM orders
)
SELECT o_orderpriority, n,
       ROUND(CAST(s AS DOUBLE) / n, 6) AS raw_mean,
       ROUND((CAST(s AS DOUBLE) + {ENCODE_M} * (CAST(gs AS DOUBLE) / gn))
             / (n + {ENCODE_M}), 6) AS encoded
FROM per_key CROSS JOIN corpus
"""


def q_freq_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pair mining (A-priori level 2, Agrawal–Srikant 1994)
    over order baskets at brand granularity: collapse line items to
    DISTINCT (order, brand) first — the step that bounds the pair
    self-join by basket size, not line-item count — then join the
    basket table to itself on the order key with an ordered-pair
    predicate and keep pairs above 1% basket support.
    The brand dimension rides in on a broadcast join; the only big
    shuffle is the basket self-join, co-partitioned on the order key
    (both sides hash the same key, one exchange each)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    ob = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select("l_orderkey", "p_brand")
    # ONE shuffle on the basket key collapses each order to its sorted
    # distinct brand set; in-basket pair enumeration is then a pure
    # JVM array expression (a distinct + self-join formulation would
    # shuffle the basket table twice more)
    baskets = (
        ob.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
        # both consumers (pair counts + basket total) read this once;
        # without the checkpoint Spark re-runs the scan+shuffle per
        # branch (no exchange reuse across the scalar crossJoin)
        .transform(lineage_cut)
    )
    combos = F.expr(
        "flatten(transform(brands, (x, i) ->"
        " transform(slice(brands, i + 2, size(brands)),"
        "  y -> struct(x AS brand_a, y AS brand_b))))"
    )
    pairs = (
        baskets.select(F.explode(combos).alias("p"))
        .groupBy("p.brand_a", "p.brand_b")
        .agg(F.count("*").alias("n_both"))
    )
    n_orders = baskets.agg(F.count("*").alias("n_orders"))
    return (
        pairs.crossJoin(F.broadcast(n_orders))
        .withColumn("support", F.round(F.col("n_both") / F.col("n_orders"), 6))
        .filter(F.col("n_both") >= F.lit(PAIR_MIN_SUPPORT) * F.col("n_orders"))
        .select("brand_a", "brand_b", "n_both", "support")
    )


ORACLE_FREQ_PAIRS = f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
pairs AS (
  SELECT x.p_brand AS brand_a, y.p_brand AS brand_b, COUNT(*) AS n_both
  FROM ob x JOIN ob y
    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
  GROUP BY x.p_brand, y.p_brand
),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob)
SELECT brand_a, brand_b, n_both,
       ROUND(n_both / CAST(n_orders AS DOUBLE), 6) AS support
FROM pairs CROSS JOIN tot
WHERE n_both >= {PAIR_MIN_SUPPORT} * n_orders
"""


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: yesterday's materialized
    aggregate state plus today's increment must equal the full
    recompute — the pattern that keeps a 100 TB rollup fresh by
    processing only the new partition. Here the events table is split
    into a 'base' batch and an 'increment' batch (even/odd event_id,
    simulating two ingest days); each side aggregates independently
    (map-side combinable, DECIMAL-exact so merging is associative),
    then ONE full-outer join on the group key combines states —
    counts add, sums add, maxima take greatest. The oracle recomputes
    from scratch; value-equality IS the maintenance-correctness
    proof. At scale the base state is a stored table and only the
    increment scans new data."""
    e = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(12,2)")

    def state(df):
        return df.groupBy(
            "event_type", (F.col("ts_us") / F.lit(DAY_US)).cast("long").alias("day")
        ).agg(
            F.count("*").alias("n"),
            F.sum(dec).alias("s"),
            F.max("value").alias("mx"),
        )

    base = state(e.filter(F.col("event_id") % 2 == 0))
    inc = state(e.filter(F.col("event_id") % 2 == 1))
    b, i = base.alias("b"), inc.alias("i")
    merged = b.join(
        i,
        (F.col("b.event_type") == F.col("i.event_type"))
        & (F.col("b.day") == F.col("i.day")),
        "full_outer",
    ).select(
        F.coalesce("b.event_type", "i.event_type").alias("event_type"),
        F.coalesce("b.day", "i.day").alias("day"),
        (
            F.coalesce("b.n", F.lit(0)) + F.coalesce("i.n", F.lit(0))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("b.s"), F.lit(0).cast("decimal(12,2)"))
            + F.coalesce(F.col("i.s"), F.lit(0).cast("decimal(12,2)"))
        )
        .cast("double")
        .alias("total_value"),
        F.greatest(
            F.coalesce("b.mx", F.lit(float("-inf"))),
            F.coalesce("i.mx", F.lit(float("-inf"))),
        ).alias("max_value"),
    )
    return merged


ORACLE_INCREMENTAL_AGG = f"""
SELECT event_type,
       CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply with delete tombstones — the third
    leg of the upsert family (q_merge_upsert = merge, q_latest_per_key
    = dedup): an ordered op log per key collapses to final table
    state in ONE ``max_by`` aggregate (no window, no sort — the
    argmax shape this repo pins for latest-per-key at scale), then
    tombstoned keys drop. The op column derives deterministically
    from the fixture (every 10th event is a delete); ordering ties
    break on event_id so replay is exact. At 100 TB this is the
    standard lakehouse CDC-compaction plan: one shuffle on the key."""
    e = load(spark, sf_dir, "events")
    log = e.select(
        "user_id",
        "ts_us",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_id") % 10 == 9, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    last = log.groupBy("user_id").agg(
        F.count("*").alias("n_ops"),
        F.max_by(
            F.struct("op", "event_type", "value"),
            F.struct("ts_us", "event_id"),
        ).alias("f"),
    )
    return (
        last.filter(F.col("f.op") != "D")
        .select(
            "user_id",
            "n_ops",
            F.col("f.event_type").alias("last_event_type"),
            F.col("f.value").alias("last_value"),
        )
    )


ORACLE_CDC_APPLY = """
WITH log AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
         CASE WHEN event_id % 10 = 9 THEN 'D' ELSE 'U' END AS op
  FROM events
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_ops
  FROM log
)
SELECT user_id, n_ops, event_type AS last_event_type, value AS last_value
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectation suite (Schelter et al.
    2018): uniqueness, referential integrity, value range, domain
    membership, and completeness — evaluated as ONE pass over orders
    (every row-level predicate folds into a single map-side-combined
    aggregate) plus one broadcast anti-join count for the foreign key.
    Emits one row per constraint with the observed metric and a pass
    flag — the gate a 100 TB ingest runs before publishing a
    partition; nothing here scales worse than the scan itself.

    Kernel split out as expectations_frame so crafted-violation inputs
    are testable: the fixture passes every gate at all scales (r16
    vacuity audit — the violations column is all-zero), so the
    violation branch is pinned by
    tests/test_analytics.py::test_expectations_violation_branch."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return expectations_frame(o, c)


def expectations_frame(o: DataFrame, c: DataFrame) -> DataFrame:
    """The q_expectations suite over caller-supplied orders/customer
    frames (same five constraints, same output schema)."""
    stats = o.agg(
        F.count("*").alias("n"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum((F.col("o_totalprice") < 0).cast("long")).alias("n_neg_price"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("n_bad_status"),
        F.sum(F.col("o_orderdate").isNull().cast("long")).alias("n_null_date"),
    )
    orphans = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))),
        "o_custkey",
        "left_anti",
    ).agg(F.count("*").alias("n_orphans"))
    row = stats.crossJoin(F.broadcast(orphans))
    checks = F.array(
        F.struct(
            F.lit("orderkey_unique").alias("constraint"),
            (F.col("n") - F.col("n_keys")).alias("violations"),
        ),
        F.struct(
            F.lit("custkey_references_customer").alias("constraint"),
            F.col("n_orphans").alias("violations"),
        ),
        F.struct(
            F.lit("totalprice_non_negative").alias("constraint"),
            F.col("n_neg_price").alias("violations"),
        ),
        F.struct(
            F.lit("orderstatus_in_domain").alias("constraint"),
            F.col("n_bad_status").alias("violations"),
        ),
        F.struct(
            F.lit("orderdate_complete").alias("constraint"),
            F.col("n_null_date").alias("violations"),
        ),
    )
    return row.select(F.col("n").alias("n_rows"), F.inline(checks)).select(
        "constraint",
        "n_rows",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


ORACLE_EXPECTATIONS = """
WITH stats AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT o_orderkey) AS n_keys,
         CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_neg_price,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_date
  FROM orders
),
orphans AS (
  SELECT COUNT(*) AS n_orphans FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
),
j AS (SELECT * FROM stats CROSS JOIN orphans)
SELECT 'orderkey_unique' AS "constraint", n AS n_rows,
       n - n_keys AS violations, n - n_keys = 0 AS passed FROM j
UNION ALL
SELECT 'custkey_references_customer', n, n_orphans, n_orphans = 0 FROM j
UNION ALL
SELECT 'totalprice_non_negative', n, n_neg_price, n_neg_price = 0 FROM j
UNION ALL
SELECT 'orderstatus_in_domain', n, n_bad_status, n_bad_status = 0 FROM j
UNION ALL
SELECT 'orderdate_complete', n, n_null_date, n_null_date = 0 FROM j
"""


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the optimizer-statistics / data-catalog shape):
    per column, row count, null count, distinct count, min/max (native
    order, rendered as text), and mean rendered length — all from ONE
    aggregate over events, unpivoted to a row per column with
    ``inline``. The multi-countDistinct expands the scan k ways
    map-side (Spark's Expand), still a single shuffle; swap
    ``approx_count_distinct`` in at extreme scale for the same plan
    minus the expand.

    Kernel split out as profile_frame: the fixture has no NULLs in
    the profiled columns (r16 vacuity audit — n_nulls is all-zero at
    every scale), so the null-counting branch is pinned on crafted
    input by tests/test_analytics.py::test_profile_null_branch."""
    e = load(spark, sf_dir, "events")
    return profile_frame(e)


def profile_frame(e: DataFrame) -> DataFrame:
    """q_profile_columns' one-pass profiler over a caller-supplied
    events frame (same three profiled columns, same output schema)."""
    agg = e.agg(
        F.count("*").alias("n"),
        F.sum(F.col("event_type").isNull().cast("long")).alias("et_nulls"),
        F.countDistinct("event_type").alias("et_distinct"),
        F.min("event_type").alias("et_min"),
        F.max("event_type").alias("et_max"),
        F.avg(F.length("event_type")).alias("et_len"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("uid_nulls"),
        F.countDistinct("user_id").alias("uid_distinct"),
        F.min("user_id").alias("uid_min"),
        F.max("user_id").alias("uid_max"),
        F.avg(F.length(F.col("user_id").cast("string"))).alias("uid_len"),
        F.sum(F.col("props").isNull().cast("long")).alias("p_nulls"),
        F.countDistinct("props").alias("p_distinct"),
        F.min("props").alias("p_min"),
        F.max("props").alias("p_max"),
        F.avg(F.length("props")).alias("p_len"),
    )
    cols = F.array(
        F.struct(
            F.lit("event_type").alias("column"),
            F.col("et_nulls").alias("n_nulls"),
            F.col("et_distinct").alias("n_distinct"),
            F.col("et_min").cast("string").alias("min_repr"),
            F.col("et_max").cast("string").alias("max_repr"),
            F.round("et_len", 6).alias("avg_len"),
        ),
        F.struct(
            F.lit("user_id").alias("column"),
            F.col("uid_nulls").alias("n_nulls"),
            F.col("uid_distinct").alias("n_distinct"),
            F.col("uid_min").cast("string").alias("min_repr"),
            F.col("uid_max").cast("string").alias("max_repr"),
            F.round("uid_len", 6).alias("avg_len"),
        ),
        F.struct(
            F.lit("props").alias("column"),
            F.col("p_nulls").alias("n_nulls"),
            F.col("p_distinct").alias("n_distinct"),
            F.col("p_min").cast("string").alias("min_repr"),
            F.col("p_max").cast("string").alias("max_repr"),
            F.round("p_len", 6).alias("avg_len"),
        ),
    )
    return agg.select(F.col("n").alias("n_rows"), F.inline(cols)).select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr", "avg_len"
    )


ORACLE_PROFILE_COLUMNS = """
WITH a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS et_nulls,
         COUNT(DISTINCT event_type) AS et_distinct,
         MIN(event_type) AS et_min, MAX(event_type) AS et_max,
         AVG(LENGTH(event_type)) AS et_len,
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS uid_nulls,
         COUNT(DISTINCT user_id) AS uid_distinct,
         MIN(user_id) AS uid_min, MAX(user_id) AS uid_max,
         AVG(LENGTH(CAST(user_id AS VARCHAR))) AS uid_len,
         CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
         COUNT(DISTINCT props) AS p_distinct,
         MIN(props) AS p_min, MAX(props) AS p_max,
         AVG(LENGTH(props)) AS p_len
  FROM events
)
SELECT 'event_type' AS "column", n AS n_rows, et_nulls AS n_nulls,
       et_distinct AS n_distinct, CAST(et_min AS VARCHAR) AS min_repr,
       CAST(et_max AS VARCHAR) AS max_repr, ROUND(et_len, 6) AS avg_len
FROM a
UNION ALL
SELECT 'user_id', n, uid_nulls, uid_distinct,
       CAST(uid_min AS VARCHAR), CAST(uid_max AS VARCHAR), ROUND(uid_len, 6)
FROM a
UNION ALL
SELECT 'props', n, p_nulls, p_distinct,
       CAST(p_min AS VARCHAR), CAST(p_max AS VARCHAR), ROUND(p_len, 6)
FROM a
"""


def q_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the measurement that decides
    between a plain shuffle join, AQE skew splitting, and manual
    salting (q_salted_join) BEFORE burning a 100 TB shuffle: per
    candidate key, the per-key count distribution's size, max, top-key
    share, and max/median ratio. One groupBy per key column, then a
    count-table-sized exact-percentile rollup (the count table is
    |keys| rows, tiny next to the fact table)."""
    li = load(spark, sf_dir, "lineitem")
    # both candidate keys profile from ONE scan: explode each row into
    # (key-name, key-value) pairs, then a single (key, k) groupBy
    kv = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_suppkey").alias("key"),
                    F.col("l_suppkey").alias("k"),
                ),
                F.struct(
                    F.lit("l_partkey").alias("key"),
                    F.col("l_partkey").alias("k"),
                ),
            )
        ).alias("e")
    )
    counts = kv.groupBy("e.key", "e.k").agg(F.count("*").alias("cnt")).transform(lineage_cut)
    base = counts.groupBy("key").agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    # the p50/p99 of per-key counts run on the group-aware bracketing-
    # order-statistic kernel (r7): the count table is |keys| rows —
    # tiny next to the fact table but still data-proportional, so the
    # builtin grouped percentile's one-buffer-per-key-name plan is the
    # first thing to break when the key domain grows with the data
    from .kernels import chunked_group_quantiles

    pcts = chunked_group_quantiles(
        counts, ["key"], "cnt", [(0.5, "p50_raw"), (0.99, "p99_raw")]
    )
    return base.join(F.broadcast(pcts), "key").select(
        "key",
        "n_keys",
        "n_rows",
        "max_cnt",
        F.round(F.col("max_cnt") / F.col("n_rows"), 6).alias("top_share"),
        F.round("p50_raw", 6).alias("p50"),
        F.round("p99_raw", 6).alias("p99"),
        F.round(F.col("max_cnt") / F.col("p50_raw"), 6).alias("skew_ratio"),
    )


ORACLE_SKEW_STATS = """
WITH s AS (
  SELECT l_suppkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1
),
p AS (
  SELECT l_partkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1
)
SELECT 'l_suppkey' AS key, COUNT(*) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_cnt,
       ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_share,
       ROUND(quantile_cont(cnt, 0.5), 6) AS p50,
       ROUND(quantile_cont(cnt, 0.99), 6) AS p99,
       ROUND(MAX(cnt) / quantile_cont(cnt, 0.5), 6) AS skew_ratio
FROM s
UNION ALL
SELECT 'l_partkey', COUNT(*), CAST(SUM(cnt) AS BIGINT), MAX(cnt),
       ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6),
       ROUND(quantile_cont(cnt, 0.5), 6), ROUND(quantile_cont(cnt, 0.99), 6),
       ROUND(MAX(cnt) / quantile_cont(cnt, 0.5), 6)
FROM p
"""


#: attribution lookback window (7 days, micros)
ATTRIB_WINDOW_US = 7 * 86_400_000_000
#: event types that count as marketing touches
ATTRIB_TOUCHES = ("click", "view")


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — the marketing-analytics workhorse:
    every purchase is credited to the user's most recent prior touch
    (click/view) within a 7-day lookback, else 'organic'. ONE keyed
    window carries the latest touch forward as an ignore-nulls
    ``last`` over the mixed event stream (no self-join of purchases
    against touches — the naive range join explodes at scale; this is
    O(1) state per user stream), then a per-channel rollup reports
    attributed purchases, exact DECIMAL revenue, and mean
    touch-to-purchase delay. Ties in event time break on event_id."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin(*ATTRIB_TOUCHES),
            F.struct(
                F.col("ts_us").alias("t_ts"), F.col("event_type").alias("t_type")
            ),
        ),
        ignorenulls=True,
    ).over(w)
    pur = (
        e.select("user_id", "event_id", "ts_us", "event_type", "value")
        .withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
    )
    expired = F.col("touch").isNull() | (
        F.col("ts_us") - F.col("touch.t_ts") > ATTRIB_WINDOW_US
    )
    channel = F.when(expired, F.lit("organic")).otherwise(F.col("touch.t_type"))
    delay = F.when(~expired, F.col("ts_us") - F.col("touch.t_ts"))
    return (
        pur.select(
            channel.alias("channel"),
            F.col("value").cast("decimal(12,2)").alias("v"),
            delay.alias("delay_us"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("v").cast("double").alias("revenue"),
            F.round(
                F.sum("delay_us").cast("double") / F.count("delay_us") / 1e6, 6
            ).alias("avg_delay_sec"),
        )
    )


ORACLE_ATTRIBUTION = f"""
WITH o AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN struct_pack(t_ts := epoch_us(ts),
                                          t_type := event_type) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
),
pur AS (
  SELECT CASE WHEN touch IS NULL OR ts_us - touch.t_ts > {ATTRIB_WINDOW_US}
              THEN 'organic' ELSE touch.t_type END AS channel,
         CAST(value AS DECIMAL(12,2)) AS v,
         CASE WHEN touch IS NOT NULL
               AND ts_us - touch.t_ts <= {ATTRIB_WINDOW_US}
              THEN ts_us - touch.t_ts END AS delay_us
  FROM o WHERE event_type = 'purchase'
)
SELECT channel, COUNT(*) AS n_purchases,
       CAST(SUM(v) AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(delay_us) AS DOUBLE) / COUNT(delay_us) / 1e6, 6)
         AS avg_delay_sec
FROM pur GROUP BY channel
"""


#: A/B test arms (event types whose value distributions we compare)
AB_ARM_A = "purchase"
AB_ARM_B = "view"


def q_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic between two event-type arms —
    the experimentation-platform primitive: compare the value
    distributions of 'purchase' vs 'view' without assuming equal
    variances. ONE conditional-sum aggregate over the scan produces
    both arms' exact DECIMAL moments (count, sum, sum of squares);
    the t statistic and Welch-Satterthwaite degrees of freedom are
    scalar arithmetic on that single row. This is the one-pass shape
    an always-on experiment pipeline runs per metric per day at any
    scale."""
    e = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(12,2)")
    in_a = F.col("event_type") == AB_ARM_A
    in_b = F.col("event_type") == AB_ARM_B
    row = e.agg(
        F.sum(in_a.cast("long")).alias("na"),
        F.sum(F.when(in_a, dec)).alias("sa"),
        F.sum(F.when(in_a, dec * dec)).alias("qa"),
        F.sum(in_b.cast("long")).alias("nb"),
        F.sum(F.when(in_b, dec)).alias("sb"),
        F.sum(F.when(in_b, dec * dec)).alias("qb"),
    )
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    va = (F.col("qa").cast("double") - F.col("sa").cast("double") * ma) / (
        F.col("na") - 1
    )
    vb = (F.col("qb").cast("double") - F.col("sb").cast("double") * mb) / (
        F.col("nb") - 1
    )
    se2a = va / F.col("na")
    se2b = vb / F.col("nb")
    t = (ma - mb) / F.sqrt(se2a + se2b)
    df = (se2a + se2b) * (se2a + se2b) / (
        se2a * se2a / (F.col("na") - 1) + se2b * se2b / (F.col("nb") - 1)
    )
    return row.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"),
    )


ORACLE_AB_TTEST = f"""
WITH m AS (
  SELECT CAST(SUM(CASE WHEN event_type = '{AB_ARM_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS na,
         SUM(CASE WHEN event_type = '{AB_ARM_A}'
                  THEN CAST(value AS DECIMAL(12,2)) END) AS sa,
         SUM(CASE WHEN event_type = '{AB_ARM_A}'
                  THEN CAST(value AS DECIMAL(12,2))
                       * CAST(value AS DECIMAL(12,2)) END) AS qa,
         CAST(SUM(CASE WHEN event_type = '{AB_ARM_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS nb,
         SUM(CASE WHEN event_type = '{AB_ARM_B}'
                  THEN CAST(value AS DECIMAL(12,2)) END) AS sb,
         SUM(CASE WHEN event_type = '{AB_ARM_B}'
                  THEN CAST(value AS DECIMAL(12,2))
                       * CAST(value AS DECIMAL(12,2)) END) AS qb
  FROM events
),
d AS (
  SELECT na, nb,
         CAST(sa AS DOUBLE) / na AS ma,
         CAST(sb AS DOUBLE) / nb AS mb,
         (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) / na))
           / (na - 1) AS va,
         (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * (CAST(sb AS DOUBLE) / nb))
           / (nb - 1) AS vb
  FROM m
)
SELECT na AS n_a, nb AS n_b,
       ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
       ROUND((ma - mb) / SQRT(va / na + vb / nb), 6) AS t_stat,
       ROUND((va / na + vb / nb) * (va / na + vb / nb)
             / ((va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)), 6) AS welch_df
FROM d
"""


# ---------------------------------------------------------------------------
# Item-item collaborative filtering (SURVEY §2.27)
# ---------------------------------------------------------------------------

#: probe stride: parts with partkey ≡ 0 (mod 97) get recommendations —
#: a deterministic ~1% sample that scales the output, not the plan
CF_PROBE_MOD = 97
#: neighbors returned per probe item
CF_TOP_N = 3


def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar 2001 / Amazon 2003):
    top-N most-similar parts for a probe set, by cosine similarity
    over binary order-basket co-occurrence — cos(i,j) =
    |orders with both| / √(|orders with i|·|orders with j|).

    100 TB shape: the basket table is deduped ONCE (orderkey,partkey);
    the probe filter lands BEFORE the co-occurrence self-join, so the
    join is (tiny probe baskets) ⋈ (full baskets) hash-partitioned on
    orderkey — never basket², and TPC-H baskets are ≤7 items so even
    the unfiltered variant is bounded per order. Item counts attach
    broadcast (probe side) and by hash join (neighbor side). Counts
    stay BIGINT; cosine is one double expression ROUNDed before the
    deterministic (similarity, id) ranking.
    """
    basket = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .transform(lineage_cut)
    )
    item_n = basket.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count("*").alias("n_orders")
    )
    probe = basket.filter(F.col("l_partkey") % CF_PROBE_MOD == 0)
    pairs = (
        probe.alias("a")
        .join(basket.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("i"), F.col("b.l_partkey").alias("j")
        )
        .agg(F.count("*").alias("c_ij"))
    )
    scored = (
        pairs.join(
            F.broadcast(
                item_n.filter(F.col("item") % CF_PROBE_MOD == 0).select(
                    F.col("item").alias("i"), F.col("n_orders").alias("c_i")
                )
            ),
            "i",
        )
        .join(
            item_n.select(F.col("item").alias("j"), F.col("n_orders").alias("c_j")),
            "j",
        )
        .select(
            "i",
            "j",
            "c_ij",
            F.round(
                F.col("c_ij").cast("double")
                / F.sqrt(F.col("c_i").cast("double") * F.col("c_j").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    # group size = scored neighbors per probe item: bounded by the
    # probe item's co-occurrence degree (≤ orders containing i × ≤7
    # items/basket), never the catalog (r6 window-bound audit)
    w = Window.partitionBy("i").orderBy(F.desc("cosine"), F.asc("j"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CF_TOP_N)
        .select("i", "j", "c_ij", "cosine", "rn")
        .orderBy("i", "rn")
    )


ORACLE_ITEM_CF = f"""
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item_n AS (
  SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM basket GROUP BY 1
),
pairs AS (
  SELECT a.l_partkey AS i, b.l_partkey AS j, CAST(COUNT(*) AS BIGINT) AS c_ij
  FROM basket a JOIN basket b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey % {CF_PROBE_MOD} = 0 AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
scored AS (
  SELECT i, j, c_ij,
         ROUND(CAST(c_ij AS DOUBLE)
               / sqrt(CAST(ni.n_orders AS DOUBLE) * CAST(nj.n_orders AS DOUBLE)),
               6) AS cosine
  FROM pairs JOIN item_n ni ON pairs.i = ni.item
             JOIN item_n nj ON pairs.j = nj.item
)
SELECT i, j, c_ij, cosine, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY i ORDER BY cosine DESC, j) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= {CF_TOP_N}
ORDER BY i, rn
"""


def q_read_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source round trip on Spark 4's built-in XML data source
    (the spark-xml package folded into core): export events to
    row-tagged XML, read back with an EXPLICIT schema (no inference
    pass), aggregate; the oracle recomputes from parquet, so entity
    escaping and numeric round-trips must be lossless. At 100 TB:
    rowTag framing lets the reader split files at element boundaries
    across executors, and the explicit schema avoids the full
    inference scan — same contract as q_read_json/q_read_csv.
    """
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value", "ts_us"
    )
    out = _roundtrip_dir(sf_dir, "xml")
    e.write.format("xml").option("rootTag", "events").option(
        "rowTag", "event"
    ).mode("overwrite").save(out)
    back = spark.read.format("xml").option("rowTag", "event").schema(
        "event_id LONG, event_type STRING, user_id LONG, value DOUBLE, ts_us LONG"
    ).load(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_event_id"),
            F.max("ts_us").alias("max_ts_us"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )


ORACLE_READ_XML = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       MIN(event_id) AS min_event_id,
       MAX(CAST(epoch_us(ts) AS BIGINT)) AS max_ts_us,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "q_stats_agg": q_stats_agg,
    "q_filtered_agg": q_filtered_agg,
    "q_string_agg": q_string_agg,
    "q_rollup_time": q_rollup_time,
    "q_salted_join": q_salted_join,
    "q_read_json": q_read_json,
    "q_read_csv": q_read_csv,
    "q_union_by_name": q_union_by_name,
    "q_read_merge_schema": q_read_merge_schema,
    "q_null_semantics": q_null_semantics,
    "q_nested_prune": q_nested_prune,
    "q_bin_pack": q_bin_pack,
    "q_read_orc": q_read_orc,
    "q_clustering_coeff": q_clustering_coeff,
    "q_adamic_adar": q_adamic_adar,
    "q_degree_dist": q_degree_dist,
    "q_assortativity": q_assortativity,
    "q_bm25": q_bm25,
    "q_unigram_surprise": q_unigram_surprise,
    "q_zscore_outlier": q_zscore_outlier,
    "q_sssp_weighted": q_sssp_weighted,
    "q_personalized_pagerank": q_personalized_pagerank,
    "q_read_text_log": q_read_text_log,
    "q_funnel": q_funnel,
    "q_retention_cohort": q_retention_cohort,
    "q_scd2_intervals": q_scd2_intervals,
    "q_rolling_7d": q_rolling_7d,
    "q_time_weighted_avg": q_time_weighted_avg,
    "q_running_distinct": q_running_distinct,
    "q_interval_overlap": q_interval_overlap,
    "q_gaps_islands": q_gaps_islands,
    "q_mad_outlier": q_mad_outlier,
    "q_markov_transitions": q_markov_transitions,
    "q_seasonal_baseline": q_seasonal_baseline,
    "q_target_encode": q_target_encode,
    "q_freq_pairs": q_freq_pairs,
    "q_incremental_agg": q_incremental_agg,
    "q_cdc_apply": q_cdc_apply,
    "q_expectations": q_expectations,
    "q_profile_columns": q_profile_columns,
    "q_skew_stats": q_skew_stats,
    "q_attribution": q_attribution,
    "q_ab_ttest": q_ab_ttest,
    "q_item_cf": q_item_cf,
    "q_read_xml": q_read_xml,
}

ORACLES = {
    "q_stats_agg": ORACLE_STATS_AGG,
    "q_filtered_agg": ORACLE_FILTERED_AGG,
    "q_string_agg": ORACLE_STRING_AGG,
    "q_rollup_time": ORACLE_ROLLUP_TIME,
    "q_salted_join": ORACLE_SALTED_JOIN,
    "q_read_json": ORACLE_READ_JSON,
    "q_read_csv": ORACLE_READ_CSV,
    "q_union_by_name": ORACLE_UNION_BY_NAME,
    "q_read_merge_schema": ORACLE_READ_MERGE_SCHEMA,
    "q_null_semantics": ORACLE_NULL_SEMANTICS,
    "q_nested_prune": ORACLE_NESTED_PRUNE,
    "q_bin_pack": ORACLE_BIN_PACK,
    "q_read_orc": ORACLE_READ_ORC,
    "q_clustering_coeff": ORACLE_CLUSTERING_COEFF,
    "q_adamic_adar": ORACLE_ADAMIC_ADAR,
    "q_degree_dist": ORACLE_DEGREE_DIST,
    "q_assortativity": ORACLE_ASSORTATIVITY,
    "q_bm25": ORACLE_BM25,
    "q_unigram_surprise": ORACLE_UNIGRAM_SURPRISE,
    "q_zscore_outlier": ORACLE_ZSCORE_OUTLIER,
    "q_sssp_weighted": ORACLE_SSSP_WEIGHTED,
    "q_personalized_pagerank": _oracle_personalized_pagerank(),
    "q_read_text_log": ORACLE_READ_TEXT_LOG,
    "q_funnel": ORACLE_FUNNEL,
    "q_retention_cohort": ORACLE_RETENTION_COHORT,
    "q_scd2_intervals": ORACLE_SCD2_INTERVALS,
    "q_rolling_7d": ORACLE_ROLLING_7D,
    "q_time_weighted_avg": ORACLE_TIME_WEIGHTED_AVG,
    "q_running_distinct": ORACLE_RUNNING_DISTINCT,
    "q_interval_overlap": ORACLE_INTERVAL_OVERLAP,
    "q_gaps_islands": ORACLE_GAPS_ISLANDS,
    "q_mad_outlier": ORACLE_MAD_OUTLIER,
    "q_markov_transitions": ORACLE_MARKOV_TRANSITIONS,
    "q_seasonal_baseline": ORACLE_SEASONAL_BASELINE,
    "q_target_encode": ORACLE_TARGET_ENCODE,
    "q_freq_pairs": ORACLE_FREQ_PAIRS,
    "q_incremental_agg": ORACLE_INCREMENTAL_AGG,
    "q_cdc_apply": ORACLE_CDC_APPLY,
    "q_expectations": ORACLE_EXPECTATIONS,
    "q_profile_columns": ORACLE_PROFILE_COLUMNS,
    "q_skew_stats": ORACLE_SKEW_STATS,
    "q_attribution": ORACLE_ATTRIBUTION,
    "q_ab_ttest": ORACLE_AB_TTEST,
    "q_item_cf": ORACLE_ITEM_CF,
    "q_read_xml": ORACLE_READ_XML,
}
