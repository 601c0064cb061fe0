"""Scalar function surface (SURVEY.md §2.8) — one combined query per
family, all built-in `pyspark.sql.functions` (JVM-side, codegen'd).

Dialect notes encoded in the oracles:
- DuckDB ``regexp_replace`` replaces the first match unless the 'g'
  flag is passed; Spark replaces all → oracle passes 'g'.
- DuckDB ``dayofweek`` is 0=Sunday while Spark's is 1=Sunday → use
  Spark ``weekday`` (0=Monday) = DuckDB ``isodow - 1``.
- Map/JSON family: the Spark side exercises map/json builtins; the
  oracle reproduces the *values* from the raw JSON (the oracle checks
  results, not plans).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .sources import load


def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.regexp_extract("p_brand", "#(\\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.element_at(F.split("p_type", " "), 1).alias("type_first"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


ORACLE_FN_STRING = """
SELECT p_partkey,
       UPPER(p_name)                       AS name_upper,
       LOWER(p_brand)                      AS brand_lower,
       SUBSTRING(p_name, 1, 5)             AS name_head,
       CAST(LENGTH(p_name) AS INTEGER)     AS name_len,
       CONCAT_WS('|', p_brand, p_type)     AS brand_type,
       TRIM('  pad  ')                     AS trimmed,
       LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       REGEXP_EXTRACT(p_brand, '#(\\d+)', 1) AS brand_num,
       REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
       STRING_SPLIT(p_type, ' ')[1]        AS type_first,
       (p_name LIKE '%a%')                 AS has_a
FROM part
"""


def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_2002"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.weekday("o_orderdate").alias("order_weekday"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months(F.col("o_orderdate").cast("date"), 2).alias("plus2m"),
    )


ORACLE_FN_DATE = """
SELECT o_orderkey,
       CAST(EXTRACT(year  FROM o_orderdate) AS INTEGER)  AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER)  AS order_month,
       CAST(EXTRACT(day   FROM o_orderdate) AS INTEGER)  AS order_day,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE)    AS order_month_start,
       CAST(o_orderdate AS DATE) + 30                    AS due_date,
       CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INTEGER) AS days_to_2002,
       CAST(o_orderdate AS DATE)                         AS order_date,
       CAST(EXTRACT(isodow FROM o_orderdate) - 1 AS INTEGER) AS order_weekday,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
FROM orders
"""


def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # exact decimal product, rounded in decimal domain (see relational.py
    # note on ROUND-midpoint divergence between engines)
    net = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 2).cast("double").alias("net_price"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.03), 6).alias("disc_dev"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


ORACLE_FN_MATH = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS net_price,
       CAST(FLOOR(l_quantity) AS BIGINT)            AS qty_floor,
       CAST(CEIL(l_extendedprice) AS BIGINT)        AS price_ceil,
       ROUND(ABS(l_discount - 0.03), 6)             AS disc_dev,
       ROUND(POW(l_quantity, 2), 6)                 AS qty_sq,
       ROUND(SQRT(l_extendedprice), 6)              AS price_sqrt,
       ROUND(LN(l_extendedprice), 6)                AS price_ln,
       ROUND(EXP(l_discount), 6)                    AS disc_exp,
       l_orderkey % 7                               AS key_mod7,
       CAST(SIGN(l_discount - 0.05) AS INTEGER)     AS disc_sign
FROM lineitem
"""


def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")
        ).alias("segment_renamed"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_floor0"),
        F.round(F.least(F.col("c_acctbal"), F.lit(1000.0)), 2).alias("bal_cap1000"),
    )


ORACLE_FN_COND = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END                                    AS bal_tier,
       COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'CAR')     AS segment_renamed,
       ROUND(GREATEST(c_acctbal, 0.0), 2)                      AS bal_floor0,
       ROUND(LEAST(c_acctbal, 1000.0), 2)                      AS bal_cap1000
FROM customer
"""


def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized document text. Array-valued
    outputs are folded to scalars (joined strings / sums) so the hash
    compare is not hostage to list-type conversion differences."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "the").alias("has_the"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.concat_ws("|", F.slice(F.sort_array(toks), 1, 3)).alias("top3_sorted"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("total_token_chars"),
    )


ORACLE_FN_ARRAY = """
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER)                    AS n_tokens,
       STRING_SPLIT(text, ' ')[1]                                       AS first_token,
       LIST_CONTAINS(STRING_SPLIT(text, ' '), 'the')                    AS has_the,
       CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INTEGER)     AS n_distinct,
       ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(text, ' '))[1:3], '|')    AS top3_sorted,
       CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '), x -> LENGTH(x))) AS INTEGER) AS total_token_chars
FROM documents
"""


def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct (nested record) surface: build structs, use one as an
    aggregation KEY (group by a composite value, not columns), compare
    structs ordinally (max_by over a (balance, custkey) struct gives
    the per-group argmax with a total-order tiebreak), and project
    fields back out flat — the pattern every 'latest/top row per key'
    plan uses. Output is flattened so the cross-engine hash sees only
    scalars."""
    c = load(spark, sf_dir, "customer")
    key = F.struct(
        F.col("c_nationkey").cast("int").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    )
    best = F.max_by(
        F.struct(F.col("c_acctbal").alias("bal"), F.col("c_custkey").alias("ck")),
        F.struct(F.col("c_acctbal"), F.col("c_custkey")),
    )
    return (
        c.groupBy(key.alias("key"))
        .agg(
            F.count("*").alias("n_cust"),
            best.alias("best"),
        )
        .select(
            F.col("key.nk").alias("nationkey"),
            F.col("key.seg").alias("segment"),
            "n_cust",
            F.col("best.ck").alias("top_custkey"),
            F.round(F.col("best.bal"), 2).alias("top_acctbal"),
        )
    )


# DuckDB max_by has no struct-ordering overload; the row_number twin
# spells the same lexicographic (balance, custkey) argmax
ORACLE_FN_STRUCT = """
WITH ranked AS (
  SELECT c_nationkey, c_mktsegment, c_acctbal, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey, c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn,
         COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n_cust
  FROM customer
)
SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
       c_mktsegment AS segment,
       CAST(n_cust AS BIGINT) AS n_cust,
       c_custkey AS top_custkey,
       ROUND(c_acctbal, 2) AS top_acctbal
FROM ranked WHERE rn = 1
"""


def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/access over parsed event props. The oracle
    reproduces the same scalar values straight from the JSON."""
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    m = F.create_map(
        F.lit("count"), parsed["k"], F.lit("twice"), parsed["k"] * 2
    )
    return ev.select(
        "event_id",
        F.element_at(m, "count").alias("k_val"),
        F.element_at(m, "twice").alias("k_twice"),
        F.size(m).alias("m_size"),
        F.concat_ws(",", F.map_keys(m)).alias("m_keys"),
    )


ORACLE_FN_MAP = """
SELECT event_id,
       CAST(props->>'k' AS INTEGER)     AS k_val,
       CAST(props->>'k' AS INTEGER) * 2 AS k_twice,
       2                                AS m_size,
       'count,twice'                    AS m_keys
FROM events
"""


def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT")["k"].alias("k_int"),
        (F.from_json("props", "k INT")["k"] + 1).alias("k_plus1"),
    )


ORACLE_FN_JSON = """
SELECT event_id,
       props->>'k'                      AS k_str,
       CAST(props->>'k' AS INTEGER)     AS k_int,
       CAST(props->>'k' AS INTEGER) + 1 AS k_plus1
FROM events
"""


def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT round trip: build a nested JSON document per
    lineitem row (scalar + array + nested object), ``parse_json`` it
    into a VARIANT, then extract typed values back out with
    ``variant_get`` path expressions and aggregate. The oracle
    recomputes from the source columns directly, so the whole
    construct→parse→extract loop must be lossless.

    Scale note: VARIANT is Spark's shredded semi-structured type — at
    100 TB the parse happens once at ingest and ``variant_get`` reads
    binary-encoded paths without re-parsing JSON text per row; the
    extraction is plain whole-stage-codegen projection."""
    li = load(spark, sf_dir, "lineitem")
    doc = li.select(
        F.to_json(
            F.struct(
                F.col("l_orderkey").alias("ok"),
                F.col("l_linenumber").alias("ln"),
                F.array("l_partkey", "l_suppkey").alias("keys"),
                F.struct(F.col("l_returnflag").alias("f")).alias("nest"),
            )
        ).alias("j")
    )
    v = doc.select(F.parse_json("j").alias("v"))
    extracted = v.select(
        F.expr("variant_get(v, '$.ok', 'bigint')").alias("orderkey"),
        F.expr("variant_get(v, '$.ln', 'int')").alias("linenumber"),
        F.expr("variant_get(v, '$.keys[0]', 'bigint')").alias("partkey"),
        F.expr("variant_get(v, '$.keys[1]', 'bigint')").alias("suppkey"),
        F.expr("variant_get(v, '$.nest.f', 'string')").alias("flag"),
    )
    return extracted.groupBy("flag").agg(
        F.count("*").alias("n_lines"),
        F.sum("orderkey").alias("sum_orderkey"),
        F.sum("partkey").alias("sum_partkey"),
        F.sum("suppkey").alias("sum_suppkey"),
        F.sum("linenumber").alias("sum_linenumber"),
    )


ORACLE_FN_VARIANT = """
SELECT l_returnflag                       AS flag,
       COUNT(*)                           AS n_lines,
       CAST(SUM(l_orderkey) AS BIGINT)    AS sum_orderkey,
       CAST(SUM(l_partkey) AS BIGINT)     AS sum_partkey,
       CAST(SUM(l_suppkey) AS BIGINT)     AS sum_suppkey,
       CAST(SUM(l_linenumber) AS BIGINT)  AS sum_linenumber
FROM lineitem
GROUP BY l_returnflag
"""


def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-handling surface: the ``try_*`` family returns NULL
    where strict ANSI evaluation would raise — division by zero,
    malformed casts, out-of-range array access, failed number parses.
    The probe inputs derive from customer columns so every failure
    mode actually occurs in-data. The oracle reproduces each NULL with
    explicit CASE guards (DuckDB's strict operators would error), so
    parity proves the documented NULL-on-error semantics, not just
    the happy path."""
    c = load(spark, sf_dir, "customer")
    zero_or_mod = (F.col("c_custkey") % 3).cast("long")
    digits_or_junk = F.when(
        F.col("c_custkey") % 2 == 0, F.col("c_custkey").cast("string")
    ).otherwise(F.concat(F.lit("x"), F.col("c_custkey").cast("string")))
    arr = F.array(F.lit(10), F.lit(20), F.lit(30))
    idx = (F.col("c_custkey") % 5).cast("int")
    return c.select(
        "c_custkey",
        F.try_divide(F.col("c_custkey").cast("long"), zero_or_mod).alias(
            "div_or_null"
        ),
        digits_or_junk.try_cast("long").alias("cast_or_null"),
        F.try_element_at(arr, idx + 1).alias("elem_or_null"),
        F.try_to_number(digits_or_junk, F.lit("999999999")).cast("double").alias(
            "parse_or_null"
        ),
    )


ORACLE_FN_TRY = """
SELECT c_custkey,
       CASE WHEN c_custkey % 3 = 0 THEN NULL
            ELSE c_custkey / CAST(c_custkey % 3 AS DOUBLE) END AS div_or_null,
       TRY_CAST(CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey AS VARCHAR)
                     ELSE 'x' || CAST(c_custkey AS VARCHAR) END
                AS BIGINT) AS cast_or_null,
       CASE WHEN c_custkey % 5 + 1 BETWEEN 1 AND 3
            THEN [10, 20, 30][CAST(c_custkey % 5 + 1 AS INTEGER)] END
         AS elem_or_null,
       CAST(TRY_CAST(CASE WHEN c_custkey % 2 = 0
                          THEN CAST(c_custkey AS VARCHAR)
                          ELSE 'x' || CAST(c_custkey AS VARCHAR) END
                     AS BIGINT) AS DOUBLE) AS parse_or_null
FROM customer
"""


def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: build a canonical URL per document from
    its attributes, then decompose it with ``parse_url`` (HOST, PATH,
    QUERY, and keyed QUERY extraction) plus a ``regexp_extract`` over
    the path — the log-sessionization / referrer-analytics surface.
    The oracle reconstructs every component from the SOURCE columns,
    so Spark's parser must invert the construction losslessly.

    100 TB shape: pure per-row whole-stage-codegen projections into
    one map-side-combined groupBy on the host key."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id"),
        F.lit("?ref="),
        F.col("doc_id") % 7,
        F.lit("&k="),
        F.col("n_chars"),
    )
    u = d.select(url.alias("url"))
    return (
        u.select(
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.regexp_extract(
                F.parse_url("url", F.lit("PATH")), r"^/([a-z]+)/", 1
            ).alias("path_lang"),
            F.parse_url("url", F.lit("QUERY"), F.lit("k"))
            .cast("long")
            .alias("k"),
            F.parse_url("url", F.lit("QUERY"), F.lit("ref"))
            .cast("long")
            .alias("ref"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("path_lang").alias("n_langs"),
            F.max("k").alias("max_k"),
            F.sum("ref").alias("sum_ref"),
        )
        .orderBy("host")
    )


ORACLE_URL_PARSE = """
SELECT source || '.example.org' AS host,
       COUNT(*) AS n,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       MAX(n_chars) AS max_k,
       CAST(SUM(doc_id % 7) AS BIGINT) AS sum_ref
FROM documents
GROUP BY 1 ORDER BY 1
"""


def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4.0): case-insensitive grouping via
    ``COLLATE UTF8_LCASE`` — the engine-level answer to the
    lower()-wrapping anti-pattern (a collated comparison can still use
    binary-prefix optimizations and keeps the original strings). The
    fixture's segments are deterministically case-perturbed by key
    parity (Initcap on even customer keys, lower on odd), then grouped
    case-insensitively; counts must recover the un-perturbed segment
    distribution, which the oracle computes with LOWER().

    100 TB: a collated groupBy shuffles on the collation key exactly
    like any other — no extra pass, no expression wrapping every
    probe of the column.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pert = F.when(
        F.col("c_custkey") % 2 == 0, F.initcap(F.lower("c_mktsegment"))
    ).otherwise(F.lower("c_mktsegment"))
    return (
        c.select("c_custkey", pert.alias("seg"))
        .groupBy(F.expr("collate(seg, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
            F.countDistinct("seg").alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("segment"),
            "n_customers",
            "min_custkey",
            "n_case_variants",
        )
        .orderBy("segment")
    )


ORACLE_COLLATION = """
WITH pert AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0
              THEN concat(upper(substr(lower(c_mktsegment), 1, 1)),
                          substr(lower(c_mktsegment), 2))
              ELSE lower(c_mktsegment) END AS seg
  FROM customer
)
SELECT lower(seg) AS segment,
       COUNT(*) AS n_customers,
       MIN(c_custkey) AS min_custkey,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_variants
FROM pert
GROUP BY lower(seg)
ORDER BY segment
"""


QUERIES = {
    "q_fn_string": q_fn_string,
    "q_fn_date": q_fn_date,
    "q_fn_math": q_fn_math,
    "q_fn_cond": q_fn_cond,
    "q_fn_array": q_fn_array,
    "q_fn_struct": q_fn_struct,
    "q_fn_map": q_fn_map,
    "q_fn_json": q_fn_json,
    "q_fn_variant": q_fn_variant,
    "q_fn_try": q_fn_try,
    "q_url_parse": q_url_parse,
    "q_collation": q_collation,
}

ORACLES = {
    "q_fn_string": ORACLE_FN_STRING,
    "q_fn_date": ORACLE_FN_DATE,
    "q_fn_math": ORACLE_FN_MATH,
    "q_fn_cond": ORACLE_FN_COND,
    "q_fn_array": ORACLE_FN_ARRAY,
    "q_fn_struct": ORACLE_FN_STRUCT,
    "q_fn_map": ORACLE_FN_MAP,
    "q_fn_json": ORACLE_FN_JSON,
    "q_fn_variant": ORACLE_FN_VARIANT,
    "q_fn_try": ORACLE_FN_TRY,
    "q_url_parse": ORACLE_URL_PARSE,
    "q_collation": ORACLE_COLLATION,
}
