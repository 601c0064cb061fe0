"""Round-16 boundary audit, class 3: regex / locale / split dialect.

Third installment of the per-round oracle-semantics audit (r13/r14:
stream event-time boundaries; r15: batch NULL-sort / asof / quantile
bits; SURVEY §2.45). This class covers every oracle whose value path
crosses a STRING DIALECT boundary between Spark (Java regex, ICU
collation, UTF8String case mapping) and DuckDB (RE2 regexes, its own
Unicode case tables):

- q_pii_scrub       regexp_extract_all / regexp_replace (textprep.py)
- q_collation       COLLATE UTF8_LCASE grouping vs LOWER() (funcs.py)
- the split family  F.split(text, ' ') / F.split(text, '[^a-z0-9]+')
                    vs string_split / string_split_regex — empty-token
                    placement (q_text_tokens, q_token_count,
                    q_quality_score, q_tfidf, q_stopword_remove, ...)

Method (same as the prior classes):
  1. MEASURE whether the fixtures exercise each edge (P1) — an oracle
     can be green on luck if the edge never occurs in the data;
  2. where unexercised, PROBE both engines at crafted points (P2-P4)
     and print AGREE/DISAGREE per case;
  3. pin any discovered rule as a test (tests/test_llm_ops.py /
     tests/test_analytics.py) so an engine upgrade fails a pin
     loudly instead of flaking a driver hash.

Run:  python scripts/probe_regex_dialect.py
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Row  # noqa: E402

from louvain_modularity_spark.session import get_spark  # noqa: E402

SCALES = ["sf0.001", "sf0.01", "sf0.1"]

# the exact patterns the oracles share verbatim (textprep.py:247-248,
# llm_ops.py token splits)
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+"
NUM_RE = "[0-9]+"
TOKEN_RE = "[^a-z0-9]+"


def p1_fixture_exercise() -> None:
    """Does the data ever reach the dialect edges? (DuckDB, no Spark.)"""
    print("== P1: fixture exercise measurement")
    con = duckdb.connect()
    for sf in SCALES:
        d = f"/root/testdata/{sf}"
        doc = con.sql(
            f"""
            SELECT
              COUNT(*) AS docs,
              SUM(CASE WHEN text = '' THEN 1 ELSE 0 END) AS empty_text,
              SUM(CASE WHEN text LIKE ' %' THEN 1 ELSE 0 END) AS lead_sp,
              SUM(CASE WHEN text LIKE '% ' THEN 1 ELSE 0 END) AS trail_sp,
              SUM(CASE WHEN text LIKE '%  %' THEN 1 ELSE 0 END) AS dbl_sp,
              SUM(CASE WHEN regexp_matches(text, '[A-Z]') THEN 1 ELSE 0 END) AS upper_ch,
              SUM(CASE WHEN regexp_matches(text, '[^a-z0-9 ]') THEN 1 ELSE 0 END) AS non_lc,
              SUM(CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]') THEN 1 ELSE 0 END) AS non_ascii
            FROM read_parquet('{d}/documents.parquet')
            """
        ).fetchone()
        ev = con.sql(
            f"""
            SELECT
              COUNT(*) AS rows,
              SUM(CASE WHEN regexp_matches(props, '{EMAIL_RE}') THEN 1 ELSE 0 END) AS w_email,
              SUM(CASE WHEN regexp_matches(props, '{NUM_RE}') THEN 1 ELSE 0 END) AS w_digits,
              SUM(CASE WHEN regexp_matches(props, '{EMAIL_RE}' || '[.]') THEN 1 ELSE 0 END) AS email_dot_after,
              SUM(CASE WHEN regexp_matches(props, '[A-Z]') THEN 1 ELSE 0 END) AS upper_ch,
              SUM(CASE WHEN regexp_matches(props, '[^\\x00-\\x7F]') THEN 1 ELSE 0 END) AS non_ascii
            FROM read_parquet('{d}/events.parquet')
            """
        ).fetchone()
        seg = con.sql(
            f"""
            SELECT
              SUM(CASE WHEN regexp_matches(c_mktsegment, '[^\\x00-\\x7F]') THEN 1 ELSE 0 END) AS non_ascii,
              SUM(CASE WHEN c_mktsegment != upper(c_mktsegment)
                        AND c_mktsegment != lower(c_mktsegment) THEN 1 ELSE 0 END) AS mixed_case
            FROM read_parquet('{d}/customer.parquet')
            """
        ).fetchone()
        print(f"  {sf}: documents {dict(zip('docs empty lead trail dbl upper nonlc nonascii'.split(), doc))}")
        print(f"  {sf}: events    {dict(zip('rows w_email w_digits email_dot_after upper nonascii'.split(), ev))}")
        print(f"  {sf}: segments  non_ascii={seg[0]} mixed_case={seg[1]}")


SPLIT_SPACE_CASES = ["", " ", "  ", "a", " a", "a ", "a  b", " a b ", "a b"]
SPLIT_RE_CASES = ["a,b", ",a", "a,", "a,,b", ",", "A,b", "a1!?2b", "!!!", ""]
PII_CASES = [
    "contact a@b.com today",          # vanilla
    "end-of-sentence a@b.com.",       # trailing dot: domain class includes '.'
    "dash a@b-c.org- tail",           # trailing dash in domain class
    "double a@b..c dots",             # '..' inside domain
    "at a@@b twice",                  # local part can't span '@'
    "UPPER A@B.COM case",             # patterns are lowercase-only
    "plus user+tag%x_y.z@ex-ample.co 42",  # full local-part class
    "adjacent a@b.c123 digits",       # digits absorbed by domain class
    "unicode é@x.com and ١٢٣ digits",  # non-ASCII letter + Arabic-Indic digits
    "bare %_@-. symbols",             # class-only local + domain
    "digits 007 and 42x9",            # digit runs incl. leading zeros
]
COLLATION_CASES = [
    "STREET", "Street", "street",      # ASCII tri-case (the fixture shape)
    "straße", "STRASSE",               # German sharp s: full fold ß->ss?
    "İstanbul", "istanbul",            # Turkish dotted capital I (U+0130)
    "ΣΟΦΙΑΣ", "σοφιας",               # Greek final sigma context rule
]


def p2_split_dialect(spark) -> None:
    """Empty-token placement: Spark F.split (Java, limit -1) vs DuckDB
    string_split / string_split_regex."""
    print("== P2: split empty-token placement")
    con = duckdb.connect()

    def duck_split(s: str, literal: bool) -> list[str]:
        fn = "string_split" if literal else "string_split_regex"
        pat = " " if literal else TOKEN_RE
        return con.execute(f"SELECT {fn}(?, ?)", [s, pat]).fetchone()[0]

    rows = [Row(i=i, s=s) for i, s in enumerate(SPLIT_SPACE_CASES)]
    got = {
        r["i"]: r["parts"]
        for r in spark.createDataFrame(rows)
        .select("i", F.split("s", " ").alias("parts"))
        .collect()
    }
    for i, s in enumerate(SPLIT_SPACE_CASES):
        d = duck_split(s, literal=True)
        verdict = "AGREE" if got[i] == d else "DISAGREE"
        print(f"  split(' '): {s!r:12} spark={got[i]} duck={d} -> {verdict}")

    rows = [Row(i=i, s=s) for i, s in enumerate(SPLIT_RE_CASES)]
    got = {
        r["i"]: r["parts"]
        for r in spark.createDataFrame(rows)
        .select("i", F.split("s", TOKEN_RE).alias("parts"))
        .collect()
    }
    for i, s in enumerate(SPLIT_RE_CASES):
        d = duck_split(s, literal=False)
        verdict = "AGREE" if got[i] == d else "DISAGREE"
        print(f"  split(re):  {s!r:12} spark={got[i]} duck={d} -> {verdict}")


def p3_pii_regex(spark) -> None:
    """q_pii_scrub's exact expressions over crafted strings."""
    print("== P3: pii regex (extract_all counts + double replace)")
    con = duckdb.connect()
    rows = [Row(i=i, props=s) for i, s in enumerate(PII_CASES)]
    got = {
        r["i"]: (r["nd"], r["ne"], r["scrubbed"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.size(F.expr(f"regexp_extract_all(props, '{NUM_RE}', 0)")).alias("nd"),
            F.size(F.expr(f"regexp_extract_all(props, '{EMAIL_RE}', 0)")).alias("ne"),
            F.regexp_replace(
                F.regexp_replace("props", EMAIL_RE, "<EMAIL>"), NUM_RE, "<NUM>"
            ).alias("scrubbed"),
        )
        .collect()
    }
    for i, s in enumerate(PII_CASES):
        d = con.execute(
            f"""
            SELECT CAST(len(regexp_extract_all(?, '{NUM_RE}')) AS INTEGER),
                   CAST(len(regexp_extract_all(?, '{EMAIL_RE}')) AS INTEGER),
                   regexp_replace(regexp_replace(?, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{NUM_RE}', '<NUM>', 'g')
            """,
            [s, s, s],
        ).fetchone()
        verdict = "AGREE" if got[i] == tuple(d) else "DISAGREE"
        print(f"  {s!r}\n    spark={got[i]}\n    duck ={tuple(d)} -> {verdict}")


def p4_collation(spark) -> None:
    """UTF8_LCASE grouping vs DuckDB LOWER() grouping on crafted keys."""
    print("== P4: UTF8_LCASE vs LOWER() grouping")
    con = duckdb.connect()
    rows = [Row(i=i, s=s) for i, s in enumerate(COLLATION_CASES)]
    spark_groups = sorted(
        (r["n"], sorted(r["members"]))
        for r in spark.createDataFrame(rows)
        .groupBy(F.expr("collate(s, 'UTF8_LCASE')").alias("k"))
        .agg(F.count("*").alias("n"), F.collect_list("s").alias("members"))
        .collect()
    )
    duck_groups = sorted(
        (n, sorted(members))
        for n, members in con.execute(
            "SELECT COUNT(*), list(s) FROM (SELECT unnest(?) AS s) GROUP BY lower(s)",
            [COLLATION_CASES],
        ).fetchall()
    )
    print(f"  spark UTF8_LCASE groups: {spark_groups}")
    print(f"  duck  LOWER() groups:    {duck_groups}")
    print(f"  -> {'AGREE' if spark_groups == duck_groups else 'DISAGREE'}")
    # the q_collation output path also runs lower() on the collated key:
    # show Spark lower() vs DuckDB lower() on each non-ASCII case
    low = {
        r["s"]: r["l"]
        for r in spark.createDataFrame(rows).select("s", F.lower("s").alias("l")).collect()
    }
    for s in COLLATION_CASES:
        d = con.execute("SELECT lower(?)", [s]).fetchone()[0]
        if low[s] != d:
            print(f"  lower({s!r}): spark={low[s]!r} duck={d!r} -> DISAGREE")


def main() -> int:
    p1_fixture_exercise()
    spark = get_spark("regex-dialect-probe")
    p2_split_dialect(spark)
    p3_pii_regex(spark)
    p4_collation(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
