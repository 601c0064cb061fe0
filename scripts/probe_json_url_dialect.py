"""Round-16 boundary audit, class 4 (head start on r17): JSON-path and
URL-parse dialect.

Same method as classes 1-3 (SURVEY §2.45/§2.49): measure fixture
exercise, probe both engines at crafted points, pin discovered rules.

Oracles in the class:
- q_fn_json   get_json_object(props, '$.k') / from_json("k INT") vs
              DuckDB props->>'k' / CAST(... AS INTEGER)
- q_read_json (same json text surface via read paths)
- q_url_parse parse_url HOST/PATH/QUERY inversion of a constructed
              URL; oracle reconstructs from source columns, so the
              validity rests on the construction being invertible for
              the fixture's source/lang alphabets

Known dialect landmines this probes:
- invalid JSON: Spark get_json_object -> NULL; DuckDB ->> THROWS
- non-integer k under CAST: Spark from_json("k INT") -> NULL;
  DuckDB CAST(text AS INTEGER) THROWS
- nested object/array extraction: text normalization may differ
- JSON null vs missing key vs string "null"
- number token preservation (1.0, 1e2, -0)
- duplicate keys
- URL-hostile chars in source/lang would break parse_url inversion

Run:  python scripts/probe_json_url_dialect.py
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Row  # noqa: E402

from louvain_modularity_spark.session import get_spark  # noqa: E402

SCALES = ["sf0.001", "sf0.01", "sf0.1"]

JSON_CASES = [
    '{"k": 1}',               # vanilla int
    '{"k": "s"}',             # string value
    '{"k": null}',            # JSON null
    '{"x": 1}',               # missing key
    '{"k": 1.0}',             # float token
    '{"k": 1e2}',             # exponent token
    '{"k": -0}',              # negative zero token
    '{"k": {"a": 1}}',        # nested object -> text form
    '{"k": [1, 2]}',          # array -> text form
    '{"k": "1"}',             # numeric string
    '{"k": true}',            # boolean
    '{"k": "a\\nb"}',         # escaped newline in string
    '{"k": 1, "k": 2}',       # duplicate key
    'not json',               # invalid document
    "",                       # empty string
]


def p1_fixture_exercise() -> None:
    print("== P1: fixture exercise (json shape of props; url alphabets)")
    con = duckdb.connect()
    for sf in SCALES:
        d = f"/root/testdata/{sf}"
        ev = con.sql(
            f"""
            SELECT COUNT(*) AS rows,
              SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS invalid_json,
              SUM(CASE WHEN json_valid(props)
                        AND (props->>'k') IS NULL THEN 1 ELSE 0 END) AS k_missing_or_null,
              SUM(CASE WHEN json_valid(props)
                        AND json_type(props, '$.k') NOT IN ('UBIGINT','BIGINT','INTEGER')
                        AND (props->>'k') IS NOT NULL THEN 1 ELSE 0 END) AS k_not_int,
              SUM(CASE WHEN json_valid(props)
                        AND json_type(props, '$.k') IN ('OBJECT','ARRAY')
                       THEN 1 ELSE 0 END) AS k_nested
            FROM read_parquet('{d}/events.parquet')
            """
        ).fetchone()
        doc = con.sql(
            f"""
            SELECT
              SUM(CASE WHEN regexp_matches(source, '[^a-z0-9-]') THEN 1 ELSE 0 END)
                AS hostile_source,
              SUM(CASE WHEN regexp_matches(lang, '[^a-z0-9-]') THEN 1 ELSE 0 END)
                AS hostile_lang
            FROM read_parquet('{d}/documents.parquet')
            """
        ).fetchone()
        print(f"  {sf}: events {dict(zip('rows invalid k_missing_or_null k_not_int k_nested'.split(), ev))}")
        print(f"  {sf}: documents hostile_source={doc[0]} hostile_lang={doc[1]}")


def p2_json_dialect(spark) -> None:
    """q_fn_json's exact expressions over crafted documents, engine vs
    engine. DuckDB sides that THROW are recorded as 'ERROR' — a throw
    is a dialect finding (the oracle would abort where Spark nulls)."""
    print("== P2: json extraction dialect")
    con = duckdb.connect()
    rows = [Row(i=i, props=s) for i, s in enumerate(JSON_CASES)]
    got = {
        r["i"]: (r["k_str"], r["k_int"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.from_json("props", "k INT")["k"].alias("k_int"),
        )
        .collect()
    }
    for i, s in enumerate(JSON_CASES):
        try:
            d_str = con.execute("SELECT ?->>'k'", [s]).fetchone()[0]
        except Exception as exc:
            d_str = f"ERROR({type(exc).__name__})"
        try:
            d_int = con.execute(
                "SELECT CAST(?->>'k' AS INTEGER)", [s]
            ).fetchone()[0]
        except Exception as exc:
            d_int = f"ERROR({type(exc).__name__})"
        verdict = "AGREE" if got[i] == (d_str, d_int) else "DISAGREE"
        print(f"  {s!r}\n    spark={got[i]}\n    duck =({d_str!r}, {d_int!r}) -> {verdict}")


URL_CASES = [
    ("news", "en", 42, 6, 1234),          # the fixture shape
    ("a-b-c", "de", 7, 0, 9),             # allowed host/lang charset
    ("a_b", "de", 8, 1, 9),               # underscore: Java URI REJECTS it in a hostname
    ("has space", "en", 1, 1, 1),         # space in host label
    ("q?m", "en", 2, 2, 2),               # '?' in host -> early query split
    ("frag#x", "en", 3, 3, 3),            # '#' in host -> fragment split
    ("user@host", "en", 4, 4, 4),         # '@' -> userinfo reinterpretation
    ("news", "en/extra", 5, 5, 5),        # '/' in lang -> extra path segment
    ("Üni", "en", 6, 6, 6),               # non-ASCII host label
]


def p3_url_inversion(spark) -> None:
    """q_url_parse's construct->parse loop on hostile inputs (via
    try_parse_url — plain parse_url THROWS on an invalid URL, the first
    P3 finding): for each
    crafted (source, lang, doc_id, ref, n_chars), compare Spark's
    parsed components against the oracle's reconstruction."""
    print("== P3: parse_url inversion on hostile source/lang")
    rows = [
        Row(i=i, source=s, lang=l, doc_id=d, ref=r, n_chars=n)
        for i, (s, l, d, r, n) in enumerate(URL_CASES)
    ]
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id"),
        F.lit("?ref="), F.col("ref"), F.lit("&k="), F.col("n_chars"),
    )
    got = {
        r["i"]: (r["host"], r["path_lang"], r["k"], r["rf"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.try_parse_url(url, F.lit("HOST")).alias("host"),
            F.regexp_extract(
                F.try_parse_url(url, F.lit("PATH")), r"^/([a-z]+)/", 1
            ).alias("path_lang"),
            F.try_parse_url(url, F.lit("QUERY"), F.lit("k")).alias("k"),
            F.try_parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("rf"),
        )
        .collect()
    }
    for i, (s, l, d, r, n) in enumerate(URL_CASES):
        want = (f"{s}.example.org", l if l.isalpha() else l.split("/")[0], str(n), str(r))
        verdict = "INVERTS" if got[i] == want else "BREAKS"
        print(f"  src={s!r} lang={l!r}: parsed={got[i]} want~{want} -> {verdict}")


def main() -> int:
    p1_fixture_exercise()
    spark = get_spark("json-url-dialect-probe")
    p2_json_dialect(spark)
    p3_url_inversion(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
