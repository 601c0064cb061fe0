"""Round-17 boundary audit, class 6 (pulled forward a round):
float special values and math-domain edges.

Sixth installment of the per-round oracle-semantics audit (r13-r15:
stream/batch boundaries; r16: regex/locale/split + JSON/URL; r17:
date/time — SURVEY §2.45/§2.49/§2.51/§2.53). This class covers the
IEEE-754 special-value conventions an oracle pair can silently
disagree on:

- **NaN**: grouping equality (one NaN group or many?), ORDER BY
  placement, MIN/MAX absorption;
- **-0.0**: grouping key identity with +0.0, output VALUE sign (the
  local canonicalizer collapses -0.0 to "0" — oracle_check._norm_cell
  — but the driver's value-hash may not, so a one-sided -0.0 output
  is a latent driver-flake class);
- **division/modulo by zero**: double and integer, NULL-vs-Inf-vs-
  throw conventions;
- **math-domain edges**: ln(0), ln(-1), sqrt(-1), asin(2),
  exp(±overflow), power(negative, fractional) — the guards the
  ln/sqrt/log oracles (q_unigram_surprise, q_bm25, entropy family,
  z-scores) rely on;
- **CAST overflow / fractional casts**: double → BIGINT beyond int64
  (measured r17: BOTH throw under this session's Spark-4 ANSI
  default — loud either way) and the SILENT in-range class: Spark
  CAST(2.7 AS BIGINT) TRUNCATES to 2 while DuckDB ROUNDS to 3 — the
  r16 throwing-CAST registry scan closed the JSON class; this probes
  the numeric class.

Method (same as the prior classes):
  1. P1 MEASURE: mechanically run all 297 DuckDB oracles at both
     oracle scales and count NaN / ±Inf / -0.0 occurrences per float
     column — does any actual output carry a special value TODAY?
     Plus a SQL-text scan for the risky function families.
  2. P2-P5 PROBE both engines at crafted points, print
     AGREE/DISAGREE per case.
  3. Pin discovered rules / scope guards in tests/test_dialect.py.

Run:  python scripts/probe_float_edges.py            # probes only
      python scripts/probe_float_edges.py --scan     # + P1 oracle scan
"""

from __future__ import annotations

import math
import re
import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Row  # noqa: E402

SCALES = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
}


def p1_oracle_output_scan() -> None:
    """Run every DuckDB oracle and count special-value cells in every
    DOUBLE/FLOAT column. A hash-green history plus zero occurrences
    here means the special-value conventions are fixture-UNEXERCISED
    (the crafted probes below are the only non-vacuous evidence); any
    non-zero count names the oracle whose green actively depends on
    cross-engine special-value agreement."""
    from oracle_check import duckdb_con
    from louvain_modularity_spark.registry import all_oracles

    print("== P1: special values in actual oracle outputs (DuckDB side)")
    oracles = all_oracles()
    hits: list[str] = []
    for sf_name, sf_dir in SCALES.items():
        con = duckdb_con(sf_dir)
        n_cols = 0
        for name, sql in sorted(oracles.items()):
            try:
                rel = con.sql(sql)
                cols = [
                    c for c, t in zip(rel.columns, rel.types)
                    if str(t) in ("DOUBLE", "FLOAT", "REAL")
                ]
                if not cols:
                    continue
                n_cols += len(cols)
                checks = ", ".join(
                    f'SUM(CASE WHEN isnan("{c}") THEN 1 ELSE 0 END), '
                    f'SUM(CASE WHEN isinf("{c}") THEN 1 ELSE 0 END), '
                    f'SUM(CASE WHEN "{c}" = 0 AND signbit("{c}") THEN 1 ELSE 0 END)'
                    for c in cols
                )
                row = con.sql(f"SELECT {checks} FROM ({sql})").fetchone()
                for j, c in enumerate(cols):
                    nan, inf, negz = row[3 * j], row[3 * j + 1], row[3 * j + 2]
                    if nan or inf or negz:
                        hits.append(f"{name}.{c}@{sf_name}")
                        print(f"  HIT {name}.{c} @ {sf_name}: "
                              f"nan={nan} inf={inf} neg_zero={negz}")
            except Exception as e:  # pragma: no cover - scan robustness
                print(f"  SCAN-ERROR {name} @ {sf_name}: {type(e).__name__}: {e}")
        con.close()
        print(f"  {sf_name}: scanned {len(oracles)} oracles, "
              f"{n_cols} float columns")
    if not hits:
        print("  RESULT: zero NaN / Inf / -0.0 cells in any oracle output "
              "at either scale — the special-value conventions are "
              "fixture-unexercised (probes below are the evidence)")
    # text scan: which oracles even reach the risky families
    risky = re.compile(r"\b(ln|log|log2|log10|sqrt|asin|acos|power|pow)\s*\(", re.I)
    users = sorted(n for n, s in oracles.items() if risky.search(s))
    print(f"  math-domain-fn oracles (text scan): {len(users)}")


NAN = float("nan")
INF = float("inf")
NEG0 = -0.0

GROUP_CASES = [NAN, NAN, 0.0, NEG0, 1.0, INF, -INF]
SORT_CASES = [NAN, -INF, -1.0, NEG0, 0.0, 1.0, INF]


#: DuckDB-side literal list matching GROUP_CASES / SORT_CASES — the
#: Python client binds a SCALAR float('nan') faithfully but converts
#: NaN members of a LIST parameter to NULL (measured r17), and a bare
#: -0.0 literal is DECIMAL and loses its sign — so NaN/-0.0 must be
#: constructed IN SQL
DD_GROUP = ("['nan'::DOUBLE, 'nan'::DOUBLE, 0.0::DOUBLE, -(0.0::DOUBLE), "
            "1.0::DOUBLE, 'inf'::DOUBLE, '-inf'::DOUBLE]")
DD_SORT = ("['nan'::DOUBLE, '-inf'::DOUBLE, -1.0::DOUBLE, -(0.0::DOUBLE), "
           "0.0::DOUBLE, 1.0::DOUBLE, 'inf'::DOUBLE]")


def p2_nan_negzero_semantics(spark) -> None:
    """NaN/-0.0 grouping identity, ORDER BY placement, MIN/MAX."""
    print("== P2: NaN / -0.0 grouping, ordering, aggregates")
    con = duckdb.connect()
    # client boundary fact first: does param binding keep NaN?
    bound = con.execute("SELECT ?", [float("nan")]).fetchone()[0]
    print(f"  note: duckdb SCALAR param-bound float('nan') round-trips as {bound!r}; "
          "binding a LIST of floats converts NaN members to NULL (measured "
          "r17 - construct NaN in SQL when probing aggregates), and a bare "
          "-0.0 literal is DECIMAL and loses its sign (use -(0.0::DOUBLE))")
    # grouping: how many groups? is -0.0 merged with 0.0, NaN with NaN?
    sdf = spark.createDataFrame([(v,) for v in GROUP_CASES], "x DOUBLE")
    sp_groups = sorted(
        [(repr(r["x"]), r["n"]) for r in sdf.groupBy("x").agg(F.count("*").alias("n")).collect()]
    )
    dd_groups = sorted(
        (repr(x), n)
        for x, n in con.execute(
            f"SELECT x, COUNT(*) FROM (SELECT unnest({DD_GROUP}) AS x) GROUP BY x"
        ).fetchall()
    )
    verdict = "AGREE" if sp_groups == dd_groups else "DISAGREE"
    print(f"  {verdict}: groupBy {sp_groups} vs {dd_groups}")
    # does a grouped -0.0 KEY come back as +0.0 (normalized) or -0.0?
    sp_key = [r["x"] for r in
              spark.createDataFrame([(NEG0,), (NEG0,)], "x DOUBLE")
              .groupBy("x").count().collect()]
    dd_key = [r[0] for r in con.execute(
        "SELECT x FROM (SELECT unnest([-0.0, -0.0]::DOUBLE[]) AS x) GROUP BY x"
    ).fetchall()]
    print(f"  note: grouped -0.0 key: spark={[repr(v) for v in sp_key]} "
          f"duckdb={[repr(v) for v in dd_key]}")
    # -0.0 as a plain projected VALUE (no grouping)
    sp_val = spark.createDataFrame([(NEG0,)], "x DOUBLE").select(
        F.col("x"), (F.col("x") * F.lit(1.0)).alias("y")
    ).collect()[0]
    dd_val = con.execute("SELECT -0.0::DOUBLE, -0.0::DOUBLE * 1.0").fetchone()
    print(f"  note: projected -0.0 value: spark={repr(sp_val['x'])},{repr(sp_val['y'])} "
          f"duckdb={repr(dd_val[0])},{repr(dd_val[1])}")
    # ORDER BY placement
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(SORT_CASES)], "i INT, x DOUBLE")
    sp_asc = [repr(r["x"]) for r in sdf.orderBy("x").collect()]
    dd_asc = [repr(r[0]) for r in con.execute(
        f"SELECT x FROM (SELECT unnest({DD_SORT}) AS x) ORDER BY x"
    ).fetchall()]
    verdict = "AGREE" if sp_asc == dd_asc else "DISAGREE"
    print(f"  {verdict}: ORDER BY ASC {sp_asc} vs {dd_asc}")
    # MIN / MAX with a NaN present
    agg = sdf.agg(F.min("x").alias("mn"), F.max("x").alias("mx")).collect()[0]
    dd_mn, dd_mx = con.execute(
        f"SELECT MIN(x), MAX(x) FROM (SELECT unnest({DD_SORT}) AS x)"
    ).fetchone()
    verdict = ("AGREE" if (repr(agg["mn"]), repr(agg["mx"])) == (repr(dd_mn), repr(dd_mx))
               else "DISAGREE")
    print(f"  {verdict}: MIN/MAX with NaN spark=({agg['mn']!r},{agg['mx']!r}) "
          f"duckdb=({dd_mn!r},{dd_mx!r})")
    # SUM / AVG propagation (exclude +inf so the sum is NaN-driven)
    s = sdf.where(F.col("x") != F.lit(INF)).agg(F.sum("x").alias("s")).collect()[0]["s"]
    d = con.execute(
        f"SELECT SUM(x) FROM (SELECT unnest({DD_SORT}) AS x) WHERE x != 'inf'::DOUBLE"
    ).fetchone()[0]
    print(f"  {'AGREE' if repr(s) == repr(d) else 'DISAGREE'}: "
          f"SUM with NaN spark={s!r} duckdb={d!r}")
    # ROUND sign at the zero boundary: does rounding a tiny negative
    # to 6 places yield -0.0 on one side and +0.0 on the other?
    for v in (-1e-9, -4.9e-7, 1e-9):
        sp = spark.createDataFrame([(v,)], "x DOUBLE").select(
            F.round("x", 6).alias("r")
        ).collect()[0]["r"]
        dd = con.execute("SELECT round(?::DOUBLE, 6)", [v]).fetchone()[0]
        verdict = "AGREE" if repr(sp) == repr(dd) else "DISAGREE"
        print(f"  {verdict}: round({v!r}, 6) spark={sp!r} duckdb={dd!r}")


DIV_CASES = [
    ("1.0 double / 0.0", "SELECT 1.0::DOUBLE / 0.0::DOUBLE"),
    ("-1.0 double / 0.0", "SELECT -1.0::DOUBLE / 0.0::DOUBLE"),
    ("0.0 double / 0.0", "SELECT 0.0::DOUBLE / 0.0::DOUBLE"),
    ("1 int / 0", "SELECT 1 / 0"),
    ("1 int % 0", "SELECT 1 % 0"),
    ("1.0 double % 0.0", "SELECT 1.0::DOUBLE % 0.0::DOUBLE"),
]


def p3_division_by_zero(spark) -> None:
    """NULL-vs-Inf-vs-throw conventions for /0 and %0."""
    print("== P3: division / modulo by zero")
    con = duckdb.connect()
    spark_exprs = {
        "1.0 double / 0.0": "CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)",
        "-1.0 double / 0.0": "CAST(-1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)",
        "0.0 double / 0.0": "CAST(0.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)",
        "1 int / 0": "1 / 0",
        "1 int % 0": "1 % 0",
        "1.0 double % 0.0": "CAST(1.0 AS DOUBLE) % CAST(0.0 AS DOUBLE)",
    }
    for label, dsql in DIV_CASES:
        try:
            sp = spark.sql(f"SELECT {spark_exprs[label]}").collect()[0][0]
            sp = repr(sp)
        except Exception as e:
            sp = f"THROWS({type(e).__name__})"
        try:
            dd = repr(con.execute(dsql).fetchone()[0])
        except Exception as e:
            dd = f"THROWS({type(e).__name__})"
        verdict = "AGREE" if sp == dd else "DISAGREE"
        print(f"  {verdict}: {label} -> spark={sp} duckdb={dd}")


MATH_CASES = [
    ("ln(0)", "ln(0.0::DOUBLE)", "ln(CAST(0.0 AS DOUBLE))"),
    ("ln(-1)", "ln(-1.0::DOUBLE)", "ln(CAST(-1.0 AS DOUBLE))"),
    ("log10(0)", "log10(0.0::DOUBLE)", "log10(CAST(0.0 AS DOUBLE))"),
    ("sqrt(-1)", "sqrt(-1.0::DOUBLE)", "sqrt(CAST(-1.0 AS DOUBLE))"),
    ("asin(2)", "asin(2.0::DOUBLE)", "asin(CAST(2.0 AS DOUBLE))"),
    ("exp(1000)", "exp(1000.0::DOUBLE)", "exp(CAST(1000.0 AS DOUBLE))"),
    ("exp(-1000)", "exp(-1000.0::DOUBLE)", "exp(CAST(-1000.0 AS DOUBLE))"),
    ("power(-8, 1/3)", "power(-8.0::DOUBLE, 0.3333333333333333)",
     "power(CAST(-8.0 AS DOUBLE), 0.3333333333333333)"),
    ("power(0, -1)", "power(0.0::DOUBLE, -1.0)", "power(CAST(0.0 AS DOUBLE), -1.0)"),
]


def p4_math_domain_edges(spark) -> None:
    """ln/log/sqrt/asin/exp/power outside their domains."""
    print("== P4: math-domain edges")
    con = duckdb.connect()
    for label, dsql, ssql in MATH_CASES:
        try:
            sp = repr(spark.sql(f"SELECT {ssql}").collect()[0][0])
        except Exception as e:
            sp = f"THROWS({type(e).__name__})"
        try:
            dd = repr(con.execute(f"SELECT {dsql}").fetchone()[0])
        except Exception as e:
            dd = f"THROWS({type(e).__name__})"
        verdict = "AGREE" if sp == dd else "DISAGREE"
        print(f"  {verdict}: {label} -> spark={sp} duckdb={dd}")


CAST_CASES = [
    ("1e20 -> BIGINT", "CAST(1e20 AS BIGINT)"),
    ("-1e20 -> BIGINT", "CAST(-1e20 AS BIGINT)"),
    ("NaN -> BIGINT", "CAST('nan'::DOUBLE AS BIGINT)"),
    ("2.7 -> BIGINT", "CAST(2.7 AS BIGINT)"),
    ("-2.7 -> BIGINT", "CAST(-2.7 AS BIGINT)"),
    ("2^31 -> INT", "CAST(2147483648.0 AS INTEGER)"),
]


def p5_cast_overflow(spark) -> None:
    """double -> integral casts: clamp vs throw vs NULL; and the
    rounding direction of in-range fractional casts."""
    print("== P5: numeric cast overflow / fractional casts")
    con = duckdb.connect()
    spark_sql = {
        "1e20 -> BIGINT": "CAST(CAST(1e20 AS DOUBLE) AS BIGINT)",
        "-1e20 -> BIGINT": "CAST(CAST(-1e20 AS DOUBLE) AS BIGINT)",
        "NaN -> BIGINT": "CAST(CAST('NaN' AS DOUBLE) AS BIGINT)",
        "2.7 -> BIGINT": "CAST(CAST(2.7 AS DOUBLE) AS BIGINT)",
        "-2.7 -> BIGINT": "CAST(CAST(-2.7 AS DOUBLE) AS BIGINT)",
        "2^31 -> INT": "CAST(CAST(2147483648.0 AS DOUBLE) AS INTEGER)",
    }
    for label, dsql in CAST_CASES:
        try:
            sp = repr(spark.sql(f"SELECT {spark_sql[label]}").collect()[0][0])
        except Exception as e:
            sp = f"THROWS({type(e).__name__})"
        try:
            dd = repr(con.execute(f"SELECT {dsql}").fetchone()[0])
        except Exception as e:
            dd = f"THROWS({type(e).__name__})"
        verdict = "AGREE" if sp == dd else "DISAGREE"
        print(f"  {verdict}: {label} -> spark={sp} duckdb={dd}")


def main() -> None:
    if "--scan" in sys.argv:
        p1_oracle_output_scan()
    from louvain_modularity_spark.session import get_spark

    spark = get_spark()
    p2_nan_negzero_semantics(spark)
    p3_division_by_zero(spark)
    p4_math_domain_edges(spark)
    p5_cast_overflow(spark)


if __name__ == "__main__":
    main()
