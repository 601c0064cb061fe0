"""Class-12(b) probe (r19, VERDICT r18 task 5): string->number CAST
whitespace/sign/format dialect, Spark vs DuckDB.

P1 (measured in SURVEY §2.64): every string->number cast in the
registry operates on engine-generated clean decimal digit strings —
q_fn_try's digits_or_junk is `str(custkey)` or `'x'+str(custkey)`,
the edgelist readers TRY_CAST fields the engine itself wrote, and
q_read_csv TRY_CASTs TPC-H-derived fields. No whitespace, signs,
exponents, fractional forms, or non-ASCII digits reach any cast at
any fixture scale, so this dialect class has ZERO live surface today.

P2 (this script): probe TRY_CAST of a crafted edge grid to BIGINT and
DOUBLE in both engines and print the agreement map, so the rules are
measured rather than assumed, and any FUTURE oracle that casts user
strings starts from a pinned contract
(tests/test_dialect.py::test_string_to_number_cast_dialect).

Usage: python scripts/probe_cast_dialect.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import duckdb

GRID = [
    "42", " 42", "42 ", "  42  ", "\t42", "42\n", "+42", "-42",
    "+ 42", "- 42", "4 2", "", " ", "1e3", "1E3", "1e-2", ".5",
    "5.", "+.5", "-0", "0x1A", "42.7", "-42.7", "42.",
    "9223372036854775807", "9223372036854775808", "NaN", "Infinity",
    "-Infinity", "inf", "١٢٣",
]


def spark_map(spark, typ):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in GRID], "s STRING")
    rows = df.select("s", F.col("s").try_cast(typ).alias("v")).collect()
    return {r["s"]: r["v"] for r in rows}


def duck_map(con, typ):
    out = {}
    for s in GRID:
        out[s] = con.execute(
            "SELECT TRY_CAST(? AS " + typ + ")", [s]
        ).fetchone()[0]
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    report = {}
    for styp, dtyp in (("long", "BIGINT"), ("double", "DOUBLE")):
        sm = spark_map(spark, styp)
        dm = duck_map(con, dtyp)
        cells = {}
        for s in GRID:
            a, b = sm[s], dm[s]
            agree = (a == b) or (
                isinstance(a, float)
                and isinstance(b, float)
                and a != a
                and b != b
            )
            cells[repr(s)] = {
                "spark": a,
                "duckdb": b,
                "agree": agree,
            }
        report[dtyp] = cells
    print(json.dumps(report, indent=2, default=str))
    div = {
        t: [s for s, c in cells.items() if not c["agree"]]
        for t, cells in report.items()
    }
    print("DIVERGENT:", json.dumps(div, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
