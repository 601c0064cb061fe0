"""Class-13 probe (r19): NaN equality semantics in GROUP BY / JOIN /
DISTINCT / ORDER BY, Spark vs DuckDB.

IEEE-754 says NaN != NaN, but both engines deliberately deviate for
set-oriented operators; whether they deviate the SAME WAY is exactly
the kind of silent dialect class this audit series enumerates
(class-6 covered special values as OUTPUT cells; this class covers
them as KEYS).

P1 — surface: count NaN/Inf cells in every DOUBLE-typed INPUT column
of every fixture table at both oracle scales (the output side is
already swept to zero every round by the special-value nets).

P2 — probe: crafted NaN/Inf/-0.0 rows through GROUP BY, COUNT
DISTINCT, an inner self-join on the double key, and ORDER BY
placement, in both engines.

Usage: python scripts/probe_nan_semantics.py
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def p1_surface():
    out = {}
    for sf_dir in SF_DIRS:
        con = duckdb.connect()
        hits = {}
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            cols = [
                (r[0], r[1])
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{path}')"
                ).fetchall()
            ]
            for name, typ in cols:
                tl = typ.lower()
                if "double" not in tl and "float" not in tl:
                    continue
                if tl.endswith("[]"):
                    n = con.execute(
                        f'SELECT COUNT(*) FROM read_parquet(\'{path}\') '
                        f'WHERE len(list_filter("{name}", '
                        f"x -> isnan(x) OR isinf(x))) > 0"
                    ).fetchone()[0]
                else:
                    n = con.execute(
                        f'SELECT COUNT(*) FROM read_parquet(\'{path}\') '
                        f'WHERE isnan("{name}") OR isinf("{name}")'
                    ).fetchone()[0]
                if n:
                    hits[f"{t}.{name}"] = n
        out[os.path.basename(sf_dir)] = hits
        con.close()
    return out


def p2_probe():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    nan = float("nan")
    rows = [(nan, 1), (nan, 2), (float("inf"), 3), (-0.0, 4), (0.0, 5), (1.5, 6)]

    sdf = spark.createDataFrame(rows, "k DOUBLE, v INT")
    sdf.createOrReplaceTempView("probe")
    con.execute(
        "CREATE TABLE probe AS SELECT * FROM (VALUES "
        + ", ".join(
            f"(CAST('{'nan' if math.isnan(k) else k}' AS DOUBLE), {v})"
            for k, v in rows
        )
        + ") t(k, v)"
    )

    def canon_groups(pairs):
        return sorted(
            ("NaN" if (isinstance(k, float) and math.isnan(k)) else repr(k), n)
            for k, n in pairs
        )

    s_groups = canon_groups(
        [(r["k"], r["n"]) for r in spark.sql(
            "SELECT k, COUNT(*) AS n FROM probe GROUP BY k"
        ).collect()]
    )
    d_groups = canon_groups(
        con.execute("SELECT k, COUNT(*) FROM probe GROUP BY k").fetchall()
    )
    s_distinct = spark.sql("SELECT COUNT(DISTINCT k) AS n FROM probe").collect()[0]["n"]
    d_distinct = con.execute("SELECT COUNT(DISTINCT k) FROM probe").fetchone()[0]
    # inner self-join on the double key: do the two NaN rows match each
    # other (4 NaN pairs) or not at all?
    s_join = spark.sql(
        "SELECT COUNT(*) AS n FROM probe a JOIN probe b ON a.k = b.k"
    ).collect()[0]["n"]
    d_join = con.execute(
        "SELECT COUNT(*) FROM probe a JOIN probe b ON a.k = b.k"
    ).fetchone()[0]
    # plain equality predicate (WHERE k = k): does NaN survive?
    s_eq = spark.sql("SELECT COUNT(*) AS n FROM probe WHERE k = k").collect()[0]["n"]
    d_eq = con.execute("SELECT COUNT(*) FROM probe WHERE k = k").fetchone()[0]
    # ORDER BY placement of NaN among Inf and finite values
    s_order = [
        "NaN" if math.isnan(r["k"]) else repr(r["k"])
        for r in spark.sql("SELECT k FROM probe ORDER BY k").collect()
    ]
    d_order = [
        "NaN" if math.isnan(k) else repr(k)
        for (k,) in con.execute("SELECT k FROM probe ORDER BY k").fetchall()
    ]
    return {
        "group_by": {"spark": s_groups, "duckdb": d_groups,
                     "agree": s_groups == d_groups},
        "count_distinct": {"spark": s_distinct, "duckdb": d_distinct,
                           "agree": s_distinct == d_distinct},
        "self_join_rows": {"spark": s_join, "duckdb": d_join,
                           "agree": s_join == d_join},
        "where_k_eq_k_rows": {"spark": s_eq, "duckdb": d_eq,
                              "agree": s_eq == d_eq},
        "order_by": {"spark": s_order, "duckdb": d_order,
                     "agree": s_order == d_order},
    }


def main() -> int:
    surface = p1_surface()
    probe = p2_probe()
    print(json.dumps({"p1_input_surface": surface, "p2_probe": probe},
                     indent=2, default=str))
    disagreements = [k for k, v in probe.items() if not v["agree"]]
    print("DISAGREEMENTS:", disagreements)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
