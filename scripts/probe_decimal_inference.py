"""Class-9 probe: DECIMAL precision/scale inference dialect (r18).

Measurement first (the §2.55 rule). The registry's decimal surface,
scanned this session:

- 68 Spark-side ``decimal(p,s)`` casts / 176 DuckDB-side ``DECIMAL``
  casts — all the documented money convention (sum/round in the
  decimal domain, fold to DOUBLE at the output boundary; r13 type
  guard rejects decimal-typed OUTPUT columns).
- Every division site (6 total, grep receipt in SURVEY §2.59) casts
  to double BEFORE dividing — the decimal domain never sees ``/``.
- The decimal domain DOES see: CAST, ``1 ± d``, ``d * d`` chains up
  to three factors (TPC-H revenue: price * (1-disc) * (1+tax)),
  ``d3,2 * d12,2`` (Q14/Q17 shapes), SUM, ROUND(·, 2..6).

So the class is NOT zero-surface: multiplication chains exercise both
engines' result-type INFERENCE (Spark caps precision at 38 and may
reduce scale; DuckDB widens differently). The value risk: an inferred
scale BELOW the exact product scale would silently round one engine's
intermediate. This probe measures, for each registry-exercised shape:

  1. the inferred result type in each engine,
  2. that the inferred scale >= the exact product scale (no silent
     rounding is POSSIBLE), and
  3. bit-equality of the folded double outputs on crafted boundary
     values (max-precision money, extreme discount/tax).

Findings are pinned in tests/test_dialect.py::test_decimal_inference_rules.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from louvain_modularity_spark.session import get_spark  # noqa: E402

# crafted rows: (price, disc, tax) — max decimal(12,2) money, extreme
# and midpoint-ish rates with full 2-decimal precision
ROWS = [
    (9999999999.99, 0.99, 0.99),
    (9999999999.99, 0.00, 0.00),
    (0.01, 0.01, 0.01),
    (12345678.91, 0.07, 0.08),
    (98765.43, 0.10, 0.06),
    (0.05, 0.55, 0.45),  # .xx5-adjacent products
]

SHAPES = {
    # name -> (spark expr builder over cols p/d/t, duckdb expr)
    "one_minus": (
        lambda: F.lit(1) - F.col("d"),
        "1 - d",
    ),
    "mul2": (
        lambda: F.col("p") * (F.lit(1) - F.col("d")),
        "p * (1 - d)",
    ),
    "mul3": (
        lambda: F.col("p") * (F.lit(1) - F.col("d")) * (F.lit(1) + F.col("t")),
        "p * (1 - d) * (1 + t)",
    ),
    "small_mul": (
        lambda: F.lit("0.5").cast("decimal(3,2)") * F.col("p"),
        "CAST('0.5' AS DECIMAL(3,2)) * p",
    ),
}


def main() -> int:
    spark = get_spark("probe-decimal")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE r AS SELECT CAST(c0 AS DECIMAL(12,2)) p, "
        "CAST(c1 AS DECIMAL(12,2)) d, CAST(c2 AS DECIMAL(12,2)) t "
        "FROM (VALUES " + ",".join(f"({p},{d},{t})" for p, d, t in ROWS) + ") v(c0,c1,c2)"
    )
    sdf = spark.createDataFrame(
        [(str(p), str(d), str(t)) for p, d, t in ROWS], "p0 string, d0 string, t0 string"
    ).select(
        F.col("p0").cast("decimal(12,2)").alias("p"),
        F.col("d0").cast("decimal(12,2)").alias("d"),
        F.col("t0").cast("decimal(12,2)").alias("t"),
    )

    failures = []
    print(f"{'shape':<10} {'spark type':<16} {'duckdb type':<16} exact-scale values")
    for name, (sx, dx) in SHAPES.items():
        s_col = sx().alias("x")
        s_type = str(sdf.select(s_col).schema["x"].dataType)
        d_type = con.execute(f"SELECT typeof({dx}) FROM r LIMIT 1").fetchone()[0]
        # exact product scale for each shape (sum of factor scales)
        need = {"one_minus": 2, "mul2": 4, "mul3": 6, "small_mul": 4}[name]
        s_scale = int(s_type.rstrip(")").split(",")[-1])
        d_scale = int(d_type.rstrip(")").split(",")[-1])
        scale_ok = s_scale >= need and d_scale >= need
        # value check: per-row folded doubles + the summed/rounded fold
        s_vals = [
            r["v"]
            for r in sdf.select(s_col.cast("double").alias("v"))
            .orderBy("v")
            .collect()
        ]
        d_vals = [
            r[0]
            for r in con.execute(
                f"SELECT CAST(({dx}) AS DOUBLE) v FROM r ORDER BY v"
            ).fetchall()
        ]
        vals_ok = s_vals == d_vals
        s_sum = sdf.select(
            F.round(F.sum(sx()), 2).cast("double").alias("v")
        ).collect()[0]["v"]
        d_sum = con.execute(
            f"SELECT CAST(ROUND(SUM({dx}), 2) AS DOUBLE) FROM r"
        ).fetchone()[0]
        sum_ok = s_sum == d_sum
        ok = scale_ok and vals_ok and sum_ok
        print(
            f"{name:<10} {s_type:<16} {d_type:<16} "
            f"scale>={need}:{'OK' if scale_ok else 'FAIL'} "
            f"vals:{'OK' if vals_ok else 'FAIL'} "
            f"sum+round:{'OK' if sum_ok else 'FAIL'}"
        )
        if not ok:
            failures.append(
                f"{name}: spark={s_type} duckdb={d_type} "
                f"s_vals={s_vals} d_vals={d_vals} s_sum={s_sum} d_sum={d_sum}"
            )
    if failures:
        print("FINDINGS:")
        for f_ in failures:
            print(" ", f_)
        return 1
    print("all shapes agree: inference never truncates below the exact "
          "scale; folded doubles bit-equal on crafted boundary rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
