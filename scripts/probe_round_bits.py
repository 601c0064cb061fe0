"""ROUND(x, 6) bit-compare probe (r16 verdict, What's-wrong #4).

~100 oracles normalize continuous scores with ROUND(expr, 6) on both
engine sides. Their safety has rested on a written measure-zero
argument (SURVEY §2.51): fixture-derived continuous doubles never land
exactly on a representable decimal midpoint, so the Spark
(BigDecimal HALF_UP) and DuckDB (round-half-away) conventions cannot
diverge on the actual data. This probe upgrades the argument to a
RECEIPT, the same way r15's q_equi_depth_hist randomized bit-compare
closed the quantile-bits class:

  1. Pull a deterministic sample of ACTUAL fixture-derived continuous
     values — the expression families the ROUND(...,6) inventory
     feeds (ln/sqrt/exp of money columns, discount products, ratios,
     z-score-shaped terms) — from lineitem/orders at sf0.01.
  2. Feed the IDENTICAL float64 payloads to both engines (parameter
     binding / createDataFrame — no string round-trip) and compare
     ROUND(x, 6) results BIT-FOR-BIT (struct.pack '<d').
  3. Separately document the crafted exact-midpoint class where the
     conventions are KNOWN to diverge (the measure-zero set the
     argument excludes — same family as the pinned ROUND(1.005, 2)
     money-convention witness in tests/test_dialect.py).

Run:  python scripts/probe_round_bits.py
"""

from __future__ import annotations

import struct
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from louvain_modularity_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# the expression families the ROUND(...,6) inventory feeds, computed
# over actual fixture rows (hash-sampled for determinism)
SAMPLE_SQL = f"""
WITH li AS (
  SELECT l_extendedprice AS p, l_discount AS d, l_quantity AS q,
         l_orderkey AS k
  FROM read_parquet('{SF_DIR}/lineitem.parquet')
  WHERE hash(l_orderkey * 31 + l_linenumber) % 7 = 0
)
SELECT x FROM (
  SELECT ln(p) AS x FROM li
  UNION ALL SELECT sqrt(p) FROM li
  UNION ALL SELECT exp(d) FROM li
  UNION ALL SELECT p * (1 - d) FROM li
  UNION ALL SELECT q / 7.0 FROM li
  UNION ALL SELECT p / (q + 1) FROM li
  UNION ALL SELECT (p - 30000.0) / 17321.4502 FROM li
  UNION ALL SELECT d * q * ln(p + 1) FROM li
) WHERE x IS NOT NULL AND isfinite(x)
"""

# crafted exact decimal midpoints at the 6th place — the measure-zero
# class the written argument excludes (x*1e6 exactly representable
# .5): document, don't require agreement
MIDPOINT_CASES = [1.0000005, 2.0000015, 0.1250005, -1.0000005]


def bits(v: float) -> str:
    return struct.pack("<d", v).hex()


def main() -> int:
    con = duckdb.connect()
    vals = [r[0] for r in con.execute(SAMPLE_SQL).fetchall()]
    print(f"sampled {len(vals)} actual fixture-derived doubles "
          f"({SF_DIR}, 8 expression families, hash-sampled 1/7)")

    duck = [r[0] for r in con.execute(
        "SELECT round(x, 6) FROM (SELECT unnest(?) AS x)", [vals]
    ).fetchall()]

    spark = get_spark()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i INT, x DOUBLE")
    got = {r["i"]: r["r"] for r in sdf.select("i", F.round("x", 6).alias("r")).collect()}

    mism = [
        (vals[i], got[i], duck[i])
        for i in range(len(vals))
        if bits(got[i]) != bits(duck[i])
    ]
    print(f"actual-value bit-compare: {len(vals) - len(mism)}/{len(vals)} "
          f"bit-identical, {len(mism)} mismatches")
    for v, s, d in mism[:20]:
        print(f"  DISAGREE: x={v!r} ({bits(v)}) spark={s!r} duckdb={d!r}")

    print("crafted exact-midpoint class (documented, agreement NOT expected):")
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(MIDPOINT_CASES)], "i INT, x DOUBLE"
    )
    got = {r["i"]: r["r"] for r in sdf.select("i", F.round("x", 6).alias("r")).collect()}
    for i, v in enumerate(MIDPOINT_CASES):
        d = con.execute("SELECT round(?, 6)", [v]).fetchone()[0]
        verdict = "agree" if bits(got[i]) == bits(d) else "DIVERGE"
        print(f"  {verdict}: x={v!r} spark={got[i]!r} duckdb={d!r} "
              f"(x*1e6 = {v * 1e6!r})")

    return 1 if mism else 0


if __name__ == "__main__":
    raise SystemExit(main())
