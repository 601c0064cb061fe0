"""Round-17 boundary audit, class 5: date/time dialect.

Fifth installment of the per-round oracle-semantics audit (r13/r14:
stream event-time boundaries; r15: batch NULL-sort / asof / quantile
bits; r16: regex/locale/split + JSON-path/URL-parse; SURVEY §2.49,
§2.51). This class covers every oracle whose value path crosses a
DATE/TIME CONVENTION boundary between Spark (Java/Proleptic-Gregorian
datetime kernels) and DuckDB (its own date arithmetic):

- q_fn_date         weekday vs isodow-1, date_trunc('month'),
                    date_add(+30), datediff, last_day,
                    add_months(+2) vs + INTERVAL 2 MONTH (funcs.py)
- the datediff('day', anchor, d) family — q_rfm_scores, q_autocorr,
  q_bollinger, q_seasonal_decompose, q_holt_winters, q_theilsen,
  q_changepoint et al. (datasci.py / tsml.py): sign + day-boundary
  conventions on DATE columns
- TPC-H INTERVAL arithmetic — q_tpch_q21's
  ``l_shipdate > o_orderdate + INTERVAL 60 DAY`` (tpch.py): result
  TYPE of date+interval and the exact-boundary comparison
- the ns→µs event-time path — sources.ts_us_expr's ``ts div 1000``
  (nanos-as-long encoding) vs DuckDB ``epoch_us(ts)`` on
  TIMESTAMP_NS parquet: truncation DIRECTION for pre-1970 and
  sub-µs-aligned nanos
- date_trunc('week') / weekofyear ISO conventions — not load-bearing
  in any oracle TODAY (only 'month'/'hour' are used) but probed and
  pinned so a future week-grain oracle starts calibrated

Method (same as the prior classes):
  1. MEASURE whether the fixtures exercise each edge (P1) — an oracle
     can be green on luck if the edge never occurs in the data;
  2. PROBE both engines at crafted boundary points (P2-P5) and print
     AGREE/DISAGREE per case;
  3. pin discovered rules / scope guards in tests/test_dialect.py so
     an engine upgrade fails a named test loudly instead of flaking
     a driver hash.

Run:  python scripts/probe_datetime_dialect.py
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Row  # noqa: E402

from louvain_modularity_spark.session import get_spark  # noqa: E402

SCALES = ["sf0.001", "sf0.01", "sf0.1"]


def p1_fixture_exercise() -> None:
    """Do the fixtures ever reach the date-dialect edges? (DuckDB.)"""
    print("== P1: fixture exercise measurement")
    con = duckdb.connect()
    for sf in SCALES:
        d = f"/root/testdata/{sf}"
        o = con.sql(
            f"""
            SELECT COUNT(*) AS orders,
                   MIN(o_orderdate) AS min_d, MAX(o_orderdate) AS max_d,
                   SUM(CASE WHEN day(o_orderdate) >= 29 THEN 1 ELSE 0 END) AS d29plus,
                   -- plus2m clamp occurred iff the day-of-month changed
                   SUM(CASE WHEN day(o_orderdate)
                            != day(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH)
                            THEN 1 ELSE 0 END) AS plus2m_clamped,
                   SUM(CASE WHEN month(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH) = 2
                             AND day(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH) = 29
                            THEN 1 ELSE 0 END) AS plus2m_leap29,
                   COUNT(DISTINCT isodow(o_orderdate)) AS distinct_dows
            FROM read_parquet('{d}/orders.parquet')
            """
        ).fetchone()
        li = con.sql(
            f"""
            SELECT SUM(CASE WHEN CAST(l.l_shipdate AS DATE)
                            = CAST(o.o_orderdate AS DATE) + 60 THEN 1 ELSE 0 END)
                     AS ship_eq_order_plus60
            FROM read_parquet('{d}/lineitem.parquet') l
            JOIN read_parquet('{d}/orders.parquet') o ON l.l_orderkey = o.o_orderkey
            """
        ).fetchone()
        ev = con.sql(
            f"""
            SELECT MIN(ts) AS min_ts, MAX(ts) AS max_ts,
                   SUM(CASE WHEN epoch_ns(ts) % 1000 != 0 THEN 1 ELSE 0 END)
                     AS sub_us_nanos,
                   SUM(CASE WHEN epoch_ns(ts) < 0 THEN 1 ELSE 0 END) AS pre_1970
            FROM read_parquet('{d}/events.parquet')
            """
        ).fetchone()
        print(f"  {sf}: orders {dict(zip('n min max d29plus plus2m_clamped plus2m_leap29 dows'.split(), o))}")
        print(f"  {sf}: lineitem ship_eq_order_plus60={li[0]}")
        print(f"  {sf}: events   min={ev[0]} max={ev[1]} sub_us_nanos={ev[2]} pre_1970={ev[3]}")


# month-arithmetic boundary points: (date, months-to-add)
MONTH_CASES = [
    ("2020-01-31", 1),   # into leap Feb → clamp to 29
    ("2019-01-31", 1),   # into plain Feb → clamp to 28
    ("2020-02-29", 12),  # leap day + 1y → clamp to 2021-02-28
    ("2019-02-28", 1),   # month-END source: stickiness would give Mar 31
    ("2019-03-31", 1),   # 31 → 30-day month clamp
    ("2019-12-31", 2),   # year rollover + clamp into Feb
    ("2020-08-31", 6),   # 31 → plain Feb across year boundary
    ("2019-01-29", 1),   # 29 → plain Feb clamp
    ("2019-01-30", 1),   # 30 → plain Feb clamp
    ("2019-06-15", 1),   # mid-month control: no clamp
    ("2020-01-31", -2),  # negative months, clamp into Nov 30
    ("2020-03-31", -1),  # negative into leap Feb
]

LAST_DAY_CASES = ["2020-02-01", "2019-02-15", "2020-12-31", "2021-04-30"]


def p2_month_arithmetic(spark) -> None:
    """add_months / last_day vs DuckDB + INTERVAL n MONTH / last_day:
    end-of-month clamping, leap handling, no-stickiness, negatives."""
    print("== P2: month arithmetic (add_months vs + INTERVAL MONTH)")
    con = duckdb.connect()
    rows = [Row(i=i, d=datetime.date.fromisoformat(d), m=m)
            for i, (d, m) in enumerate(MONTH_CASES)]
    got = {
        r["i"]: r["out"]
        for r in spark.createDataFrame(rows)
        .select("i", F.add_months("d", F.col("m")).alias("out"))
        .collect()
    }
    for i, (d, m) in enumerate(MONTH_CASES):
        # (m) * INTERVAL 1 MONTH — DuckDB's parser rejects a negative
        # literal directly before the unit keyword
        dd = con.execute(
            f"SELECT CAST(DATE '{d}' + ({m}) * INTERVAL 1 MONTH AS DATE)"
        ).fetchone()[0]
        verdict = "AGREE" if got[i] == dd else "DISAGREE"
        print(f"  {verdict}: {d} {m:+d}mo -> spark={got[i]} duckdb={dd}")
    rows = [Row(i=i, d=datetime.date.fromisoformat(d))
            for i, d in enumerate(LAST_DAY_CASES)]
    got = {
        r["i"]: r["out"]
        for r in spark.createDataFrame(rows)
        .select("i", F.last_day("d").alias("out"))
        .collect()
    }
    for i, d in enumerate(LAST_DAY_CASES):
        dd = con.execute(f"SELECT last_day(DATE '{d}')").fetchone()[0]
        verdict = "AGREE" if got[i] == dd else "DISAGREE"
        print(f"  {verdict}: last_day({d}) -> spark={got[i]} duckdb={dd}")


# a full Mon..Sun cycle plus ISO-week year-boundary landmines
WEEK_CASES = [
    "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
    "2024-01-05", "2024-01-06", "2024-01-07",       # Mon..Sun
    "2021-01-01",  # Fri of ISO week 53 of 2020
    "2020-12-31",  # Thu of ISO week 53 of 2020
    "2024-12-30",  # Mon of ISO week 1 of 2025
    "2016-01-03",  # Sun of ISO week 53 of 2015
    "2015-12-28",  # Mon of ISO week 53 of 2015
]


def p3_week_conventions(spark) -> None:
    """weekday numbering, date_trunc('week') start day, weekofyear ISO
    numbering at year boundaries."""
    print("== P3: weekday / week-trunc / weekofyear conventions")
    con = duckdb.connect()
    rows = [Row(i=i, d=datetime.date.fromisoformat(d))
            for i, d in enumerate(WEEK_CASES)]
    got = {
        r["i"]: (r["wd"], r["dow"], r["wk_start"], r["woy"])
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            F.weekday("d").alias("wd"),
            F.dayofweek("d").alias("dow"),
            F.date_trunc("week", "d").cast("date").alias("wk_start"),
            F.weekofyear("d").alias("woy"),
        )
        .collect()
    }
    for i, d in enumerate(WEEK_CASES):
        dd = con.execute(
            f"""SELECT CAST(isodow(DATE '{d}') - 1 AS INT),
                       CAST(dayofweek(DATE '{d}') + 1 AS INT),
                       CAST(date_trunc('week', DATE '{d}') AS DATE),
                       CAST(weekofyear(DATE '{d}') AS INT)"""
        ).fetchone()
        verdict = "AGREE" if got[i] == tuple(dd) else "DISAGREE"
        print(f"  {verdict}: {d} spark(wd,dow,wk_start,woy)={got[i]} duckdb={tuple(dd)}")


DIFF_CASES = [
    ("2020-01-01", "2020-01-01"),   # zero span
    ("2020-01-01", "2020-03-01"),   # positive across leap Feb
    ("2020-03-01", "2020-01-01"),   # negative
    ("1999-12-31", "2000-01-01"),   # century boundary
]

INTERVAL_DAY_OFFSETS = [59, 60, 61]


def p4_datediff_and_interval_day(spark) -> None:
    """datediff argument order/sign; date + INTERVAL DAY result type
    and the exact-boundary comparison TPC-H q21 depends on."""
    print("== P4: datediff sign + date + INTERVAL DAY boundary")
    con = duckdb.connect()
    rows = [Row(i=i, a=datetime.date.fromisoformat(a), b=datetime.date.fromisoformat(b))
            for i, (a, b) in enumerate(DIFF_CASES)]
    got = {
        r["i"]: r["dd"]
        for r in spark.createDataFrame(rows)
        .select("i", F.datediff("b", "a").alias("dd"))
        .collect()
    }
    for i, (a, b) in enumerate(DIFF_CASES):
        dd = con.execute(
            f"SELECT CAST(datediff('day', DATE '{a}', DATE '{b}') AS INT)"
        ).fetchone()[0]
        verdict = "AGREE" if got[i] == dd else "DISAGREE"
        print(f"  {verdict}: datediff({a} -> {b}) spark={got[i]} duckdb={dd}")
    # q21 shape: ship > order + INTERVAL 60 DAY, ship = order + 59/60/61
    base = datetime.date(2020, 1, 1)
    rows = [Row(i=i, o=base, s=base + datetime.timedelta(days=k))
            for i, k in enumerate(INTERVAL_DAY_OFFSETS)]
    got = {
        r["i"]: r["gt"]
        for r in spark.createDataFrame(rows)
        .select("i", (F.col("s") > F.expr("o + INTERVAL 60 DAY")).alias("gt"))
        .collect()
    }
    for i, k in enumerate(INTERVAL_DAY_OFFSETS):
        dd = con.execute(
            f"""SELECT DATE '2020-01-01' + {k}
                       > DATE '2020-01-01' + INTERVAL 60 DAY"""
        ).fetchone()[0]
        verdict = "AGREE" if got[i] == dd else "DISAGREE"
        print(f"  {verdict}: (order+{k}d) > order+INTERVAL 60 DAY spark={got[i]} duckdb={dd}")
    st = con.execute(
        "SELECT typeof(DATE '2020-01-01' + INTERVAL 60 DAY)"
    ).fetchone()[0]
    print(f"  note: duckdb typeof(date + INTERVAL DAY) = {st} "
          "(midnight-aligned, so the date comparison above is exact)")


# crafted epoch-nanos: µs-aligned, sub-µs positive, sub-µs negative,
# exactly ±1 ns around zero, and a pre-1970 µs-aligned instant
NANOS_CASES = [0, 1, 999, 1000, 1500, -1, -999, -1000, -1500,
               1_000_000_001, -86_400_000_000_000]


def p5_ns_to_us_truncation(spark) -> None:
    """The events ts path: Spark reads TIMESTAMP(NANOS) parquet as
    long under nanosAsLong and sources.ts_us_expr computes
    ``ts div 1000``; DuckDB reads the same file as TIMESTAMP_NS and
    oracles use epoch_us(ts). Compare both on a crafted file whose
    nanos include pre-1970 and sub-µs-aligned values — the edges the
    generated fixtures never exercise (P1)."""
    print("== P5: ns->us truncation direction (crafted TIMESTAMP_NS parquet)")
    tbl = pa.table({
        "i": pa.array(range(len(NANOS_CASES)), pa.int32()),
        "ts": pa.array(NANOS_CASES, pa.timestamp("ns")),
    })
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ns_probe.parquet")
        pq.write_table(tbl, path)
        sdf = spark.read.parquet(path)
        ts_type = str(sdf.schema["ts"].dataType)
        got = {
            r["i"]: r["us"]
            for r in sdf.select("i", F.expr("ts div 1000").alias("us")).collect()
        }
        con = duckdb.connect()
        duck = dict(con.execute(
            f"SELECT i, CAST(epoch_us(ts) AS BIGINT) FROM read_parquet('{path}') ORDER BY i"
        ).fetchall())
        print(f"  spark physical type under nanosAsLong: {ts_type}")
        for i, ns in enumerate(NANOS_CASES):
            verdict = "AGREE" if got[i] == duck[i] else "DISAGREE"
            print(f"  {verdict}: ns={ns} spark(ts div 1000)={got[i]} duckdb(epoch_us)={duck[i]}")


def main() -> None:
    p1_fixture_exercise()
    spark = get_spark()
    p2_month_arithmetic(spark)
    p3_week_conventions(spark)
    p4_datediff_and_interval_day(spark)
    p5_ns_to_us_truncation(spark)


if __name__ == "__main__":
    main()
