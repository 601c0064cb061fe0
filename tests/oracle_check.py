"""Local replica of the driver's DuckDB-oracle comparison.

For a query name: run the Spark DataFrame and the oracle SQL on the
same sf_dir, canonicalize both results (column order by name, row
order by stringified values), and compare cell-by-cell. This is
stricter than any value-hash the driver could use: if this passes,
any order-insensitive hash of the values matches too.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            return _norm_cell(f)
    except Exception:
        pass
    return str(v)


def _canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def compare(spark, query_fn, oracle_sql: str, sf_dir: str, name: str = "?"):
    """Returns (ok, message)."""
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    rel = con.sql(oracle_sql)
    d_cols = list(rel.columns)
    # The driver's value-hash is type-sensitive where this local normalizer
    # is not: DuckDB returns HUGEINT for SUM(INTEGER) and DECIMAL for some
    # arithmetic, and a HUGEINT/DECIMAL column hash-mismatches Spark's
    # BIGINT/DOUBLE even when every value is equal (round-2
    # q_doc_fingerprint failure). Fail loudly here so local parity catches
    # what the driver would.
    bad = [
        f"{c} ({t})"
        for c, t in zip(d_cols, (str(t) for t in rel.types))
        if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()
    ]
    if bad:
        con.close()
        return False, (
            f"{name}: oracle returns driver-hash-unsafe column types {bad}; "
            "CAST to BIGINT/DOUBLE in the oracle SQL"
        )
    d_rows = rel.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    _, s_canon = _canon(s_cols, s_rows)
    _, d_canon = _canon(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        if a != b:
            return (
                False,
                f"{name}: first diff at sorted row {i}:\n  spark : {a}\n  duckdb: {b}",
            )
    return True, f"{name}: OK ({len(s_rows)} rows, {len(s_cols)} cols)"
