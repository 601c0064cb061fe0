"""Registry-wide vacuity audit (r8 verdict task 3).

A hash-green CORRECTNESS row proves Spark == DuckDB, but an oracle
that returns ZERO rows (or one all-degenerate row) is green vacuously:
empty-vs-empty matches by construction and verifies nothing about the
operator (the q_grid_join lesson — its pre-r8 radius produced no
neighbor pairs at small SF and the hash match was empty-vs-empty).

This sweep runs every DuckDB oracle at sf0.001 AND sf0.01 and flags:
  - zero rows at a scale, or
  - exactly one row whose every cell is degenerate (NULL / 0 / "" /
    NaN / empty list) — a constant a broken query could also emit, or
  - two or more rows that are ALL identical — a result with no
    per-key variation verifies almost nothing about the operator
    (registry-wide scan before adding this detector: zero hits, so it
    landed with an empty adjudication list).

Findings must either be fixed or adjudicated below with a reason the
emptiness is CORRECT for that fixture (e.g. a data-quality gate that
genuinely passes everything at tiny SF). Unadjudicated findings exit
nonzero so CI-style runs fail loudly.

Usage: python scripts/vacuity_sweep.py [--json out.json]
Runtime: DuckDB only (no Spark session) — ~20 s for 285 oracles x 2
scales.
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_check import duckdb_con  # noqa: E402

from louvain_modularity_spark.registry import all_oracles  # noqa: E402

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
}

# Adjudicated findings: query -> reason the flagged shape is the
# CORRECT answer for that fixture, verified by hand (each entry names
# the evidence). Only listed names may stay flagged without failing
# the sweep.
ADJUDICATED: dict[str, str] = {
    # (empty until the first sweep run surfaces candidates)
}


def _degenerate(v) -> bool:
    if v is None:
        return True
    if isinstance(v, float):
        return math.isnan(v) or v == 0.0
    if isinstance(v, (int, bool)):
        return v in (0, False)
    if isinstance(v, str):
        return v == ""
    if isinstance(v, (list, tuple)):
        return len(v) == 0
    return False


def _self_check(con) -> None:
    """Canary: the detector must flag a known-empty and a known-
    degenerate result, or the whole sweep could pass vacuously."""
    assert con.execute("SELECT 1 WHERE false").fetchall() == []
    row = con.execute("SELECT NULL, 0, '', CAST('nan' AS DOUBLE)").fetchall()[0]
    assert all(_degenerate(c) for c in row)
    ok = con.execute("SELECT 42, 'x'").fetchall()[0]
    assert not all(_degenerate(c) for c in ok)
    dup = con.execute("SELECT 7 FROM range(3)").fetchall()
    assert len(dup) >= 2 and len({repr(r) for r in dup}) == 1


def sweep() -> dict:
    oracles = all_oracles()
    findings: list[dict] = []
    counts: dict[str, dict[str, int]] = {}
    for sf_name, sf_dir in SF_DIRS.items():
        con = duckdb_con(sf_dir)
        _self_check(con)
        for name, sql in sorted(oracles.items()):
            try:
                rows = con.execute(sql).fetchall()
            except Exception as exc:  # an oracle that errors is worse than vacuous
                findings.append(
                    {"query": name, "sf": sf_name, "kind": "error", "detail": str(exc)[:200]}
                )
                continue
            counts.setdefault(name, {})[sf_name] = len(rows)
            if len(rows) == 0:
                findings.append({"query": name, "sf": sf_name, "kind": "zero_rows"})
            elif len(rows) == 1 and all(_degenerate(c) for c in rows[0]):
                findings.append(
                    {
                        "query": name,
                        "sf": sf_name,
                        "kind": "one_degenerate_row",
                        "detail": repr(rows[0])[:200],
                    }
                )
            elif len(rows) >= 2 and len({repr(r) for r in rows}) == 1:
                findings.append(
                    {
                        "query": name,
                        "sf": sf_name,
                        "kind": "identical_rows",
                        "detail": f"{len(rows)} copies of {rows[0]!r}"[:200],
                    }
                )
        con.close()
    unadjudicated = [f for f in findings if f["query"] not in ADJUDICATED]
    return {
        "oracles_swept": len(oracles),
        "scales": list(SF_DIRS),
        "findings": findings,
        "adjudicated": ADJUDICATED,
        "unadjudicated": unadjudicated,
    }


def main() -> int:
    report = sweep()
    out = None
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as fh:
            json.dump(report, fh, indent=2)
    print(
        f"swept {report['oracles_swept']} oracles x {len(report['scales'])} scales: "
        f"{len(report['findings'])} findings, "
        f"{len(report['unadjudicated'])} unadjudicated"
    )
    for f in report["findings"]:
        tag = "ADJUDICATED" if f["query"] in ADJUDICATED else "UNADJUDICATED"
        print(f"  [{tag}] {f['query']} @ {f['sf']}: {f['kind']} {f.get('detail', '')}")
    return 1 if report["unadjudicated"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
