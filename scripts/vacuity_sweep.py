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
    landed with an empty adjudication list), or
  - (r16) a COLUMN whose every value is degenerate at EVERY swept
    scale — a branch the hash check never exercises (the q_pii_scrub
    lesson: events.props carry zero emails at all scales, so its
    n_emails/email-replace branch was vacuously green from r10 to
    r16). Columns that vary at either scale are exercised and not
    flagged. Adjudicated entries live in ADJUDICATED_COLUMNS and must
    name the crafted-input pin (or the reason the constant is the
    point).

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

# Adjudicated degenerate COLUMNS (r16 detector): "query.column" -> why
# the all-degenerate column is correct AND where the branch is pinned
# non-vacuously. Only listed entries may stay flagged without failing
# the sweep.
ADJUDICATED_COLUMNS: dict[str, str] = {
    "q_pii_scrub.n_emails": (
        "fixture props carry zero email-shaped substrings at all scales "
        "(probe_regex_dialect.py P1); branch pinned on crafted input by "
        "tests/test_dialect.py::test_pii_scrub_email_branch_not_vacuous"
    ),
    "q_udf_pandas.diff": (
        "all-zero IS the assertion: diff = |pandas-UDF norm - builtin "
        "norm| and the oracle hardcodes 0.0, so any UDF/builtin "
        "divergence hash-fails; tests/test_llm_ops.py asserts it too"
    ),
    "q_expectations.violations": (
        "the fixture genuinely passes all five quality gates; the "
        "violation-counting branch is pinned on crafted input by "
        "tests/test_analytics.py::test_expectations_violation_branch"
    ),
    "q_one_hot.seg_other": (
        "every fixture segment belongs to the fixed one-hot domain; "
        "the out-of-domain bucket is pinned on crafted input by "
        "tests/test_llm_ops.py::test_one_hot_other_branch"
    ),
    "q_profile_columns.n_nulls": (
        "the profiled events columns have no NULLs in the fixture; the "
        "null-counting branch is pinned on crafted input by "
        "tests/test_analytics.py::test_profile_null_branch"
    ),
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


def _special_cells_in(v) -> int:
    """Recursive NaN/Inf/-0.0 cell counter — the DuckDB-side twin of
    determinism_sweep._special_cells_in. Recurses into list/tuple
    (DuckDB arrays) and dict (DuckDB structs/maps) so a composite-typed
    oracle output cannot bypass the net silently (r18, ADVICE item 3;
    the class-7 audit measured zero composite output columns today)."""
    if isinstance(v, float):
        return int(
            math.isnan(v)
            or math.isinf(v)
            or (v == 0.0 and math.copysign(1.0, v) < 0)
        )
    if isinstance(v, (list, tuple)):
        return sum(_special_cells_in(x) for x in v)
    if isinstance(v, dict):
        # keys AND values (r19, ADVICE item 1): a float-keyed map
        # must not bypass the net through the key position
        return sum(_special_cells_in(x) for kv in v.items() for x in kv)
    return 0


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
    # "query.column" -> set of scales where the column was all-degenerate
    # over a >=2-row result; flagged only when that's EVERY swept scale
    degen_cols: dict[str, set[str]] = {}
    col_seen: dict[str, set[str]] = {}
    for sf_name, sf_dir in SF_DIRS.items():
        con = duckdb_con(sf_dir)
        _self_check(con)
        for name, sql in sorted(oracles.items()):
            try:
                cur = con.execute(sql)
                colnames = [c[0] for c in cur.description]
                rows = cur.fetchall()
            except Exception as exc:  # an oracle that errors is worse than vacuous
                findings.append(
                    {"query": name, "sf": sf_name, "kind": "error", "detail": str(exc)[:200]}
                )
                continue
            counts.setdefault(name, {})[sf_name] = len(rows)
            # r17 class-6 standing net: a NaN / Inf / -0.0 cell in an
            # oracle output crosses the special-value dialect boundary
            # (Spark and DuckDB diverge SILENTLY on round-to-zero sign;
            # see scripts/probe_float_edges.py + SURVEY §2.54). Zero
            # occurrences measured r17; any future appearance is a
            # finding, not a hash flake to diagnose after the fact.
            for j, col in enumerate(colnames):
                special = sum(_special_cells_in(r[j]) for r in rows)
                if special:
                    findings.append(
                        {
                            "query": name,
                            "column": f"{name}.{col}",
                            "sf": sf_name,
                            "kind": "special_value_cell",
                            "detail": f"{special} NaN/Inf/-0.0 cells",
                        }
                    )
            if len(rows) >= 2:
                for j, col in enumerate(colnames):
                    key = f"{name}.{col}"
                    col_seen.setdefault(key, set()).add(sf_name)
                    if all(_degenerate(r[j]) for r in rows):
                        degen_cols.setdefault(key, set()).add(sf_name)
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
    # Flag only columns all-degenerate at EVERY swept scale (a column
    # that varies at either scale is exercised). A column seen (>=2
    # rows) at only ONE scale and degenerate there would slip through
    # the all-scales condition, so that blind spot is re-surfaced as a
    # distinct low-priority finding on every run (r16 measured zero
    # such columns; the partial_scale_coverage kind keeps that a live
    # measurement instead of a snapshot).
    for key, scales in sorted(degen_cols.items()):
        seen = col_seen.get(key, set())
        if scales == seen == set(SF_DIRS):
            findings.append(
                {
                    "query": key.split(".", 1)[0],
                    "column": key,
                    "sf": "all",
                    "kind": "degenerate_column",
                }
            )
        elif scales == seen and set() < seen < set(SF_DIRS):
            findings.append(
                {
                    "query": key.split(".", 1)[0],
                    "column": key,
                    "sf": ",".join(sorted(seen)),
                    "kind": "partial_scale_coverage",
                    "detail": "degenerate at every scale where the "
                    "column produced >=2 rows, but not seen at all "
                    "swept scales — the all-scales detector cannot "
                    "rule on it",
                }
            )
    # Adjudication is matched to the finding KIND: column-level
    # findings (degenerate_column / partial_scale_coverage) suppress
    # only via ADJUDICATED_COLUMNS; query-level findings only via
    # ADJUDICATED — so a future query-level entry cannot silently
    # swallow that query's column findings (or vice versa).
    unadjudicated = [
        f
        for f in findings
        if (
            f.get("column") not in ADJUDICATED_COLUMNS
            if f["kind"]
            in ("degenerate_column", "partial_scale_coverage", "special_value_cell")
            else f["query"] not in ADJUDICATED
        )
    ]
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
    # Tag by membership in the kind-matched unadjudicated list (r18,
    # ADVICE item 2) — the old mixed OR could print [ADJUDICATED] on a
    # finding that still counts as unadjudicated and forces exit 1.
    for f in report["findings"]:
        tag = "UNADJUDICATED" if f in report["unadjudicated"] else "ADJUDICATED"
        what = f.get("column") or f["query"]
        print(f"  [{tag}] {what} @ {f['sf']}: {f['kind']} {f.get('detail', '')}")
    return 1 if report["unadjudicated"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
