"""The registry-wide vacuity audit as a permanent gate (r8 verdict
task 3): every DuckDB oracle must return a non-vacuous result at both
test scales, so a hash-green CORRECTNESS row can never again be an
empty-vs-empty match (the pre-r8 q_grid_join failure mode). DuckDB
only — no Spark session — ~13 s for 285 oracles x 2 scales."""

import importlib.util


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "vacuity_sweep", "/root/repo/scripts/vacuity_sweep.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_oracle_is_vacuous_at_either_scale():
    mod = _load_sweep()
    report = mod.sweep()
    assert report["oracles_swept"] > 250
    assert report["unadjudicated"] == [], (
        "vacuous oracle results (fix the query/fixture or adjudicate "
        f"in scripts/vacuity_sweep.py): {report['unadjudicated']}"
    )


def test_degenerate_detector_flags_known_shapes():
    mod = _load_sweep()
    assert all(map(mod._degenerate, [None, 0, 0.0, False, "", [], float("nan")]))
    assert not any(map(mod._degenerate, [1, -2.5, "x", [1], True]))
