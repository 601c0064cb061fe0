"""Partition-invariance gate (round 11): a sampled slice of the
registry-wide determinism sweep (scripts/determinism_sweep.py) runs in
the suite so a partition-SENSITIVE result — first() without ordering,
per-partition rand() streams, pandas-UDF per-batch state — cannot land
silently. The full 308-query sweep is the audit script; this gate
keeps one representative per engine lane (hash agg, window, pandas
UDF, mapInPandas, seeded sampling, banded dedup join, streaming batch,
iterative graph) inside the pytest budget."""

import importlib.util


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "determinism_sweep", "/root/repo/scripts/determinism_sweep.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# one query per engine lane; keep this list CHEAP (sf0.001, warm
# session) — the full registry is the audit script's job
SAMPLE = [
    "q_agg_groupby",  # hash aggregate
    "q_window_rank",  # window function
    "q_udf_pandas",  # pandas UDF (arrow batch boundaries)
    "q_multimodal_features",  # mapInPandas
    "q_sample_hash",  # hash-based sampling
    "q_reservoir_group",  # seeded per-group sampling
    "q_dedup_minhash",  # banded LSH join + lineage_cut
    "q_stream_tumbling",  # streaming batch-equivalence lane
    "q_quantiles",  # float math
    "q_louvain_one_level",  # iterative, seed-ordered
]


def test_sampled_queries_partition_invariant(spark):
    mod = _load_sweep()
    report = mod.sweep(spark, SAMPLE, verbose=False)
    assert report["checked"] == len(SAMPLE)
    assert report["findings"] == {}, (
        "partition-sensitive results (fix the operator or adjudicate "
        f"in scripts/determinism_sweep.py ALLOW): {report['findings']}"
    )


def test_comparator_classifies_known_shapes():
    mod = _load_sweep()
    # identical
    assert mod._compare((["a"], [(1,), (2,)]), (["a"], [(2,), (1,)])) == "identical"
    # pure float roundoff -> roundoff, not a finding
    assert mod._compare((["x"], [(0.1 + 0.2,)]), (["x"], [(0.3,)])) == "roundoff"
    # real value difference -> mismatch message
    assert "differing" in mod._compare((["a"], [(1,)]), (["a"], [(2,)]))
    # shape differences -> mismatch
    assert "row count" in mod._compare((["a"], [(1,)]), (["a"], [(1,), (2,)]))
    assert "column" in mod._compare((["a"], [(1,)]), (["b"], [(1,)]))
