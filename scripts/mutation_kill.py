"""Mutation-kill audit of the verification nets (r18, VERDICT task 2).

Six straight evidence rounds found zero engine defects; this audit
answers the complementary question — WOULD the standing nets catch
one? Each mutant below is a plausible single-line engine defect
(the kind a hurried refactor introduces: a flipped frame bound, a
dropped guard, a changed default). For each, the harness:

  1. applies the one-line edit to the live source (exact-match
     replace, asserted unique),
  2. runs the mutant's nets — oracle parity at BOTH scales
     (tests/run_parity.py, the driver window's check), targeted
     pytest pins (the golden/invariant evidence rows-only queries
     rely on), and Lane B of the invariance protocol where the
     mutation touches a driver tail,
  3. reverts the edit (git checkout, in a finally:), and
  4. records which net(s) killed the mutant.

A SURVIVING mutant is the audit's yield: it means a plausible defect
class no standing net detects, and it must either gain a new pin/net
or be adjudicated as out-of-contract (e.g. a perf-only knob whose
output is provably unchanged). The kill matrix is committed to
sweeps/r18_mutation_kill.json and summarized in SCALE.md §8.

r19 extension (VERDICT r18 task 3): the matrix also mutates the
ORACLE side (O21-O26) — single-line defects in oracle SQL strings
(dropped predicate, flipped tie-break, corrupted hash replication,
widened watermark cut, narrowed rounding, dropped FILTER clause).
For these the kill criterion is the same (parity fails), but the
MEANING inverts: a kill proves the oracle clause CONSTRAINS the
engine at fixture scales; a survivor is a vacuous-oracle finding
that needs a measured adjudication or a vacuity-sweep entry.

Usage:
    python scripts/mutation_kill.py --dry          # verify all edits apply
    python scripts/mutation_kill.py                # full audit (~40 min)
    python scripts/mutation_kill.py --only M05     # one mutant
    python scripts/mutation_kill.py --json OUT     # write the matrix

SAFETY: the working tree must be clean before the run (asserted); the
edit is reverted in a finally: even on crash/interrupt.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

REPO = "/root/repo"

PKG = f"{REPO}/louvain_modularity_spark"

#: Each mutant: one-line defect, the nets expected to see it, and the
#: honest prior (kill = some net should fail; survive = no value net
#: CAN see it and the adjudication says why that is acceptable).
MUTANTS = [
    {
        "id": "M01_louvain_parity_guard",
        "defect": "Louvain oscillation guard pinned to parity class 0 "
        "(only half the nodes ever move)",
        "file": f"{PKG}/louvain.py",
        "old": 'F.pmod(F.xxhash64(F.col("src"), F.lit(seed)), F.lit(2)) == F.lit(rnd % 2)',
        "new": 'F.pmod(F.xxhash64(F.col("src"), F.lit(seed)), F.lit(2)) == F.lit(0)',
        "nets": {
            "parity": ["q_louvain_one_level", "q_best_move"],
            "pytest": [
                "tests/test_louvain.py::test_karate_louvain_quality",
                "tests/test_louvain.py::test_distributed_level_path",
                "tests/test_louvain.py::test_directed_louvain_g1",
                "tests/test_louvain.py::test_karate_golden_modularity",
            ],
            "laneb": True,
        },
    },
    {
        "id": "M02_rolling_frame_bound",
        "defect": "7-day rolling window frame widened to 8 days "
        "(rangeBetween(-6,..) -> (-7,..))",
        "file": f"{PKG}/analytics.py",
        "old": ".rangeBetween(-6, Window.currentRow)",
        "new": ".rangeBetween(-7, Window.currentRow)",
        "nets": {"parity": ["q_rolling_7d"]},
    },
    {
        "id": "M03_hub_salt_disabled",
        "defect": "hub salting silently disabled (salt_hubs <= 1 guard "
        "widened so the salted path never runs)",
        "file": f"{PKG}/louvain.py",
        "old": "    if salt_hubs <= 1:",
        "new": "    if salt_hubs <= 1024:",
        "nets": {
            "parity": ["q_louvain_one_level", "q_pagerank"],
            "pytest": [
                "tests/test_louvain.py::test_hub_salting_identical_results",
                # added r19 (closing the r18 audit's one adjudicated
                # survivor): salting is value-neutral, so the kill net
                # is a PLAN-fingerprint pin — the (dst, salt) join
                # shuffle, the salt-array explode, and the
                # pmod(xxhash64(src)) assignment must all appear in the
                # salted w2c plan on a crafted hub-heavy fixture
                "tests/test_coverage.py::test_hub_salt_plan_fingerprint",
            ],
        },
    },
    {
        "id": "M04_default_weight_zero",
        "defect": "NULL edge weights default to 0.0 instead of 1.0",
        "file": f"{PKG}/graph.py",
        "old": '"src", "dst", F.coalesce("weight", F.lit(1.0)).alias("weight")',
        "new": '"src", "dst", F.coalesce("weight", F.lit(0.0)).alias("weight")',
        "nets": {"parity": ["q_default_weight"]},
    },
    {
        "id": "M05_louvain_tail_unsorted",
        "defect": "canonical lexsort dropped from the Louvain inline "
        "tail (the r14 layout-sensitivity bug, resurrected)",
        "file": f"{PKG}/louvain.py",
        "old": "order = np.lexsort((w_a, dst_a, src_a))",
        "new": "order = np.arange(src_a.shape[0])",
        "nets": {
            "pytest": [
                "tests/test_louvain.py::test_karate_louvain_quality",
                "tests/test_louvain.py::test_karate_golden_modularity",
            ],
            "laneb": True,
        },
    },
    {
        "id": "M06_chunk_slice_short",
        "defect": "sliding chunk slice one token short",
        "file": f"{PKG}/textprep.py",
        "old": 'F.expr(f"slice(toks, start_pos, {CHUNK_TOKENS})").alias("chunk"),',
        "new": 'F.expr(f"slice(toks, start_pos, {CHUNK_TOKENS - 1})").alias("chunk"),',
        "nets": {"parity": ["q_chunk_sliding"]},
    },
    {
        "id": "M07_minhash_denominator",
        "defect": "MinHash Jaccard estimate divided by PERMS-1",
        "file": f"{PKG}/llm_ops.py",
        "old": '(matches / float(MINHASH_PERMS)).alias("est_jaccard"),',
        "new": '(matches / float(MINHASH_PERMS - 1)).alias("est_jaccard"),',
        "nets": {"parity": ["q_dedup_minhash"]},
    },
    {
        "id": "M08_gapfill_keep_nulls",
        "defect": "gap-fill forward-fill loses ignorenulls (carries "
        "NULL instead of the last observation)",
        "file": f"{PKG}/relational.py",
        "old": 'F.last("value", ignorenulls=True).over(fill).alias("value"),',
        "new": 'F.last("value", ignorenulls=False).over(fill).alias("value"),',
        "nets": {"parity": ["q_gap_fill"]},
    },
    {
        "id": "M09_watermark_delay",
        "defect": "append-mode watermark delay tripled (10 -> 30 min), "
        "cutting more windows from the emitted set",
        "file": f"{PKG}/streaming.py",
        "old": '        ev.withWatermark("ts_ltz", "10 minutes")\n'
        '        .groupBy(F.window("ts_ltz", "1 hour"))\n'
        '        .agg(F.count("*").alias("n_events"))',
        "new": '        ev.withWatermark("ts_ltz", "30 minutes")\n'
        '        .groupBy(F.window("ts_ltz", "1 hour"))\n'
        '        .agg(F.count("*").alias("n_events"))',
        "nets": {"parity": ["q_stream_watermark"]},
    },
    {
        "id": "M10_bpe_tiebreak_flip",
        "defect": "BPE merge tie-break flipped to (left DESC, right "
        "DESC) — a rows-only query defect",
        "file": f"{PKG}/textprep.py",
        "old": '.orderBy(F.desc("n"), F.asc("l"), F.asc("r"))',
        "new": '.orderBy(F.desc("n"), F.desc("l"), F.desc("r"))',
        "nets": {
            "parity": ["q_bpe_learn"],
            "pytest": [
                "tests/test_llm_ops.py::test_bpe_learn_matches_reference",
                "tests/test_llm_ops.py::test_bpe_encode_matches_python_golden",
            ],
        },
    },
    {
        "id": "M11_modularity_half_penalty",
        "defect": "modularity null-model penalty halved (4m^2 -> 2m^2)",
        "file": f"{PKG}/metrics.py",
        "old": 'F.expr(f"intra / m - {gamma!r} * sumk2 / (4.0 * m * m)").alias("q"),',
        "new": 'F.expr(f"intra / m - {gamma!r} * sumk2 / (2.0 * m * m)").alias("q"),',
        "nets": {
            "parity": ["q_modularity"],
            "pytest": [
                "tests/test_louvain.py::test_karate_golden_modularity",
                "tests/test_louvain.py::test_barbell_exact_modularity",
            ],
        },
    },
    {
        "id": "M12_hll_lgk_halved",
        "defect": "HLL sketch precision halved (lgK 12 -> 11) — a "
        "rows-only query defect behind the rejected oracle",
        "file": f"{PKG}/relational.py",
        "old": 'F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")',
        "new": 'F.hll_sketch_agg("user_id", F.lit(11)).alias("sk")',
        "nets": {
            "parity": ["q_hll_sketch"],
            "pytest": [
                "tests/test_coverage.py::test_hll_sketch_accuracy",
                # added AFTER the first audit run: M12 survived the two
                # nets above (rows-only + ±2% tolerance). The fixture
                # twin pin ALSO failed to kill (measured: 15/150
                # distinct users per type = exact sparse regime, lgK
                # unobservable at any fixture scale), so the
                # dense-regime pin synthesizes 60k distinct users where
                # adjacent lgK values diverge — the re-run receipt
                # shows THAT one kills M12
                "tests/test_coverage.py::test_hll_sketch_parameter_twin_pinned",
                "tests/test_coverage.py::test_hll_sketch_lgk_observable_dense_regime",
            ],
        },
    },
    # --- plan-level mutants (r18 extension): exercise the PLAN nets
    # (scripts/plan_sweep.py hazard detectors + the pytest plan pins)
    # that the value-net matrix above never touches ---
    {
        "id": "P13_join_theta_typo",
        "defect": "equi-join comparison typo'd to >= (the classic "
        "accidental-cartesian: every non-equi pair matches)",
        "file": f"{PKG}/relational.py",
        "old": 'o.join(c, o.o_custkey == c.c_custkey, "inner")',
        "new": 'o.join(c, o.o_custkey >= c.c_custkey, "inner")',
        "nets": {
            "parity": ["q_join_inner"],
            "plansweep": ["q_join_inner"],
        },
    },
    {
        "id": "P14_window_partition_dropped",
        "defect": "rolling window loses partitionBy (single-partition "
        "global window — the scale killer)",
        "file": f"{PKG}/analytics.py",
        "old": "    w = (\n"
        '        Window.partitionBy("user_id")\n'
        '        .orderBy("day")\n'
        "        .rangeBetween(-6, Window.currentRow)\n"
        "    )",
        "new": "    w = (\n"
        '        Window.orderBy("day")\n'
        "        .rangeBetween(-6, Window.currentRow)\n"
        "    )",
        "nets": {
            "parity": ["q_rolling_7d"],
            "plansweep": ["q_rolling_7d"],
        },
    },
    {
        "id": "P15_pushdown_blocked",
        "defect": "no-op arithmetic (+0) on a Q6 predicate column — "
        "values identical, parquet pushdown of that predicate lost",
        "file": f"{PKG}/tpch.py",
        "old": '        & (F.col("l_discount") >= 0.05)',
        "new": '        & (F.col("l_discount") + 0 >= 0.05)',
        "nets": {
            "parity": ["q_tpch_q6"],
            "pytest": ["tests/test_coverage.py::test_tpch_q6_full_pushdown"],
            "plansweep": ["q_tpch_q6"],
        },
    },
    # --- adapter/streaming-state mutants (r18 extension 2): the single
    # ts-encoding adapter everything depends on, and streaming state
    # parameters ---
    {
        "id": "S16_tsus_dormant_nanos_unit",
        "defect": "unit error in the DORMANT legacy nanos-as-long "
        "branch of sources.ts_us_expr (div 1000 -> div 1000000) — "
        "dead code on today's TIMESTAMP_NTZ fixtures",
        "file": f"{PKG}/sources.py",
        "old": '        return F.expr("ts div 1000")',
        "new": '        return F.expr("ts div 1000000")',
        "nets": {
            "parity": ["q_gap_fill", "q_sessionize"],
            "pytest": [
                "tests/test_dialect.py::test_ns_to_us_truncation_dialect",
                # added AFTER the first audit run: S16 survived (the
                # pin above verifies the convention with an INLINE
                # expression, never driving the adapter; the branch is
                # dead code on TIMESTAMP_NTZ fixtures). The corrective
                # drives sources.load itself on a crafted ns parquet —
                # the re-run receipt shows it kills S16
                "tests/test_dialect.py::test_ts_us_adapter_drives_both_branches",
            ],
        },
    },
    {
        "id": "S17_tsus_live_ms_truncation",
        "defect": "live ts_us branch truncated to milliseconds "
        "(unix_micros -> unix_millis*1000; fixtures measured 999/1000 "
        "rows with sub-ms micros)",
        "file": f"{PKG}/sources.py",
        "old": "    return F.unix_micros(F.col(\"ts\").cast(\"timestamp\"))",
        "new": "    return F.unix_millis(F.col(\"ts\").cast(\"timestamp\")) * 1000",
        "nets": {"parity": ["q_gap_fill", "q_sessionize"]},
    },
    {
        "id": "S18_session_gap_shrunk",
        "defect": "session window gap 30 -> 29 minutes",
        "file": f"{PKG}/streaming.py",
        "old": '.groupBy(F.session_window("ts_ltz", "30 minutes"), "user_id")',
        "new": '.groupBy(F.session_window("ts_ltz", "29 minutes"), "user_id")',
        "nets": {"parity": ["q_stream_session"]},
    },
    {
        "id": "S19_dedup_key_dropped",
        "defect": "streaming dedup loses event_type from its key list",
        "file": f"{PKG}/streaming.py",
        "old": '.dropDuplicatesWithinWatermark(["user_id", "event_type"])',
        "new": '.dropDuplicatesWithinWatermark(["user_id"])',
        "nets": {"parity": ["q_stream_dedup"]},
    },
    {
        "id": "S20_session_tz_drifted",
        "defect": "the self-healing session timezone conf drifts from "
        "UTC to America/New_York (ts_us NTZ->instant casts shift)",
        "file": f"{PKG}/session.py",
        "old": '    "spark.sql.session.timeZone": "UTC",',
        "new": '    "spark.sql.session.timeZone": "America/New_York",',
        "nets": {
            "parity": ["q_gap_fill", "q_fn_date", "q_stream_tumbling"],
        },
    },
    # --- ORACLE-side mutants (r19 extension, VERDICT r18 task 3): all
    # twenty mutants above attack the ENGINE; these attack the ORACLE
    # SQL itself. Here a KILL (parity FAILS under the mutated oracle)
    # proves the oracle CONSTRAINS the engine — the clause being
    # mutated is load-bearing at fixture scales, not an echo of
    # fixture luck. A SURVIVOR means that oracle clause is vacuous on
    # today's fixtures and must be adjudicated (measured receipt) or
    # become a vacuity-sweep finding. ---
    {
        "id": "O21_oracle_q6_predicate_dropped",
        "defect": "oracle: Q6 quantity cap effectively dropped "
        "(l_quantity < 24 -> < 240; fixture max is 50)",
        "file": f"{PKG}/tpch.py",
        "old": "  AND l_quantity < 24\n",
        "new": "  AND l_quantity < 240\n",
        "nets": {"parity": ["q_tpch_q6"]},
    },
    {
        "id": "O22_oracle_topk_tiebreak_flipped",
        "defect": "oracle: top-100 tie-break flipped to DESC on both "
        "key columns (selects different rows iff price ties straddle "
        "the LIMIT cut)",
        "file": f"{PKG}/relational.py",
        "old": "ORDER BY price DESC, l_orderkey, l_linenumber",
        "new": "ORDER BY price DESC, l_orderkey DESC, l_linenumber DESC",
        "nets": {"parity": ["q_sort_limit"]},
        "survival_ok": "measured BEFORE the run (r19, class-12a "
        "probe): the top-100 rounded prices are all DISTINCT at both "
        "oracle scales (sf0.001 cut 103155.53, sf0.01 cut 104793.77, "
        "ties_in_top100=1=ties_total, 100 distinct prices), so the "
        "tie-break clause is unexercised and flipping it is "
        "value-neutral on today's fixtures. The clause is defensive "
        "(it makes the cut deterministic on ANY data); its vacuity "
        "here is a fixture property, pinned by "
        "tests/test_dialect.py::test_topk_cut_tie_exposure.",
    },
    {
        "id": "O23_oracle_xxh64_rotl_corrupted",
        "defect": "oracle: XXH64 SQL replication rotl constant 31 -> "
        "30 (the DuckDB-side hash layers diverge from Spark's "
        "built-in xxhash64)",
        "file": f"{PKG}/graph.py",
        "old": '(f"{tag}_k1", _sql_mul64(_sql_rotl64(f"{tag}_k0", 31), _XXH64_P1)),',
        "new": '(f"{tag}_k1", _sql_mul64(_sql_rotl64(f"{tag}_k0", 30), _XXH64_P1)),',
        "nets": {"parity": ["q_seeded_order"]},
    },
    {
        "id": "O24_oracle_watermark_cut_widened",
        "defect": "oracle: stream-watermark delay constant 10 min -> "
        "70 min (the calibrated append-mode cut keeps windows the "
        "engine actually emits... or would, if the clause is "
        "load-bearing)",
        "file": f"{PKG}/streaming.py",
        "old": "  SELECT (MAX(epoch_us(ts)) // 1000) * 1000 - 600000000 AS wm FROM events",
        "new": "  SELECT (MAX(epoch_us(ts)) // 1000) * 1000 - 4200000000 AS wm FROM events",
        "nets": {"parity": ["q_stream_watermark"]},
    },
    {
        "id": "O25_oracle_round_digits_narrowed",
        "defect": "oracle: Q1 avg_disc rounding 6 -> 5 digits (the "
        "tolerance-widening class: a sloppier oracle round must not "
        "still match the engine's 6-digit round)",
        "file": f"{PKG}/tpch.py",
        "old": ", 6) AS avg_disc",
        "new": ", 5) AS avg_disc",
        "nets": {"parity": ["q_tpch_q1"]},
    },
    {
        "id": "O26_oracle_filter_clause_dropped",
        "defect": "oracle: FILTER (WHERE l_quantity > 25) dropped from "
        "the conditional count (n_bulk silently becomes n_rows)",
        "file": f"{PKG}/analytics.py",
        # 7-space indent = the ORACLE_FILTERED_AGG copy; the Spark-side
        # spark.sql twin at 15 spaces must NOT be touched
        "old": "\nSELECT l_linestatus,\n       COUNT(*)                                              AS n_rows,\n       COUNT(*)    FILTER (WHERE l_quantity > 25)            AS n_bulk,",
        "new": "\nSELECT l_linestatus,\n       COUNT(*)                                              AS n_rows,\n       COUNT(*)                                              AS n_bulk,",
        "nets": {"parity": ["q_filtered_agg"]},
    },
    {
        "id": "O27_oracle_ktruss_unroll_below_fixpoint",
        "defect": "oracle: k-truss unroll budget cut BELOW convergence "
        "(KTRUSS_ROUNDS 5 -> 1) — the truncated peel must NOT "
        "reproduce the converged edge set. (First attempt used -> 2 "
        "and SURVIVED, which MEASURED the convergence point: the "
        "documented '3 rounds incl. the confirming round' means the "
        "edge set stabilizes after round 2, so 2 is AT fixpoint, not "
        "below it — the mutant was re-aimed at 1.)",
        "file": f"{PKG}/graph.py",
        "old": "KTRUSS_ROUNDS = 5",
        "new": "KTRUSS_ROUNDS = 1",
        "nets": {"parity": ["q_ktruss"]},
    },
    {
        "id": "O28_oracle_ktruss_margin_shaved",
        "defect": "oracle: k-truss unroll margin shaved by one round "
        "(KTRUSS_ROUNDS 5 -> 4, still >= the measured 3-round "
        "fixpoint)",
        "file": f"{PKG}/graph.py",
        "old": "KTRUSS_ROUNDS = 5",
        "new": "KTRUSS_ROUNDS = 4",
        "nets": {"parity": ["q_ktruss"]},
        "survival_ok": "survives BY DESIGN, not by vacuity: the peel "
        "operator is idempotent at fixpoint (documented at the "
        "constant's definition — karate's 4-truss converges in 3 "
        "rounds, measured incl. the confirming round), so any unroll "
        ">= 3 produces the identical edge set. The margin exists to "
        "absorb fixture drift; O27 proves the unroll is a REAL peel "
        "by cutting below the fixpoint and dying.",
    },
    {
        "id": "O29_oracle_asof_inclusivity_flipped",
        "defect": "oracle: ASOF join inclusivity >= flipped to > "
        "(equal-timestamp click no longer matches its purchase)",
        "file": f"{PKG}/relational.py",
        "old": "  ON p.user_id = c.user_id AND p.ts >= c.ts",
        "new": "  ON p.user_id = c.user_id AND p.ts > c.ts",
        "nets": {"parity": ["q_join_asof"]},
        "survival_ok": "survives with the r15 MEASURED receipt "
        "(SURVEY batch-boundary audit): zero equal-ts "
        "(purchase, click) pairs per user at every fixture scale, so "
        "the boundary is unexercised in-data. The >= rule itself is "
        "NOT fixture luck: it was probed engine-vs-oracle at crafted "
        "equal-ts points and pinned by "
        "tests/test_analytics.py::test_join_asof_equality_boundary "
        "plus two hypothesis property generalizations — the exact "
        "pre-existing treatment this mutant class asks for.",
    },
]


def _run(cmd: list[str], timeout: int = 3600) -> tuple[int, float, str]:
    t0 = time.time()
    p = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
    )
    tail = (p.stdout + p.stderr)[-2000:]
    return p.returncode, round(time.time() - t0, 1), tail


def apply_mutant(m) -> None:
    src = open(m["file"]).read()
    n = src.count(m["old"])
    # explicit raise, not assert: this guard (and the clean-tree one in
    # main) must survive `python -O` — a non-unique replace followed by
    # the unconditional git-checkout revert could clobber real edits
    if n != 1:
        raise SystemExit(
            f"{m['id']}: old string occurs {n} times in {m['file']}"
        )
    open(m["file"], "w").write(src.replace(m["old"], m["new"], 1))


def revert(m) -> None:
    subprocess.run(
        ["git", "checkout", "--", m["file"]], cwd=REPO, check=True
    )


def run_nets(m) -> dict:
    nets = {}
    spec = m["nets"]
    if spec.get("parity"):
        code, wall, tail = _run(
            ["python", "tests/run_parity.py", *spec["parity"]]
        )
        nets["parity_both_scales"] = {
            "killed": code != 0,
            "wall_s": wall,
            "queries": spec["parity"],
            "tail": tail if code != 0 else "",
        }
    if spec.get("pytest"):
        code, wall, tail = _run(["python", "-m", "pytest", "-q", *spec["pytest"]])
        nets["pytest_pins"] = {
            "killed": code != 0,
            "wall_s": wall,
            "tests": spec["pytest"],
            "tail": tail if code != 0 else "",
        }
    if spec.get("laneb"):
        code, wall, tail = _run(
            ["python", "scripts/determinism_sweep.py", "--lane-b"]
        )
        nets["lane_b_invariance"] = {
            "killed": code != 0,
            "wall_s": wall,
            "tail": tail if code != 0 else "",
        }
    if spec.get("plansweep"):
        code, wall, tail = _run(
            ["python", "scripts/plan_sweep.py", *spec["plansweep"]]
        )
        nets["plan_sweep"] = {
            "killed": code != 0,
            "wall_s": wall,
            "queries": spec["plansweep"],
            "tail": tail if code != 0 else "",
        }
    return nets


def main() -> int:
    argv = sys.argv[1:]
    dry = "--dry" in argv
    only = None
    if "--only" in argv:
        # comma-separated list of mutant ids (r19: targeted re-runs —
        # the M03 corrective + the oracle-side extension — without
        # paying the full ~40-min matrix)
        only = set(argv[argv.index("--only") + 1].split(","))
    json_out = None
    if "--json" in argv:
        json_out = argv[argv.index("--json") + 1]

    status = subprocess.run(
        ["git", "status", "--porcelain", "louvain_modularity_spark"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    if status:
        raise SystemExit(
            f"package tree not clean, refusing to mutate:\n{status}"
        )

    matrix = []
    for m in MUTANTS:
        if only and not any(m["id"].startswith(o) for o in only):
            continue
        if dry:
            src = open(m["file"]).read()
            n = src.count(m["old"])
            print(f"{m['id']}: old-string count = {n} "
                  f"({'OK' if n == 1 else 'NOT UNIQUE/MISSING'})")
            continue
        print(f"== {m['id']}: {m['defect']}", flush=True)
        apply_mutant(m)
        try:
            nets = run_nets(m)
        finally:
            revert(m)
        killed_by = [k for k, v in nets.items() if v["killed"]]
        entry = {
            "id": m["id"],
            "defect": m["defect"],
            "file": m["file"].replace(REPO + "/", ""),
            "killed": bool(killed_by),
            "killed_by": killed_by,
            "nets": nets,
        }
        if not killed_by and m.get("survival_ok"):
            entry["survival_adjudication"] = m["survival_ok"]
        matrix.append(entry)
        verdict = f"KILLED by {killed_by}" if killed_by else "SURVIVED"
        print(f"   -> {verdict}", flush=True)

    if dry:
        return 0
    survivors = [e for e in matrix if not e["killed"]]
    unadjudicated = [e["id"] for e in survivors if "survival_adjudication" not in e]
    out = {
        "mutants": len(matrix),
        "killed": sum(1 for e in matrix if e["killed"]),
        "survivors": [e["id"] for e in survivors],
        "unadjudicated_survivors": unadjudicated,
        "matrix": matrix,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "matrix"}, indent=2))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=2)
    # the audit FAILS if a mutant survives with no adjudication — that
    # is exactly the "plausible defect no net catches" finding the
    # audit exists to surface; it must become a new pin or a written
    # adjudication before the audit goes green
    return 1 if unadjudicated else 0


if __name__ == "__main__":
    sys.exit(main())
