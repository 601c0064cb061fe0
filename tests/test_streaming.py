"""Streaming semantics the batch oracle can't check: late-data drop
under watermark across micro-batches (SURVEY.md §2.11 / §5.2)."""

import pyspark.sql.functions as F

HOUR_US = 3_600_000_000


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "event_id LONG, ts LONG, user_id LONG").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two micro-batches: batch 1 advances the watermark far past an
    old window; batch 2's very-late row must NOT create/extend that
    window in append-mode output."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    us = lambda h, m=0: (h * 3600 + m * 60) * 1_000_000 * 1000  # ns  # noqa: E731

    # batch 1: events at hour 0 and hour 10 (watermark → 10:00 - 10min)
    _write_batch(spark, src, [(1, us(0, 5), 1), (2, us(10), 1)])

    stream = (
        spark.readStream.schema("event_id LONG, ts LONG, user_id LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts_ltz", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts_ltz", "10 minutes")
        .groupBy(F.window("ts_ltz", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros("window.start").alias("ws"), "n")
    )
    emitted: list[tuple[int, int]] = []

    def _run():
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(
                    (r["ws"], r["n"]) for r in df.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _run()
    # batch 2: a very late row for hour 0 — arrives after watermark passed
    _write_batch(spark, src, [(3, us(0, 30), 1)])
    _run()

    out = dict(emitted)
    # hour-0 window was finalized by batch 1's watermark with n=1;
    # the late row must not have produced an updated hour-0 window
    assert out.get(0, 0) == 1, f"late row leaked into finalized window: {emitted}"


def test_watermark_append_boundary(spark, tmp_path):
    """Pin the boundary rule ORACLE_STREAM_WATERMARK (r13) depends on:
    append mode emits a window when window_end <= watermark —
    INCLUSIVE at exact equality. Three crafted single-batch sources
    place the final watermark (max ts − 10 min) exactly ON the hour-0
    window's end, 1 µs before it, and 1 µs after it; only the
    just-before case may withhold the window. If a Spark upgrade ever
    flips this to strict-less-than, this test fails loudly and the
    oracle's <= must flip with it."""
    from louvain_modularity_spark.streaming import run_to_table

    ten_min_us = 600_000_000

    def emitted_windows(case: str, max_ts_us: int) -> dict[int, int]:
        src = str(tmp_path / f"src_{case}")
        ns = lambda us: us * 1000  # noqa: E731
        _write_batch(
            spark,
            src,
            [
                (1, ns(100), 1),
                (2, ns(HOUR_US // 2), 1),
                (3, ns(HOUR_US + 100), 1),
                (4, ns(max_ts_us), 1),
            ],
        )
        agg = (
            spark.readStream.schema("event_id LONG, ts LONG, user_id LONG")
            .parquet(src)
            .withColumn("ts_ltz", F.timestamp_micros(F.expr("ts div 1000")))
            .withWatermark("ts_ltz", "10 minutes")
            .groupBy(F.window("ts_ltz", "1 hour"))
            .agg(F.count("*").alias("n"))
            .select(F.unix_micros("window.start").alias("ws"), "n")
        )
        return {
            r["ws"]: r["n"] for r in run_to_table(spark, agg, "append").collect()
        }

    at = emitted_windows("eq", HOUR_US + ten_min_us)
    below = emitted_windows("below", HOUR_US + ten_min_us - 1)
    above = emitted_windows("above", HOUR_US + ten_min_us + 1)
    assert at.get(0) == 2, f"wm==end must EMIT (<= rule), got {at}"
    assert 0 not in below, f"wm<end must withhold, got {below}"
    assert above.get(0) == 2, f"wm>end must emit, got {above}"


def test_stream_join_outer_eviction_boundary(spark, tmp_path):
    """Pin the CALIBRATED outer-null emission rule ORACLE_STREAM_JOIN_OUTER
    (r14) depends on: an unmatched click is emitted iff

        ceil_ms(click_ts) + 1 h  <  wm        (strict)
        wm = floor_ms(least(max click, max purchase)) − 10 min

    i.e. the join's state-cleanup predicate works at MS precision with
    the watermark side rounded DOWN and the state side rounded UP —
    discovered by a 10-point probe sweep (r14): ±1 ms clears the
    boundary as expected, but a click 1 µs below the µs-exact boundary
    is WITHHELD (the µs-precision rule the oracle previously used
    would emit it). Six cases, each a crafted 3-row source (the probed
    click, a far click that raises the click-side max, and one
    other-user purchase that sets the watermark): the two whole-ms
    boundary cases, the −1 µs near-miss, the two sub-ms ceil
    discriminators, and the sub-ms watermark-floor discriminator. If a
    Spark upgrade changes the rounding or strictness, this fails
    loudly and the oracle's expression must move with it."""
    from louvain_modularity_spark.streaming import run_to_table

    HOUR = 3_600_000_000
    TENMIN = 600_000_000
    BASE = 1_000 * HOUR  # away from the epoch edge

    def probe(case: str, probes: dict[int, int], max_p_us: int) -> set[int]:
        """Run the probed clicks {click_id: ts_us} plus the far click
        and the watermark-setting purchase in ONE availableNow join;
        return the click_ids emitted as outer NULLs. Eviction is a
        per-row predicate against the single global watermark, and
        every probed click shares this run's watermark configuration
        exactly as in the original one-probe-per-run form, so cases
        with the same max_p_us merge into one run (r16 suite-budget
        merge; assertions unchanged)."""
        src = str(tmp_path / f"src_{case}")
        rows = [
            (cid, (BASE + ts_c_us) * 1000, 10, "click")
            for cid, ts_c_us in probes.items()
        ] + [
            (100, (BASE + max_p_us + 2 * HOUR) * 1000, 11, "click"),
            (200, (BASE + max_p_us) * 1000, 99, "purchase"),
        ]
        spark.createDataFrame(
            rows, "event_id LONG, ts LONG, user_id LONG, event_type STRING"
        ).coalesce(1).write.mode("overwrite").parquet(src)
        ev = (
            spark.readStream.schema(
                "event_id LONG, ts LONG, user_id LONG, event_type STRING"
            )
            .parquet(src)
            .withColumn("ts_ltz", F.timestamp_micros(F.expr("ts div 1000")))
        )
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                "user_id",
                F.col("ts_ltz").alias("click_ltz"),
            )
            .withWatermark("click_ltz", "10 minutes")
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user_id"),
                F.col("ts_ltz").alias("purchase_ltz"),
            )
            .withWatermark("purchase_ltz", "10 minutes")
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "user_id = p_user_id AND purchase_ltz >= click_ltz AND "
                "purchase_ltz <= click_ltz + INTERVAL 1 HOUR"
            ),
            "left_outer",
        )
        out = run_to_table(spark, joined, "append").collect()
        return {r["click_id"] for r in out if r["purchase_id"] is None}

    W = 20 * HOUR  # whole-ms purchase-side max
    wm = W - TENMIN
    # five probes share the W watermark configuration -> one run:
    #   1 eq:    whole-ms click exactly ON the boundary, ceil(c)+1h == wm
    #            -> WITHHOLD (strict <)
    #   2 m1ms:  whole-ms click 1 ms below -> EMIT
    #   3 m1us:  sub-ms click 1 µs below the µs-exact boundary: ceil
    #            rounds it back to the boundary -> WITHHOLD (the case a
    #            µs-precision oracle gets wrong)
    #   4 ceilA: c+1h = wm-1ms-1µs -> EMIT (ceil lands 1 ms clear)
    #   5 ceilB: c+1h = wm-999µs -> WITHHOLD (ceil lands ON wm)
    emitted = probe(
        "sharedW",
        {
            1: wm - HOUR,
            2: wm - HOUR - 1000,
            3: wm - HOUR - 1,
            4: wm - HOUR - 1000 - 1,
            5: wm - HOUR - 999,
        },
        W,
    )
    assert emitted & {1, 2, 3, 4, 5} == {2, 4}, (
        f"eviction boundary rules drifted: emitted {sorted(emitted)}, want {{2, 4}}"
    )
    # watermark-floor discriminator needs its own run (purchase max
    # carries +999 µs): a whole-ms click whose c+1h equals the FLOORED
    # wm must be withheld (an unfloored watermark would emit it)
    assert 6 not in probe("floorC", {6: wm - HOUR}, W + 999)


def test_window_assignment_boundary(spark, tmp_path):
    """Pin the r15 P1 calibration (scripts/probe_stream_boundaries.py):
    tumbling-window ASSIGNMENT is pure µs arithmetic with [start, end)
    semantics — an event at exactly the hour edge opens the NEW
    window, 1 µs before stays in the old one, and sub-ms offsets do
    not leak the ms event-time machinery into assignment. This is the
    rule every `ts_us - ts_us % width` oracle term depends on
    (tumbling / sliding / topk / metrics / watermark)."""
    from louvain_modularity_spark.streaming import run_to_table

    base = 1_000 * HOUR_US

    # One probe event per user_id — window assignment is a pure per-row
    # function and the aggregation keys on (window, user_id), so the
    # four boundary cases are independent inside ONE availableNow run
    # (r16 suite-budget merge; previously four separate runs asserting
    # exactly the same per-case assignments).
    cases = {
        1: base + HOUR_US - 1,  # below: stays in the old window
        2: base + HOUR_US,  # eq: opens the NEW window ([start, end))
        3: base + HOUR_US + 1,  # above
        4: base + HOUR_US + 999,  # subms: no ms rounding in assignment
    }
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(uid, ts * 1000, uid) for uid, ts in cases.items()])
    agg = (
        spark.readStream.schema("event_id LONG, ts LONG, user_id LONG")
        .parquet(src)
        .withColumn("ts_ltz", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts_ltz", "10 minutes")
        .groupBy(F.window("ts_ltz", "1 hour"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros("window.start").alias("ws"), "user_id")
    )
    got = {
        r["user_id"]: r["ws"]
        for r in run_to_table(spark, agg, "complete").collect()
    }
    assert got == {
        1: base,
        2: base + HOUR_US,
        3: base + HOUR_US,
        4: base + HOUR_US,
    }, got


def test_session_gap_boundary(spark, tmp_path):
    """Pin the r15 P2 calibration (scripts/probe_stream_boundaries.py):
    session_window's split is STRICT — two events exactly 30 min apart
    MERGE into one session (the pre-r15 oracle split at >=, wrong at
    exact equality), 30 min + 1 µs splits, and the emitted session end
    is last + gap at full µs precision (the oracle's MAX(ts_us)+GAP
    term). If a Spark upgrade flips the merge rule or rounds session
    ends to ms, this fails loudly and ORACLE_STREAM_SESSION must move
    with it."""
    from louvain_modularity_spark.streaming import run_to_table

    base = 1_000 * HOUR_US
    gap = 1_800_000_000

    # session_window state is per-key, so the four boundary cases run
    # as four user_ids inside ONE availableNow run (r16 suite-budget
    # merge; identical per-case assertions as the previous four runs).
    cases = {
        1: [base, base + gap],  # exactly gap apart -> ONE merged session
        2: [base, base + gap + 1],  # 1 µs over -> TWO sessions
        3: [base, base + gap - 1],  # 1 µs under -> one session
        4: [base + 999],  # sub-ms: bounds stay µs-exact (no ms rounding)
    }
    src = str(tmp_path / "src")
    rows = [
        (uid * 100 + i, ts * 1000, uid)
        for uid, ts_list in cases.items()
        for i, ts in enumerate(ts_list)
    ]
    _write_batch(spark, src, rows)
    agg = (
        spark.readStream.schema("event_id LONG, ts LONG, user_id LONG")
        .parquet(src)
        .withColumn("ts_ltz", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts_ltz", "10 minutes")
        .groupBy(F.session_window("ts_ltz", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("ss"),
            F.unix_micros("session_window.end").alias("se"),
            "n",
        )
    )
    got: dict[int, list[tuple[int, int, int]]] = {}
    for r in run_to_table(spark, agg, "complete").collect():
        got.setdefault(r["user_id"], []).append((r["ss"], r["se"], r["n"]))
    got = {uid: sorted(v) for uid, v in got.items()}
    assert got[1] == [(base, base + gap + gap, 2)], got[1]
    assert got[2] == [
        (base, base + gap, 1),
        (base + gap + 1, base + gap + 1 + gap, 1),
    ], got[2]
    assert got[3] == [(base, base + gap - 1 + gap, 2)], got[3]
    assert got[4] == [(base + 999, base + 999 + gap, 1)], got[4]


def test_stream_inner_join_range_boundary(spark, tmp_path):
    """Pin the r15 P3 calibration (scripts/probe_stream_boundaries.py):
    the stream-stream JOIN CONDITION itself evaluates at full µs
    precision — a purchase at exactly click + 1 h matches (inclusive
    <=), at +1 h + 1 µs does not, and a sub-ms click keeps the bound
    µs-exact. The r14 ms-rounding machinery is confined to the
    watermark/state-cleanup side (probed separately by
    test_stream_join_outer_eviction_boundary); ORACLE_STREAM_STREAM_JOIN
    and the matched half of ORACLE_STREAM_JOIN_OUTER rely on the
    µs-exact rule pinned here."""
    from louvain_modularity_spark.streaming import run_to_table

    base = 1_000 * HOUR_US

    # The join condition requires user_id = p_user_id, so four
    # (click, purchase) probe pairs on four distinct user_ids are
    # independent inside ONE availableNow run (r16 suite-budget merge;
    # identical per-case assertions as the previous four runs).
    cases = {
        10: (base, base + HOUR_US, True),  # purchase exactly click+1h: inclusive
        11: (base, base + HOUR_US + 1, False),  # +1 µs over the bound
        12: (base, base + HOUR_US - 1, True),  # 1 µs under
        13: (base + 999, base + 999 + HOUR_US, True),  # sub-ms click, µs-exact bound
    }
    src = str(tmp_path / "src")
    rows = []
    for uid, (c_us, p_us, _want) in cases.items():
        rows.append((uid * 10, c_us * 1000, uid, "click"))
        rows.append((uid * 10 + 1, p_us * 1000, uid, "purchase"))
    spark.createDataFrame(
        rows, "event_id LONG, ts LONG, user_id LONG, event_type STRING"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    ev = (
        spark.readStream.schema(
            "event_id LONG, ts LONG, user_id LONG, event_type STRING"
        )
        .parquet(src)
        .withColumn("ts_ltz", F.timestamp_micros(F.expr("ts div 1000")))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts_ltz").alias("click_ltz"))
        .withWatermark("click_ltz", "10 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts_ltz").alias("purchase_ltz"),
        )
        .withWatermark("purchase_ltz", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ltz >= click_ltz AND "
            "purchase_ltz <= click_ltz + INTERVAL 1 HOUR"
        ),
    )
    matched = {
        r["user_id"] for r in run_to_table(spark, joined, "append").collect()
    }
    want = {uid for uid, (_c, _p, w) in cases.items() if w}
    assert matched == want, f"join-condition boundary drifted: {matched} != {want}"


def test_stream_equals_batch_tumbling(spark):
    """availableNow streaming result == batch computation on the same
    data (the §2.11 equivalence that underpins the oracle checks)."""
    from louvain_modularity_spark.sources import load
    from louvain_modularity_spark.streaming import q_stream_tumbling

    sf_dir = "/root/testdata/sf0.001"
    streamed = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_stream_tumbling(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    batch = {
        (r["ws"], r["event_type"]): (r["n"], r["sv"])
        for r in ev.groupBy(
            (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("ws"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sv"),
        )
        .collect()
    }
    assert streamed == batch


def test_single_file_staging_invariant(spark):
    """Guard for the single-batch scoping three oracles rest on (r15
    verdict, What's wrong #2): ORACLE_STREAM_DEDUP (batch DISTINCT),
    ORACLE_STREAM_WATERMARK (pure cut — wm = 0 during aggregation) and
    ORACLE_STREAM_JOIN_OUTER (final-watermark eviction rule) are valid
    *because* the staged source directory contains exactly ONE parquet
    file, so trigger(availableNow) ingests ALL data in a single
    micro-batch (the §2.45 P4 probe SHOWED a replayed key re-emits and
    late rows drop under multi-batch staging). This test pins the
    invariant itself at both oracle scales: (a) the staged directory
    holds exactly one data file after staging, and (b) an availableNow
    run over it reports exactly one data-carrying micro-batch via the
    progress API (trailing no-data batches — which DRIVE eviction —
    are allowed and expected). If stream_events ever stages multiple
    files or splits the batch, this fails loudly instead of silently
    invalidating the three oracles' scoping arguments."""
    import os
    import uuid

    from louvain_modularity_spark.streaming import (
        _staged_events_dir,
        stream_events,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        staged, _sig = _staged_events_dir(sf_dir)
        data_files = [
            f
            for f in os.listdir(staged)
            if not f.startswith((".", "_"))  # ignore spark/stream metadata
        ]
        assert data_files == ["events.parquet"], (
            f"{staged}: single-file staging invariant broken: {data_files}"
        )

        ev = stream_events(spark, sf_dir)
        name = f"staging_guard_{uuid.uuid4().hex[:12]}"
        q = (
            ev.groupBy()
            .count()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.recentProgress
        data_batches = [
            p for p in progress if p["numInputRows"] and p["numInputRows"] > 0
        ]
        assert len(data_batches) == 1, (
            f"{sf_dir}: expected exactly one data-carrying micro-batch, "
            f"got {[(p['batchId'], p['numInputRows']) for p in progress]}"
        )
        # and that one batch carried the WHOLE file
        n_batch = data_batches[0]["numInputRows"]
        n_total = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
        assert n_batch == n_total, (
            f"{sf_dir}: single batch ingested {n_batch} of {n_total} rows"
        )
