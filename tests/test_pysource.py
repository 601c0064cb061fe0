"""Behavior pins for the Python Data Source surface (SURVEY §2.31,
the round-8 unfreeze batch): pruning really happens before tasks
launch, the Arrow lane carries identical content to the tuple lane,
the writer's two-phase commit leaves a complete manifest, and the
chunked stream reader drains across MULTIPLE micro-batches without
loss or duplication (the availableNow single-pull constraint is
documented in the reader docstring and oracle-checked in parity)."""

import glob
import os
import tempfile
import time

import pyspark.sql.functions as F
from conftest import SF_DIR

from louvain_modularity_spark.pysource import (
    PYDS_N,
    PYDS_PARTS,
    JsonlSink,
    SensorArrowSource,
    SensorSource,
    SensorStreamSource,
    _register,
)


def test_pushdown_prunes_partitions_before_launch(spark):
    _register(spark, SensorSource)
    full = spark.read.format("graft_sensors").load()
    assert full.rdd.getNumPartitions() == PYDS_PARTS
    pruned = spark.read.format("graft_sensors").load().filter(F.col("part") >= 6)
    assert pruned.rdd.getNumPartitions() == 2
    one = spark.read.format("graft_sensors").load().filter(F.col("part") == 3)
    assert one.rdd.getNumPartitions() == 1
    # residual (non-part) filters still apply post-scan
    both = (
        spark.read.format("graft_sensors")
        .load()
        .filter((F.col("part") == 3) & (F.col("sensor") == 7))
    )
    rows = both.collect()
    assert rows and all(r.part == 3 and r.sensor == 7 for r in rows)


def test_arrow_lane_matches_tuple_lane_exactly(spark):
    _register(spark, SensorSource, SensorArrowSource)
    a = sorted(map(tuple, spark.read.format("graft_sensors").load().collect()))
    b = sorted(map(tuple, spark.read.format("graft_sensors_arrow").load().collect()))
    assert a == b and len(a) == PYDS_N


def test_writer_two_phase_commit_manifest(spark):
    _register(spark, JsonlSink)
    sink = tempfile.mkdtemp(prefix="pyds_commit_")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4)
    df.write.format("graft_jsonl").option("path", sink).mode("append").save()
    files = sorted(glob.glob(f"{sink}/part-*.jsonl"))
    assert len(files) == 4
    manifest = dict(
        line.split("\t")
        for line in open(os.path.join(sink, "_SUCCESS")).read().splitlines()
    )
    assert sorted(manifest) == [os.path.basename(f) for f in files]
    assert sum(int(v) for v in manifest.values()) == 100
    back = spark.read.schema("k long, v long").json(f"{sink}/*.jsonl")
    assert sorted(map(tuple, back.collect())) == [(i, 3 * i) for i in range(100)]


def test_stream_reader_drains_across_multiple_batches(spark):
    _register(spark, SensorStreamSource)
    stream = (
        spark.readStream.format("graft_sensors_stream").option("chunk", "500").load()
    )
    agg = stream.groupBy("sensor").agg(
        F.count("*").alias("n"), F.sum("val").alias("sum_val")
    )
    name = "pyds_stream_multibatch"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            total = spark.sql(f"SELECT COALESCE(SUM(n), 0) AS t FROM {name}").first().t
            if total == PYDS_N:
                break
            time.sleep(0.5)
        assert total == PYDS_N, f"stream drained {total} of {PYDS_N} rows"
        data_batches = [
            p for p in q.recentProgress if p["numInputRows"] and p["numInputRows"] > 0
        ]
        assert len(data_batches) >= 2, (
            f"expected multiple non-empty micro-batches, got "
            f"{[(p['batchId'], p['numInputRows']) for p in q.recentProgress]}"
        )
    finally:
        q.stop()
    batch = (
        spark.read.format("graft_sensors")
        .load()
        .groupBy("sensor")
        .agg(F.count("*").alias("n"), F.sum("val").alias("sum_val"))
    )
    assert sorted(map(tuple, spark.table(name).collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_pyds_write_roundtrip_from_orders(spark):
    from louvain_modularity_spark.pysource import q_pyds_write
    from louvain_modularity_spark.sources import load

    got = {r.o_orderpriority: (r.n_orders, r.sum_keys) for r in q_pyds_write(spark, SF_DIR).collect()}
    want = {
        r.o_orderpriority: (r.n, r.s)
        for r in load(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("o_orderkey").alias("s"))
        .collect()
    }
    assert got == want


def test_full_pushdown_prune_yields_empty_not_crash(spark):
    """r8 ADVICE (medium): a filter that prunes EVERY partition made
    partitions() return [] — pyspark substitutes [None] and the old
    read(None) raised AttributeError on partition.value. The guarded
    reader must return an empty result instead. `part` only spans
    0..PYDS_PARTS-1, so part > PYDS_PARTS-1 empties the keep set."""
    _register(spark, SensorSource)
    empty = (
        spark.read.format("graft_sensors")
        .load()
        .filter(F.col("part") > PYDS_PARTS - 1)
    )
    assert empty.count() == 0
    # and an aggregate over the empty scan still plans + runs
    assert (
        empty.agg(F.count("*").alias("n")).first().n == 0
    )


def test_writer_abort_removes_partials_and_no_success():
    """The 2PC abort path (r8 task 4): unit-call write() to produce
    task files, then abort() — every partial file must be removed and
    no _SUCCESS manifest written."""
    from pyspark.sql import Row

    from louvain_modularity_spark.pysource import _JsonlWriter

    sink = tempfile.mkdtemp(prefix="pyds_abort_")
    try:
        w = _JsonlWriter({"path": sink})
        msgs = [
            w.write(iter([Row(k=i, v=i * 2) for i in range(10 * t, 10 * t + 10)]))
            for t in range(3)
        ]
        assert len(glob.glob(f"{sink}/part-*.jsonl")) == 3
        w.abort(msgs)
        assert glob.glob(f"{sink}/part-*.jsonl") == []
        assert not os.path.exists(os.path.join(sink, "_SUCCESS"))
    finally:
        import shutil

        shutil.rmtree(sink, ignore_errors=True)


def test_manifest_read_back_excludes_orphan_files(spark):
    """Exactly-once on the READ side (r8 ADVICE): a part file left by
    a failed/speculative task attempt sits in the sink dir but is NOT
    in the _SUCCESS manifest — committed_files() must exclude it,
    where the old bare `sink/*.jsonl` glob would have counted it."""
    from louvain_modularity_spark.pysource import committed_files

    _register(spark, JsonlSink)
    sink = tempfile.mkdtemp(prefix="pyds_orphan_")
    try:
        df = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ).repartition(2)
        df.write.format("graft_jsonl").option("path", sink).mode("append").save()
        # simulate an orphaned attempt: valid JSONL, never committed
        orphan = os.path.join(sink, "part-deadbeef-orphan.jsonl")
        with open(orphan, "w") as fh:
            fh.write('{"k": 999, "v": 999}\n')
        files = committed_files(sink)
        assert orphan not in files and len(files) == 2
        back = spark.read.schema("k long, v long").json(files)
        assert back.count() == 50
        assert back.filter(F.col("k") == 999).count() == 0
    finally:
        import shutil

        shutil.rmtree(sink, ignore_errors=True)


def test_pyds_write_cleans_up_temp_sink(spark, monkeypatch):
    """The mkdtemp sink dir used to leak every q_pyds_write call (r8
    ADVICE); the try/finally must remove it even though the returned
    DataFrame stays usable (the ≤5-row aggregate is materialized
    before cleanup)."""
    import louvain_modularity_spark.pysource as pysource

    made = []
    real = tempfile.mkdtemp

    def spy(*args, **kwargs):
        p = real(*args, **kwargs)
        made.append(p)
        return p

    monkeypatch.setattr(pysource.tempfile, "mkdtemp", spy)
    out = pysource.q_pyds_write(spark, SF_DIR)
    sinks = [p for p in made if "graft_jsonl_" in p]
    assert len(sinks) == 1
    assert not os.path.exists(sinks[0])
    # DataFrame survives the cleanup: schema + content intact
    assert [f.name for f in out.schema.fields] == [
        "o_orderpriority",
        "n_orders",
        "sum_keys",
    ]
    assert out.count() > 0


def test_stream_restart_resumes_offset_no_duplication(spark, tmp_path):
    """Exactly-once across a query RESTART: two availableNow runs over
    the same checkpoint must emit the domain exactly once — the second
    run finds the committed offset at PYDS_N and appends zero rows.
    This is the adversarial case for the stream reader's 'must
    lose/duplicate nothing across offset pulls' contract (a reader
    whose initialOffset ignored the checkpoint would double every
    row; one that advanced offsets non-deterministically would drop
    or replay a chunk)."""
    _register(spark, SensorStreamSource)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):
        q = (
            spark.readStream.format("graft_sensors_stream")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "availableNow run did not finish"
    back = spark.read.parquet(sink)
    assert back.count() == PYDS_N
    assert back.select("i").distinct().count() == PYDS_N
