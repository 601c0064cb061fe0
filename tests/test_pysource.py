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
