"""Python Data Source API surface (Spark 4 `pyspark.sql.datasource`).

Round-8 registry additions (SURVEY §2.31 — the unfreeze batch): the
r2–r7 environment probes found spark-avro and transformWithState
still gated (no spark-avro jar; `google.protobuf` broken in this
container — re-probed round 8, the streaming runner crashes in
protobuf descriptor import), but the Python Data Source API is fully
present and works end-to-end, including filter pushdown, Arrow-batch
reads, writers, and simple stream readers. That is genuinely new
engine surface — a user-extensible connector lane the reference
surface (custom sources/sinks) implies — so it unfreezes the registry
for exactly this batch of five.

All five are deterministic, so four carry exact DuckDB oracles over
`range()` arithmetic or the orders table; the write query's sink is
per-call temp-unique and therefore oracle-checked on the read-back
aggregate.

100 TB notes: a Python data source runs its `read(partition)` on
executors — partition count is the parallelism lever, and the LCG
generator here stands in for any parameterized fetch (an API shard, a
key-range scan). Filter pushdown prunes PARTITIONS Python-side before
tasks launch (asserted in tests), which is the same contract as
parquet partition pruning. The JSONL writer writes one file per task
and commits via driver-side messages — on a cluster the path must be
shared storage; the local temp dir here stands in for it.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from .sources import load

# Deterministic sensor-reading generator shared by every query here:
# global row i in [0, PYDS_N) carries
#   sensor = i % PYDS_SENSORS
#   val    = ((i * PYDS_A + PYDS_B) % PYDS_M) % PYDS_VMAX   (integer!)
#   part   = i // (PYDS_N // PYDS_PARTS)
# Values stay integral so sums are order-independent and exact — a
# double sum would hash-drift across partition orderings.
PYDS_N = 2_000
PYDS_PARTS = 8
PYDS_SENSORS = 50
PYDS_A, PYDS_B = 1_103_515_245, 12_345
PYDS_M = 2_147_483_648
PYDS_VMAX = 1_000

_ROWS_PER_PART = PYDS_N // PYDS_PARTS


def _gen_row(i: int):
    return (
        i,
        i % PYDS_SENSORS,
        ((i * PYDS_A + PYDS_B) % PYDS_M) % PYDS_VMAX,
        i // _ROWS_PER_PART,
    )


_PYDS_SCHEMA = "i bigint, sensor bigint, val bigint, part bigint"


class _SensorReader(DataSourceReader):
    """Partitioned deterministic reader with part-column filter
    pushdown: EqualTo / ranges on `part` prune whole partitions before
    tasks launch; every other filter is returned unhandled for Spark
    to apply."""

    def __init__(self, options):
        self.keep = set(range(PYDS_PARTS))

    def pushFilters(self, filters):
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col != "part":
                yield f
                continue
            if isinstance(f, EqualTo):
                self.keep &= {f.value}
            elif isinstance(f, GreaterThanOrEqual):
                self.keep &= set(range(f.value, PYDS_PARTS))
            elif isinstance(f, GreaterThan):
                self.keep &= set(range(f.value + 1, PYDS_PARTS))
            elif isinstance(f, LessThan):
                self.keep &= set(range(0, min(f.value, PYDS_PARTS)))
            elif isinstance(f, LessThanOrEqual):
                self.keep &= set(range(0, min(f.value + 1, PYDS_PARTS)))
            else:
                yield f

    def partitions(self):
        return [InputPartition(p) for p in sorted(self.keep)]

    def read(self, partition):
        if partition is None:
            # Full pushdown pruning: partitions() returned [] and
            # pyspark substitutes a single None partition for the one
            # task it still launches — emit nothing (r8 ADVICE: this
            # used to raise AttributeError on partition.value).
            return
        base = partition.value * _ROWS_PER_PART
        for i in range(base, base + _ROWS_PER_PART):
            yield _gen_row(i)


class SensorSource(DataSource):
    @classmethod
    def name(cls):
        return "graft_sensors"

    def schema(self):
        return _PYDS_SCHEMA

    def reader(self, schema):
        return _SensorReader(self.options)


class _SensorArrowReader(DataSourceReader):
    """Same generator, Arrow lane: read() yields one pyarrow
    RecordBatch per partition instead of Python tuples — the zero-copy
    path for sources that already hold columnar buffers."""

    def partitions(self):
        return [InputPartition(p) for p in range(PYDS_PARTS)]

    def read(self, partition):
        import pyarrow as pa

        base = partition.value * _ROWS_PER_PART
        rows = [_gen_row(i) for i in range(base, base + _ROWS_PER_PART)]
        cols = list(zip(*rows))
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, type=pa.int64()) for c in cols],
            names=["i", "sensor", "val", "part"],
        )


class SensorArrowSource(DataSource):
    @classmethod
    def name(cls):
        return "graft_sensors_arrow"

    def schema(self):
        return _PYDS_SCHEMA

    def reader(self, schema):
        return _SensorArrowReader()


class _SensorStreamReader(SimpleDataSourceStreamReader):
    """Deterministic stream of the same rows: offset = next global row
    index; each pull emits up to `chunk` rows until the domain is
    exhausted, then holds the offset. The default chunk is the whole
    domain because availableNow computes its end offset ONCE at start
    — a partial first pull would silently truncate the run (measured:
    chunk=500 under availableNow drained exactly 500 rows). The
    chunked multi-batch path is exercised in tests with a
    processing-time trigger instead."""

    def __init__(self, options):
        self.chunk = int(options.get("chunk", PYDS_N))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i0 = start["i"]
        if i0 >= PYDS_N:
            return iter([]), start
        i1 = min(i0 + self.chunk, PYDS_N)
        return iter([_gen_row(i) for i in range(i0, i1)]), {"i": i1}

    def readBetweenOffsets(self, start, end):
        return iter([_gen_row(i) for i in range(start["i"], end["i"])])


class SensorStreamSource(DataSource):
    @classmethod
    def name(cls):
        return "graft_sensors_stream"

    def schema(self):
        return _PYDS_SCHEMA

    def simpleStreamReader(self, schema):
        return _SensorStreamReader(self.options)


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    rows: int


class _JsonlWriter(DataSourceWriter):
    """One JSONL file per task; the driver-side commit writes a
    _SUCCESS marker listing the committed files (the two-phase-commit
    shape real sinks implement)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("graft_jsonl requires option 'path'")

    def write(self, iterator):
        import json

        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(path=out, rows=n)

    def commit(self, messages):
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            for m in messages:
                fh.write(f"{os.path.basename(m.path)}\t{m.rows}\n")

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlSink(DataSource):
    @classmethod
    def name(cls):
        return "graft_jsonl"

    def schema(self):
        return "ignored string"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options)


def _register(spark: SparkSession, *classes) -> None:
    # a reader that implements pushFilters() refuses to initialize at
    # all unless the pushdown conf is on (runtime-settable, like the
    # nanosAsLong conf in session.ensure_conf)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    for cls in classes:
        spark.dataSource.register(cls)


def q_pyds_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read through a registered Python Data Source: per-sensor
    count + exact integer value sum over the 8-partition deterministic
    generator. The oracle reproduces the LCG arithmetic over
    range(PYDS_N) — value-exact, no floats anywhere."""
    _register(spark, SensorSource)
    df = spark.read.format("graft_sensors").load()
    return (
        df.groupBy("sensor")
        .agg(F.count("*").alias("n"), F.sum("val").alias("sum_val"))
        .orderBy("sensor")
    )


ORACLE_PYDS_READ = f"""
SELECT i % {PYDS_SENSORS} AS sensor,
       COUNT(*) AS n,
       CAST(SUM(((i * {PYDS_A} + {PYDS_B}) % {PYDS_M}) % {PYDS_VMAX}) AS BIGINT)
         AS sum_val
FROM range({PYDS_N}) t(i)
GROUP BY 1 ORDER BY 1
"""


def q_pyds_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushdown into a Python Data Source: the `part >= 6`
    predicate reaches _SensorReader.pushFilters, which prunes the scan
    to 2 of 8 partitions BEFORE tasks launch (asserted in
    tests/test_pysource.py via the scan's partition count — the same
    contract as parquet partition pruning). Requires the runtime conf
    spark.sql.python.filterPushdown.enabled."""
    _register(spark, SensorSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = spark.read.format("graft_sensors").load()
    return (
        df.filter(F.col("part") >= 6)
        .groupBy("part")
        .agg(
            F.count("*").alias("n"),
            F.sum("val").alias("sum_val"),
            F.min("i").alias("min_i"),
            F.max("i").alias("max_i"),
        )
        .orderBy("part")
    )


ORACLE_PYDS_PUSHDOWN = f"""
SELECT i // {_ROWS_PER_PART} AS part,
       COUNT(*) AS n,
       CAST(SUM(((i * {PYDS_A} + {PYDS_B}) % {PYDS_M}) % {PYDS_VMAX}) AS BIGINT)
         AS sum_val,
       MIN(i) AS min_i, MAX(i) AS max_i
FROM range({PYDS_N}) t(i)
WHERE i // {_ROWS_PER_PART} >= 6
GROUP BY 1 ORDER BY 1
"""


def q_pyds_arrow_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batch lane of the Python Data Source read: the reader
    yields pyarrow RecordBatches (zero-copy into Spark) instead of
    Python tuples. Same content, so the same class of oracle — plus a
    distinct-count to touch a second aggregate shape."""
    _register(spark, SensorArrowSource)
    df = spark.read.format("graft_sensors_arrow").load()
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("sensor").alias("n_sensors"),
        F.sum("val").alias("sum_val"),
        F.max("i").alias("max_i"),
    )


ORACLE_PYDS_ARROW_READ = f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT i % {PYDS_SENSORS}) AS n_sensors,
       CAST(SUM(((i * {PYDS_A} + {PYDS_B}) % {PYDS_M}) % {PYDS_VMAX}) AS BIGINT)
         AS sum_val,
       MAX(i) AS max_i
FROM range({PYDS_N}) t(i)
"""


def committed_files(sink: str) -> list[str]:
    """The files a reader of a graft_jsonl sink may trust: exactly the
    ones listed in the _SUCCESS manifest _JsonlWriter.commit wrote.
    Orphan part files from failed or speculative task attempts sit in
    the same directory but never appear in the manifest, so a
    manifest-driven read is what makes the two-phase commit
    exactly-once on the READ side too (r8 ADVICE: the old bare
    `sink/*.jsonl` glob would have silently counted them)."""
    with open(os.path.join(sink, "_SUCCESS")) as fh:
        return [
            os.path.join(sink, line.split("\t", 1)[0])
            for line in fh
            if line.strip()
        ]


def _ensure_jvm_active_session(spark: SparkSession) -> None:
    """The JVM write path resolves Python data sources through the
    ACTIVE session's manager, not the DataFrame's own — under a
    multi-session test harness (spark.newSession per thread) a
    registration on `spark` would otherwise be invisible to .save().
    Probe the public API first and only then poke the private Spark-4
    classic entry point, guarded: under Spark Connect there is no
    `_jvm` at all, and the classic class may move across versions —
    in both cases the common already-active path needs no poke."""
    try:
        active = SparkSession.getActiveSession()
        if active is not None and active._jsparkSession == spark._jsparkSession:
            return
        spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
            spark._jsparkSession
        )
    except AttributeError:
        pass


def q_pyds_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python Data Source WRITER round-trip: orders keys/priorities go
    out through the graft_jsonl sink (one file per task + driver-side
    _SUCCESS commit), come back via spark.read.json over the files the
    MANIFEST lists (never a directory glob), and aggregate per
    priority — the oracle computes the same aggregate straight from
    orders, so any row lost or duplicated by the writer breaks the
    hash match. The per-priority aggregate is ≤5 rows, so it is
    materialized before the temp sink is removed (try/finally — the
    r8 ADVICE leak) and re-wrapped with an explicit schema."""
    _register(spark, JsonlSink)
    _ensure_jvm_active_session(spark)
    sink = tempfile.mkdtemp(prefix="graft_jsonl_")
    try:
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.format("graft_jsonl")
            .option("path", sink)
            .mode("append")
            .save()
        )
        back = spark.read.schema("o_orderkey long, o_orderpriority string").json(
            committed_files(sink)
        )
        rows = (
            back.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"), F.sum("o_orderkey").alias("sum_keys"))
            .orderBy("o_orderpriority")
            .collect()
        )
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    return spark.createDataFrame(
        [(r["o_orderpriority"], r["n_orders"], r["sum_keys"]) for r in rows],
        "o_orderpriority string, n_orders bigint, sum_keys bigint",
    )


ORACLE_PYDS_WRITE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_pyds_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Python Data Source (SimpleDataSourceStreamReader):
    the deterministic sensor stream drains under availableNow in
    PYDS_N/PYDS_STREAM_CHUNK micro-batches into a per-sensor complete-
    mode aggregate — content equals the batch read, so the batch
    oracle applies verbatim (the streaming lane must lose/duplicate
    nothing across offset pulls)."""
    from .streaming import run_to_table

    _register(spark, SensorStreamSource)
    stream = spark.readStream.format("graft_sensors_stream").load()
    agg = (
        stream.groupBy("sensor")
        .agg(F.count("*").alias("n"), F.sum("val").alias("sum_val"))
    )
    out = run_to_table(spark, agg, "complete")
    return out.orderBy("sensor")


ORACLE_PYDS_STREAM = ORACLE_PYDS_READ


QUERIES = {
    "q_pyds_read": q_pyds_read,
    "q_pyds_pushdown": q_pyds_pushdown,
    "q_pyds_arrow_read": q_pyds_arrow_read,
    "q_pyds_write": q_pyds_write,
    "q_pyds_stream": q_pyds_stream,
}

ORACLES = {
    "q_pyds_read": ORACLE_PYDS_READ,
    "q_pyds_pushdown": ORACLE_PYDS_PUSHDOWN,
    "q_pyds_arrow_read": ORACLE_PYDS_ARROW_READ,
    "q_pyds_write": ORACLE_PYDS_WRITE,
    "q_pyds_stream": ORACLE_PYDS_STREAM,
}
