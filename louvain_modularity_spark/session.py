"""SparkSession construction and per-session runtime configuration.

The driver harness supplies its own SparkSession to ``queries()``
callables, so anything the engine needs MUST be a *runtime-settable*
conf applied via :func:`ensure_conf` — never assumed at build time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# - nanosAsLong: earlier harness vintages stored events.ts as parquet
#   TIMESTAMP(NANOS), which Spark 4 cannot map to a Catalyst type; with
#   this legacy conf such a column reads as LONG (nanoseconds since
#   epoch) and sources.ts_us_expr converts arithmetically. Harmless for
#   the current TIMESTAMP(MICROS) encoding.
# - session.timeZone=UTC: engine convention — naive (NTZ) timestamps
#   are UTC wall clocks, so NTZ→LTZ casts are identity instants and
#   every date/epoch function agrees with the DuckDB oracle, which
#   evaluates naive timestamps the same way.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs the engine depends on (idempotent)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)
    return spark


def get_spark(
    app_name: str = "louvain-modularity-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Local-mode session factory used by tests and bench.py.

    Scale notes (100 TB): on a real cluster these builder confs move to
    spark-submit; the important ones are AQE (runtime re-plan, skew-join
    splitting) and a shuffle partition count sized so post-shuffle
    partitions are ~128-256 MB. Locally we default to the CPU count.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return ensure_conf(spark)
