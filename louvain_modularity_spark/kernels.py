"""Reusable distributed order-statistic kernels (r7).

A global ROW_NUMBER / running SUM over a total order is the classic
single-partition-window scale killer: one task sorts every row. These
kernels replace it with the range-chunk + prefix-offset stitch —
range-partition on the sort key (chunk size ~ N / shuffle-partitions,
ascending chunks), compute the statistic locally per chunk, and add a
broadcast prefix over the partition-count-sized chunk-total table.
Pinned bit-exact against Spark's own window operators in
tests/test_analytics.py, and applied in q_rfm, q_gini, q_pareto_abc,
q_seeded_order, q_token_vocab, q_ccnet_bucket, q_spearman
(q_quantile_normalize inlines the same pattern to share one chunking
between its pooled and per-group ranks).

Skew note: every call site's sort key ends in a UNIQUE tiebreak
column, and that is what makes the range chunks balanced even when the
leading key is massively skewed — the range partitioner splits ties on
the unique suffix, so no single value can overfill a chunk. A caller
passing a non-unique sort key would reintroduce the skew the kernel
exists to avoid.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .session import lineage_cut


def chunked_global_rank(df: DataFrame, sort_cols, rank_name: str = "rn") -> DataFrame:
    """Global ROW_NUMBER over a TOTAL order ``sort_cols`` without a
    single-partition window — the reusable distributed-rank kernel
    (r7): range-partition on the sort key (chunk size ≈ N /
    shuffle-partitions by construction, ascending chunks), rank
    locally per chunk, then stitch with a partition-count-sized
    prefix-offset table broadcast back. chunk-prefix + local rank ==
    global rank because range chunks respect the sort order. The
    checkpoint pins ONE materialization of the chunk assignment so the
    rank pass and the count pass can never see different range bounds.
    Used by q_rfm; q_quantile_normalize inlines the same pattern
    because it additionally derives per-group ranks from the same
    chunking."""
    spark = df.sparkSession
    n_chunks = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    r = (
        df.repartitionByRange(n_chunks, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(lineage_cut)
    )
    w_local = Window.partitionBy("_pid").orderBy(*sort_cols)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        r.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .select(
            "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
        )
    )
    return (
        r.join(F.broadcast(off), "_pid")
        .withColumn(rank_name, F.col("_off") + F.row_number().over(w_local))
        .drop("_pid", "_off")
    )


def chunked_running_sum(
    df: DataFrame, sort_cols, val_col: str, out_name: str
) -> DataFrame:
    """Global running SUM of ``val_col`` over a TOTAL order without a
    single-partition window — the prefix-aggregate sibling of
    chunked_global_rank: range-chunk on the sort key, run the sum
    locally per chunk, and add the broadcast prefix of previous
    chunks' totals (the same stitch as q_interval_overlap's day
    carry-in, but with data-adaptive range chunks instead of calendar
    days). Used by q_pareto_abc's cumulative-revenue staircase."""
    spark = df.sparkSession
    n_chunks = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    r = (
        df.repartitionByRange(n_chunks, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(lineage_cut)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        r.groupBy("_pid")
        .agg(F.sum(val_col).alias("_n"))
        .select(
            "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
        )
    )
    return (
        r.join(F.broadcast(off), "_pid")
        .withColumn(out_name, F.col("_off") + F.sum(val_col).over(w_local))
        .drop("_pid", "_off")
    )


def _ntile_expr(rn, n, k: int):
    """Exact SQL NTILE(k) from a global rank and the row count: the
    first n%k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋ — integer
    arithmetic (floor-division operands stay far below 2^53, so the
    double floor is exact), no window."""
    q = F.floor(n / F.lit(k)).cast("long")
    r = (n % F.lit(k)).cast("long")
    head = r * (q + 1)
    return (
        F.when(rn <= head, F.floor((rn - 1) / (q + 1)))
        .otherwise(r + F.floor((rn - head - 1) / q))
        .cast("long")
        + 1
    )

def chunked_group_rank(
    df: DataFrame, group_cols, sort_cols, rank_name: str = "rn"
) -> DataFrame:
    """Per-group ROW_NUMBER over ``sort_cols`` without putting any
    group's full slice in one sorted partition — the group-aware form
    of chunked_global_rank for LOW-CARDINALITY group keys (where
    Window.partitionBy(group) would make each partition
    data-proportional): range-chunk on (group, sort key) so a group
    spans consecutive chunks, rank locally per (chunk, group), and
    stitch with a per-(group, chunk) count table (size ≤ chunks ×
    groups, bounded) carrying each group's prefix across chunks.
    q_quantile_normalize inlines this same pattern; q_spearman uses
    this helper for its per-type arrival ranks."""
    spark = df.sparkSession
    n_chunks = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    group_cols = list(group_cols)
    r = (
        df.repartitionByRange(n_chunks, *(group_cols + list(sort_cols)))
        .withColumn("_pid", F.spark_partition_id())
        .transform(lineage_cut)
    )
    w_local = Window.partitionBy("_pid", *group_cols).orderBy(*sort_cols)
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        r.groupBy("_pid", *group_cols)
        .agg(F.count("*").alias("_n"))
        .select(
            "_pid",
            *group_cols,
            F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    return (
        r.join(F.broadcast(off), ["_pid"] + group_cols)
        .withColumn(rank_name, F.col("_off") + F.row_number().over(w_local))
        .drop("_pid", "_off")
    )

def chunked_exact_quantiles(df: DataFrame, value_col, ps_names) -> DataFrame:
    """EXACT continuous percentiles without the single-buffer
    ``percentile`` aggregate: Spark's exact percentile collects every
    value of the group into ONE aggregation buffer (680M doubles in
    one task at a 100 TB day-pair table — the plan that breaks first).
    Instead rank the values with chunked_global_rank and pick the two
    bracketing order statistics per requested p, interpolating with
    the same (1−g)·x_lo + g·x_hi formula (pos = p·(n−1), g its
    fractional part) the builtin uses — value-identical, distributed.

    ``ps_names`` is a list of (p, output_name); returns a 1-row
    DataFrame with one DOUBLE column per name plus ``n`` (the value
    count). Ties in the value column are harmless: order statistics at
    a position are the same VALUE under any tie ordering."""
    ranked = chunked_global_rank(
        df.select(F.col(value_col).cast("double").alias("_v")).withColumn(
            "_tb", F.monotonically_increasing_id()
        ),
        [F.asc("_v"), F.asc("_tb")],
        "_rn",
    )
    n_tbl = ranked.agg(F.count("*").alias("_n"))
    r2 = ranked.crossJoin(F.broadcast(n_tbl))
    aggs = [F.min("_n").alias("n")]
    for i, (p, _name) in enumerate(ps_names):
        k = F.floor(F.lit(float(p)) * (F.col("_n") - 1).cast("double"))
        aggs.append(
            F.min(F.when(F.col("_rn") == k + 1, F.col("_v"))).alias(f"_lo{i}")
        )
        aggs.append(
            F.min(F.when(F.col("_rn") == k + 2, F.col("_v"))).alias(f"_hi{i}")
        )
    agg = r2.agg(*aggs)
    outs = [F.col("n")]
    for i, (p, name) in enumerate(ps_names):
        pos = F.lit(float(p)) * (F.col("n") - 1).cast("double")
        g = pos - F.floor(pos)
        lo = F.col(f"_lo{i}")
        hi = F.coalesce(F.col(f"_hi{i}"), F.col(f"_lo{i}"))
        outs.append(((F.lit(1.0) - g) * lo + g * hi).alias(name))
    return agg.select(*outs)


def chunked_group_quantiles(
    df: DataFrame, group_cols, value_col, ps_names
) -> DataFrame:
    """Per-group form of chunked_exact_quantiles for LOW-CARDINALITY
    group keys, where the builtin grouped ``percentile`` buffers each
    group's whole slice in one task: group-aware chunked ranks + the
    same bracketing-order-statistic interpolation, one output row per
    group. A synthetic unique tiebreak keeps the range chunks balanced
    when the value domain is tie-heavy (ranks of tied values permute
    identical values, so outputs are unaffected)."""
    group_cols = list(group_cols)
    ranked = chunked_group_rank(
        df.select(
            *group_cols, F.col(value_col).cast("double").alias("_v")
        ).withColumn("_tb", F.monotonically_increasing_id()),
        group_cols,
        [F.asc("_v"), F.asc("_tb")],
        "_rn",
    )
    counts = ranked.groupBy(*group_cols).agg(F.count("*").alias("_n"))
    r2 = ranked.join(F.broadcast(counts), group_cols)
    aggs = [F.min("_n").alias("_n")]
    for i, (p, _name) in enumerate(ps_names):
        k = F.floor(F.lit(float(p)) * (F.col("_n") - 1).cast("double"))
        aggs.append(
            F.min(F.when(F.col("_rn") == k + 1, F.col("_v"))).alias(f"_lo{i}")
        )
        aggs.append(
            F.min(F.when(F.col("_rn") == k + 2, F.col("_v"))).alias(f"_hi{i}")
        )
    agg = r2.groupBy(*group_cols).agg(*aggs)
    outs = list(group_cols)
    for i, (p, name) in enumerate(ps_names):
        pos = F.lit(float(p)) * (F.col("_n") - 1).cast("double")
        g = pos - F.floor(pos)
        lo = F.col(f"_lo{i}")
        hi = F.coalesce(F.col(f"_hi{i}"), F.col(f"_lo{i}"))
        outs.append(((F.lit(1.0) - g) * lo + g * hi).alias(name))
    return agg.select(*outs)
