"""Measure Z-order layout's min/max pruning benefit for 2-D predicates.

q_zorder_layout computes the Morton key and per-bucket extents; this
script measures the END-TO-END claim: a Z-ordered layout prunes files
from footer statistics for predicates on EITHER dimension, where a 1-D
sort only prunes its own sort column.

Method notes: Morton interleaving only balances dimensions that use
the same bit budget, so (as Delta/Iceberg OPTIMIZE do) each dimension
is first RANK-NORMALIZED to 16 bits from its observed range —
interleaving raw values whose ranges differ by 2^5 degenerates toward
a 1-D sort on the wider column (measured: 19/32 files for the box
predicate without normalization vs 10/32 with).

Writes events(x = user_id, y = round(value·100), both scaled to 16
bits) three ways at $SPARK_GRAFT_SF_DIR, 32 files each — unsorted /
sort_x / zorder — then for three predicates (an octant box on both
dims, x-octant only, y-octant only) counts the files whose footer
[min, max] ranges intersect the predicate (what a stats-pruning
reader must read) and times the filtered Spark scan. Results recorded
in SCALE.md §2.

Run: PYTHONPATH=/root/repo python scripts/stress_zorder.py
"""

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from louvain_modularity_spark.relational import _morton_spark
from louvain_modularity_spark.sources import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/.tmp/zorder_stress"
N_FILES = 32
BITS = 16
SCALE = 1 << BITS


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]"
        )
        .appName("stress_zorder")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = load(spark, SF_DIR, "events")
    raw = e.select(
        F.col("user_id").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
        "event_id",
        "event_type",
    )
    mx = raw.agg(F.max("x").alias("xm"), F.max("y").alias("ym")).collect()[0]
    xm, ym = mx["xm"], mx["ym"]
    # TRUE rank normalization (what Delta's OPTIMIZE ZORDER does via
    # range-partition ids): ntile each dimension into the 16-bit
    # budget, so skewed value distributions still fill z-space
    # uniformly — linear max-scaling left y's mass crowded in the low
    # quadrants and y-only pruning barely worked (measured 29/32)
    from pyspark.sql import Window

    wx = Window.orderBy("x")
    wy = Window.orderBy("y")
    base = raw.withColumn(
        "z",
        _morton_spark(
            (F.ntile(SCALE).over(wx) - 1).cast("long"),
            (F.ntile(SCALE).over(wy) - 1).cast("long"),
        ),
    )

    shutil.rmtree(OUT, ignore_errors=True)
    layouts = {
        "unsorted": base.repartition(N_FILES),
        "sort_x": base.repartitionByRange(N_FILES, "x").sortWithinPartitions("x"),
        "zorder": base.repartitionByRange(N_FILES, "z").sortWithinPartitions("z"),
    }
    for name, df in layouts.items():
        df.write.mode("overwrite").parquet(os.path.join(OUT, name))

    # predicate cutoffs at the 12.5th percentile of each dimension —
    # "an octant of the DATA", not of the raw value range (for skewed
    # y, max/8 is a much larger mass fraction and the comparison
    # would be unfair to every layout)
    q = raw.agg(
        F.expr("percentile(x, 0.125)").alias("xq"),
        F.expr("percentile(y, 0.125)").alias("yq"),
    ).collect()[0]
    xq, yq = int(q["xq"]), int(q["yq"])
    preds = {
        "box_xy": (0, xq, 0, yq),
        "x_only": (0, xq, 0, ym),
        "y_only": (0, xm, 0, yq),
    }

    def file_ranges(path):
        out = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.read_metadata(f)
            fx = [float("inf"), float("-inf")]
            fy = [float("inf"), float("-inf")]
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    st = col.statistics
                    if st is None:
                        continue
                    if col.path_in_schema == "x":
                        fx = [min(fx[0], st.min), max(fx[1], st.max)]
                    elif col.path_in_schema == "y":
                        fy = [min(fy[0], st.min), max(fy[1], st.max)]
            out.append((fx, fy))
        return out

    for name in layouts:
        path = os.path.join(OUT, name)
        ranges = file_ranges(path)
        counts = {}
        for pname, (xl, xh, yl, yh) in preds.items():
            counts[pname] = sum(
                1
                for fx, fy in ranges
                if fx[0] <= xh and fx[1] >= xl and fy[0] <= yh and fy[1] >= yl
            )
        xl, xh, yl, yh = preds["box_xy"]
        pred = (
            (F.col("x") >= xl)
            & (F.col("x") <= xh)
            & (F.col("y") >= yl)
            & (F.col("y") <= yh)
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.read.parquet(path).filter(pred).agg(
                F.count("*"), F.sum("event_id")
            ).collect()
            best = min(best, time.time() - t0)
        print(
            f"{name:9s} must_read box={counts['box_xy']}/{len(ranges)}"
            f" x_only={counts['x_only']}/{len(ranges)}"
            f" y_only={counts['y_only']}/{len(ranges)}"
            f" box_scan={best:.3f}s"
        )


if __name__ == "__main__":
    main()
