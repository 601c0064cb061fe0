"""Measure the two data-adaptive sizing claims across two corpus sizes
(the r7 verdict's task 6 — both were prose-only claims until now):

1. q_cogroup_udf's bucket count (n_buckets = ⌈n_orders /
   COGROUP_BUCKET_ORDERS⌉, floor 64): at 200k orders the floor holds
   (64 buckets, 3,125 orders each); at 1.28M orders the count doubles
   to 128 so the measured max per-bucket order count stays ≤ the cap —
   under the old fixed 64 it would be 20k and growing O(N). Both runs
   execute end-to-end and must match a Spark relational twin exactly.

2. q_dup_embedding's block count (NB = ⌈n_vecs / DUP_EMB_BLOCK_VECS⌉,
   floor 8): at 30k vectors the floor holds (8 blocks); at 160k NB=16
   and the measured max collect_list block stays ≤ 1.1× the cap. The
   30k corpus (planted duplicate pairs, near-orthogonal d=256 random
   remainder) runs the full tiled GEMM end-to-end TWICE with the cap
   monkeypatched to force NB=8 vs NB=3 and asserts the sorted outputs
   are identical — the "output identical for ANY NB" claim. The 160k
   arm measures the block histogram only (the O(n²d) GEMM is the
   operator's inherent work, not what adaptivity changes — skipping it
   is stated here, not hidden).

Hard asserts throughout; exits non-zero on any violation.
Run: PYTHONPATH=/root/repo python scripts/stress_adaptive.py
"""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from louvain_modularity_spark import llm_ops, pipeline  # noqa: E402
from louvain_modularity_spark.session import get_spark  # noqa: E402


def synth_orders(spark, out_dir, n_orders):
    (
        spark.range(1, n_orders + 1)
        .select(
            F.col("id").alias("o_orderkey"),
            F.concat(F.lit("P"), (F.col("id") % 5).cast("string")).alias(
                "o_orderpriority"
            ),
            (100.0 + (F.col("id") % 1000) / 10.0).alias("o_totalprice"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/orders.parquet")
    )
    # ~2 lines per order; every 7th order has none (exercises the
    # outer-merge branch)
    (
        spark.range(1, n_orders + 1)
        .filter(F.col("id") % 7 != 0)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(F.array(F.lit(1), F.lit(2))).alias("ln"),
        )
        .select(
            "l_orderkey",
            (50.0 + (F.col("l_orderkey") % 500) / 10.0).alias("l_extendedprice"),
            ((F.col("l_orderkey") % 10) / 100.0).alias("l_discount"),
            ((F.col("ln") % 8) / 100.0).alias("l_tax"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/lineitem.parquet")
    )


def cogroup_twin(spark, sf_dir):
    """The relational full-outer-join reconciliation q_cogroup_udf's
    oracle defines, computed Spark-side for size-independent checking."""
    from louvain_modularity_spark.sources import load

    o = load(spark, sf_dir, "orders").groupBy("o_orderkey").agg(
        F.sum(
            (F.round(F.col("o_totalprice").cast("decimal(14,2)"), 2) * 100).cast(
                "long"
            )
        ).alias("o_sum"),
        F.first("o_orderpriority").alias("prio"),
    )
    li = load(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.sum(
            (
                F.round(
                    F.col("l_extendedprice").cast("decimal(14,2)")
                    * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)"))
                    * (F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(4,2)")),
                    2,
                )
                * 100
            ).cast("long")
        ).alias("l_sum")
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "full_outer")
    return (
        j.select(
            F.coalesce("prio", F.lit("(no-order)")).alias("prio"),
            (F.coalesce("o_sum", F.lit(0)) - F.coalesce("l_sum", F.lit(0))).alias(
                "diff_cents"
            ),
            F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("has_lines"),
        )
        .groupBy("prio")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.abs(F.col("diff_cents"))).alias("total_abs_diff_cents"),
            F.sum("has_lines").alias("n_with_lines"),
        )
        .orderBy("prio")
    )


def cogroup_arm(spark, tmp):
    cap = pipeline.COGROUP_BUCKET_ORDERS
    for n_orders in (200_000, 1_280_000):
        d = f"{tmp}/co_{n_orders}"
        synth_orders(spark, d, n_orders)
        nb = max(64, -(-n_orders // cap))
        max_bucket = (
            spark.read.parquet(f"{d}/orders.parquet")
            .groupBy(F.pmod("o_orderkey", F.lit(nb)).alias("b"))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        t0 = time.time()
        got = sorted(map(tuple, pipeline.q_cogroup_udf(spark, d).collect()))
        dt = time.time() - t0
        want = sorted(map(tuple, cogroup_twin(spark, d).collect()))
        assert got == want, f"cogroup mismatch at {n_orders}: {got[:2]} vs {want[:2]}"
        assert max_bucket <= cap, (
            f"bucket overflow at {n_orders}: max {max_bucket} > cap {cap}"
        )
        print(
            f"cogroup n_orders={n_orders}: n_buckets={nb} "
            f"max_bucket_orders={max_bucket} (cap {cap}) end_to_end={dt:.2f}s OK"
        )


def synth_embeddings(spark, out_dir, n_vecs, dim=256, planted=10):
    """Deterministic near-orthogonal corpus: seeded N(0,1) rows (at
    d=256 a random pair's cosine is ~N(0, 1/256); the 0.42 threshold
    is 6.7σ, so expected random hits ≈ 0) plus `planted` duplicate
    pairs (vec n-k duplicates vec k) that MUST come back."""
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    for k in range(planted):
        vecs[n_vecs - planted + k] = vecs[k]
    rows = [(int(i), vecs[i].tolist(), int(i % 3)) for i in range(n_vecs)]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/embeddings.parquet")


def gemm_arm(spark, tmp):
    cap = llm_ops.DUP_EMB_BLOCK_VECS
    # small corpus: full end-to-end, NB-invariance, planted-pair recall
    n_small, planted = 30_000, 10
    d_small = f"{tmp}/emb_{n_small}"
    synth_embeddings(spark, d_small, n_small, planted=planted)
    outs = {}
    for forced_cap in (cap, 2_500):  # NB = max(8,3)=8 vs max(8,12)=12
        old = llm_ops.DUP_EMB_BLOCK_VECS
        llm_ops.DUP_EMB_BLOCK_VECS = forced_cap
        try:
            t0 = time.time()
            outs[forced_cap] = sorted(
                map(tuple, llm_ops.q_dup_embedding(spark, d_small).collect())
            )
            dt = time.time() - t0
        finally:
            llm_ops.DUP_EMB_BLOCK_VECS = old
        nb = max(8, -(-n_small // forced_cap))
        print(
            f"dup_embedding n_vecs={n_small} cap={forced_cap}: NB={nb} "
            f"pairs={len(outs[forced_cap])} end_to_end={dt:.2f}s"
        )
    caps = list(outs)
    assert outs[caps[0]] == outs[caps[1]], "output differs across NB choices"
    got_pairs = {(a, b) for a, b, _ in outs[caps[0]]}
    want_planted = {
        (k, n_small - planted + k) for k in range(planted)
    }
    assert want_planted <= got_pairs, (
        f"planted duplicates missing: {sorted(want_planted - got_pairs)[:5]}"
    )
    # large corpus: adaptivity + block boundedness (the O(n²d) GEMM is
    # the operator's inherent work — unchanged by NB — so this arm
    # measures the block histogram, not the full tile pass)
    n_large = 160_000
    d_large = f"{tmp}/emb_{n_large}"
    synth_embeddings(spark, d_large, n_large, planted=0)
    nb_large = max(8, -(-n_large // cap))
    max_block = (
        spark.read.parquet(f"{d_large}/embeddings.parquet")
        .groupBy(F.pmod(F.xxhash64("vec_id"), F.lit(nb_large)).alias("blk"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert nb_large == 16, nb_large
    assert max_block <= 1.1 * cap, (
        f"block overflow at {n_large}: max {max_block} > 1.1x cap {cap}"
    )
    print(
        f"dup_embedding n_vecs={n_large}: NB={nb_large} "
        f"max_block_vecs={max_block} (cap {cap}, fixed NB=8 would give "
        f"{-(-n_large // 8)}) OK"
    )


def main():
    spark = get_spark("stress-adaptive")
    tmp = tempfile.mkdtemp(prefix="stress_adaptive_")
    try:
        cogroup_arm(spark, tmp)
        gemm_arm(spark, tmp)
        print("all adaptive-sizing claims hold")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
