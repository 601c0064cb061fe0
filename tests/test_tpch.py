"""Plan-shape guards for the TPC-H pack (tpch.py): these queries exist
to pin the decision-support shapes — decorrelated subqueries, top-k
without global sort, broadcast dims — so the tests assert the physical
plan, not just values (value parity is covered by run_parity.py).
"""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_decorrelates_to_semi_join(spark):
    """Catalyst must rewrite the correlated EXISTS into a semi join —
    no per-row subquery node may survive in the physical plan."""
    from louvain_modularity_spark.tpch import q_tpch_q4

    plan = _plan(q_tpch_q4(spark, SF))
    assert "LeftSemi" in plan
    assert "Subquery" not in plan


def test_q17_scalar_subquery_decorrelates_to_aggregate_join(spark):
    """The correlated scalar AVG becomes a per-partkey aggregate joined
    back — the plan has ≥2 HashAggregates (threshold agg + outer sum)
    and no surviving correlated subquery."""
    from louvain_modularity_spark.tpch import q_tpch_q17

    plan = _plan(q_tpch_q17(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "Subquery" not in plan


def test_q3_q10_topk_and_broadcast(spark):
    from louvain_modularity_spark.tpch import q_tpch_q3, q_tpch_q10

    p3 = _plan(q_tpch_q3(spark, SF))
    assert "TakeOrderedAndProject" in p3
    p10 = _plan(q_tpch_q10(spark, SF))
    assert "TakeOrderedAndProject" in p10
    assert "BroadcastHashJoin" in p10  # nation dim never shuffles the fact side


def test_q18_aggregates_before_joining(spark):
    """The HAVING-gated quantity aggregate must run below the joins in
    the plan tree (aggregate → filter → join ordering)."""
    from louvain_modularity_spark.tpch import q_tpch_q18

    plan = _plan(q_tpch_q18(spark, SF))
    # the string plan prints top-down: first join appears above the
    # final-mode HashAggregate that feeds it
    first_join = min(
        i for i in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin")) if i >= 0
    )
    agg = plan.find("HashAggregate")
    assert agg >= 0 and first_join >= 0
    # top-down plan print: the feeding HashAggregate must appear
    # below/after the first join, i.e. the aggregate runs first
    assert agg > first_join
    assert "sum_qty" in plan[: plan.find("Scan")]  # projected through the top


def test_unpivot_is_narrow_expand(spark):
    """unpivot lowers to an Expand node with no exchange between the
    aggregate and the output — the melt itself is shuffle-free."""
    from louvain_modularity_spark.tpch import q_unpivot_metrics

    plan = _plan(q_unpivot_metrics(spark, SF))
    assert "Expand" in plan
    head = plan.split("HashAggregate", 1)[0]
    assert "Exchange" not in head  # nothing shuffles above the final agg


def test_q6_zero_join_single_aggregate(spark):
    """Q6 must be scan→filter→partial/final agg: no join operator of
    any kind in the plan."""
    from louvain_modularity_spark.tpch import q_tpch_q6

    plan = _plan(q_tpch_q6(spark, SF))
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") == 2  # partial + final


def test_q7_q8_snowflake_is_broadcast_plus_one_shuffle(spark):
    """The deep snowflake joins must broadcast every dimension tier and
    shuffle only lineitem⋈orders on the orderkey — one hash exchange
    pair feeding the join, no sort-merge fallback."""
    from louvain_modularity_spark.tpch import q_tpch_q7, q_tpch_q8

    for q in (q_tpch_q7, q_tpch_q8):
        plan = _plan(q(spark, SF))
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert plan.count("BroadcastHashJoin") >= 5, plan


def test_q13_left_join_preserves_zero_order_customers(spark):
    """The outer join must keep customers with no qualifying orders:
    the 0 bucket exists and the bucket counts sum to |customer|."""
    from louvain_modularity_spark.tpch import q_tpch_q13

    rows = {r["c_count"]: r["custdist"] for r in q_tpch_q13(spark, SF).collect()}
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(rows.values()) == n_cust
    assert 0 in rows and rows[0] > 0


def test_q20_q21_decorrelate_fully(spark):
    """The nested-IN (Q20) and EXISTS/NOT-EXISTS pair (Q21) must lower
    to join operators — no per-row subquery node may survive in the
    physical plan."""
    from louvain_modularity_spark.tpch import q_tpch_q20, q_tpch_q21

    for q in (q_tpch_q20, q_tpch_q21):
        plan = _plan(q(spark, SF))
        assert "Subquery" not in plan, plan
        assert "LeftSemi" in plan or "LeftAnti" in plan, plan


def test_q17_threshold_is_order_independent(spark):
    """The 0.2*mean threshold must be exact: quantities are
    integer-valued so the double SUM is exact regardless of partition
    order — re-running with different parallelism gives identical
    results."""
    from louvain_modularity_spark.tpch import q_tpch_q17

    a = q_tpch_q17(spark, SF).collect()[0][0]
    one = (
        q_tpch_q17(spark, SF)
        .coalesce(1)
        .collect()[0][0]
    )
    assert a == one
