"""TPC-H-shaped multi-join workloads (public TPC-H spec Q3/Q5/Q10 shapes)
and outer-join inline-view NULL semantics (TupleIsNullPredicate parity)."""

from pyspark.sql import functions as F

from impala_spark.queries import SPARK_QUERIES


def test_q3_returns_top10_by_revenue(spark, sf_dir):
    rows = SPARK_QUERIES["tpch_q3_shipping_priority"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_revenue_positive_per_nation(spark, sf_dir):
    rows = SPARK_QUERIES["tpch_q5_local_supplier"](spark, sf_dir).collect()
    assert all(r.revenue > 0 for r in rows)


def test_q10_limit_and_ordering(spark, sf_dir):
    rows = SPARK_QUERIES["tpch_q10_returned_items"](spark, sf_dir).collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_dims_broadcast_in_plan(spark, sf_dir):
    df = SPARK_QUERIES["tpch_q5_local_supplier"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_outer_join_inline_view_null_not_zero(spark, sf_dir):
    df = SPARK_QUERIES["outer_join_inline_view_nulls"](spark, sf_dir)
    # customers with no orders must show NULL (never 0) — Impala
    # TupleIsNullPredicate semantics; 0 would mean a coalesce snuck in
    assert df.filter(F.col("n_orders") == 0).count() == 0


def test_insert_append_keeps_base_rows(spark, sf_dir):
    r = SPARK_QUERIES["ddl_insert_append"](spark, sf_dir).first()
    assert r.n == 8 and r.n_sources == 2


ALL_TPCH = [
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_shipping_priority_counts", "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue", "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier", "tpch_q17_small_quantity",
    "tpch_q18_large_volume", "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion", "tpch_q21_suppliers_waiting",
    "tpch_q22_global_sales",
]


def test_full_tpch_suite_registered():
    # Q1 is pricing_summary; the other 21 carry tpch_* names.
    assert "pricing_summary" in SPARK_QUERIES
    for name in ALL_TPCH:
        assert name in SPARK_QUERIES, name


import pytest  # noqa: E402


@pytest.mark.parametrize("name", ALL_TPCH)
def test_tpch_plan_no_cartesian(spark, sf_dir, name):
    """The reference's PlannerTest pins join strategies per TPC-H query;
    our invariant: no query shape ever degenerates to a cartesian
    product, and every multi-join query broadcasts at least one side at
    test scale (dims are far below the autoBroadcast threshold)."""
    df = SPARK_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    ["tpch_q2_min_cost_supplier", "tpch_q7_volume_shipping",
     "tpch_q8_market_share", "tpch_q9_product_profit",
     "tpch_q21_suppliers_waiting"],
)
def test_tpch_dim_joins_broadcast(spark, sf_dir, name):
    df = SPARK_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, name


@pytest.mark.parametrize("name", ALL_TPCH)
def test_tpch_runs_nonempty_schema(spark, sf_dir, name):
    df = SPARK_QUERIES[name](spark, sf_dir)
    assert df.columns  # stable schema
    df.limit(1).collect()


_TPCDS_ALL = [n for n in SPARK_QUERIES if n.startswith("tpcds_")]


@pytest.mark.parametrize("name", _TPCDS_ALL)
def test_tpcds_plan_no_cartesian(spark, sf_dir, name):
    """TPC-DS shape suite: correlated subqueries must decorrelate into
    joins (never a cartesian), mirroring the reference's tpcds-all
    planner goldens. Every plan must also keep at least one whole-stage
    codegen region ("*(n)" in the tree) — a query falling out of
    codegen entirely is the classic silent 10x at scale."""
    df = SPARK_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "*(" in plan, f"{name}: no whole-stage codegen region"


def test_tpcds_suite_runs_61_shapes(spark, sf_dir):
    # 22 through r10; +23 in r11 (q4/q13/q28/q31/q32/q35/q37/q39/q40/q46/
    # q48/q49/q50/q58/q69/q71/q72/q75/q77/q84/q89/q93/q97); +9 in r12
    # over derived analog CTEs (q21/q29/q41/q44/q47/q66/q78/q82/q85);
    # +q64 (the cross_sales composite, r12); +6 closing the suite
    # (q2/q16/q24/q43/q54/q95) — every remaining tpcds query is either
    # analyzer-rejected grammar (ROLLUP/GROUPING SETS/INTERSECT/EXCEPT,
    # OR-subqueries q10, select-list subqueries q9: 15 queries) or a
    # channel twin of a ported shape (23 queries); 61 + 15 + 23 = 99.
    assert len(_TPCDS_ALL) == 61


@pytest.mark.parametrize(
    "name",
    ["tpch_q3_shipping_priority", "tpch_q5_local_supplier",
     "tpch_q10_returned_items", "join_fact_fact"],
)
def test_fact_joins_are_hash_not_sort_merge(spark, sf_dir, name):
    """r6 engine posture (preferSortMergeJoin=false): fact-fact joins
    plan as ShuffledHashJoin like the reference's PARTITIONED hash join
    (P/DistributedPlanner.java) — the sort stages of SMJ were the
    dominant cost at sf10 (13.2 -> 3.5s on q3). A SortMergeJoin
    appearing here means the engine regressed to the sorting plan."""
    df = SPARK_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, name
    assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, name
