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
