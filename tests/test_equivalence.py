"""DisjointSet + column-equivalence tests.

The DisjointSet cases mirror
fe/src/test/java/org/apache/impala/util/TestDisjointSet.java
(makeSet / union / bulkUnion / checkConsistency, including set-object
identity sharing and change reporting); the equivalence-class cases
exercise the engine-level analog of the analyzer's equivClassMembers
(A/Analyzer.java:277) over statement text.
"""

import pytest

from impala_spark.equivalence import (
    DisjointSet,
    colocation_advice,
    column_equiv_classes,
)


def test_make_set():
    ds = DisjointSet()
    ds.make_set(1)
    assert 1 in ds.get(1)
    ds.make_set(2)
    assert 2 in ds.get(2)
    ds.check_consistency()

    existing = ds.get(1)
    # manually tamper with the item set for testing purposes
    existing.add(6)
    existing.add(7)
    with pytest.raises(ValueError):
        ds.make_set(1)
    # the failed make_set didn't change the existing set
    assert ds.get(1) is existing and {1, 6, 7} <= existing
    # the tampering is detected
    with pytest.raises(RuntimeError):
        ds.check_consistency()


def test_union():
    ds = DisjointSet()
    ds.make_set(1)
    # idempotence
    assert not ds.union(1, 1)
    assert ds.get(1) == {1}
    ds.check_consistency()

    # creating a new single-item set with union()
    assert ds.union(2, 2)
    assert ds.get(2) == {2}
    ds.check_consistency()

    # creating a multi-item set with union()
    assert ds.union(3, 4)
    assert ds.get(3) is ds.get(4) and 4 in ds.get(3) and 3 in ds.get(4)
    ds.check_consistency()
    assert not ds.union(3, 4)
    ds.check_consistency()

    # merging an existing item set with a non-existent item
    assert ds.union(4, 5)
    assert ds.get(4) is ds.get(5) and {3, 4, 5} <= ds.get(4)
    assert ds.union(6, 4)
    assert ds.get(4) is ds.get(6) and {3, 4, 5, 6} <= ds.get(4)
    assert not ds.union(4, 6)
    ds.check_consistency()

    # merging two existing single-item item sets
    assert ds.union(1, 2)
    assert ds.get(1) is ds.get(2) and {1, 2} <= ds.get(1)
    ds.check_consistency()

    # merging two multi-item item sets
    assert ds.union(1, 3)
    assert ds.get(1) is ds.get(3) and {1, 2, 3, 4, 5, 6} <= ds.get(1)
    for i in range(1, 7):
        for j in range(1, 7):
            assert not ds.union(i, j)
    ds.check_consistency()


def test_bulk_union():
    ds = DisjointSet()
    # creating a new single-item set
    assert ds.bulk_union({1})
    assert ds.get(1) == {1}
    ds.check_consistency()

    # creating a new multi-item item set
    assert ds.bulk_union({2, 3, 4})
    assert ds.get(2) is ds.get(3) and ds.get(2) is ds.get(4)
    assert {2, 3, 4} <= ds.get(2)
    for i in range(2, 5):
        for j in range(2, 5):
            assert not ds.union(i, j)
    ds.check_consistency()

    # bulk_union over existing and new items merges everything
    assert ds.bulk_union([1, 3, 5])
    assert ds.get(1) is ds.get(5) and {1, 2, 3, 4, 5} <= ds.get(1)
    # no-op once merged
    assert not ds.bulk_union([1, 2, 3, 4, 5])
    ds.check_consistency()

    assert not ds.bulk_union([])


def test_get_sets():
    ds = DisjointSet()
    ds.bulk_union({1, 2})
    ds.bulk_union({3, 4})
    sets = sorted(tuple(sorted(s)) for s in ds.get_sets())
    assert sets == [(1, 2), (3, 4)]


# -- column equivalence classes ------------------------------------------------


def test_equiv_classes_join_chain():
    classes = column_equiv_classes(
        """
        SELECT c_name FROM customer c
          JOIN orders o ON c.c_custkey = o.o_custkey
          JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o_orderdate < '1995-03-15'
        """
    )
    assert {"customer.c_custkey", "orders.o_custkey"} in classes
    assert {"orders.o_orderkey", "lineitem.l_orderkey"} in classes


def test_equiv_classes_transitive_where():
    classes = column_equiv_classes(
        "SELECT 1 FROM t1 a, t2 b, t3 c "
        "WHERE a.k = b.k AND b.k = c.k AND a.v > 5"
    )
    assert classes == [{"t1.k", "t2.k", "t3.k"}]


def test_equiv_classes_or_does_not_transfer():
    # equality under OR gives no value transfer (Analyzer.registerConjuncts
    # only registers top-level AND conjuncts)
    classes = column_equiv_classes(
        "SELECT 1 FROM t1 a, t2 b WHERE a.k = b.k OR a.v = b.v"
    )
    assert classes == []


def test_equiv_classes_alias_resolution():
    classes = column_equiv_classes(
        "SELECT 1 FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"
    )
    assert classes == [{"nation.n_regionkey", "region.r_regionkey"}]


def test_equiv_classes_literal_equality_skipped():
    classes = column_equiv_classes(
        "SELECT 1 FROM t1 a JOIN t2 b ON a.k = b.k WHERE a.v = 5"
    )
    assert classes == [{"t1.k", "t2.k"}]


def test_colocation_advice_ranks_by_statement_count():
    workload = [
        "SELECT 1 FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey",
        "SELECT 2 FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "WHERE l.l_tax > 0",
        "SELECT 3 FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey",
    ]
    advice = colocation_advice(workload)
    assert advice[0]["columns"] == ["lineitem.l_orderkey", "orders.o_orderkey"]
    assert advice[0]["tables"] == ["lineitem", "orders"]
    assert advice[0]["statements"] == 2
    assert advice[1]["statements"] == 1


def test_advice_to_bucketed_layout_removes_join_exchange(spark):
    """End-to-end: colocation advice -> PARTITION BY HASH DDL -> the
    workload's join plans with no join-key exchange (the layout the
    advisor exists to recommend; ddl.py hash-bucketed create)."""
    import re

    from impala_spark.engine import ImpalaEngine

    eng = ImpalaEngine(spark, sf_dir="/root/testdata/sf0.001")
    workload = [
        "SELECT o_orderpriority, count(*) FROM orders o JOIN lineitem l "
        "ON o.o_orderkey = l.l_orderkey GROUP BY o_orderpriority",
        "SELECT count(*) FROM orders o JOIN lineitem l "
        "ON o.o_orderkey = l.l_orderkey WHERE l.l_tax > 0",
    ]
    advice = eng.colocation_advice(workload)
    assert advice[0]["statements"] == 2
    top = advice[0]
    # one bucketed table per member column, same bucket count
    names = {}
    for col in top["columns"]:
        tbl, c = col.split(".")
        names[tbl] = f"tb_adv_{tbl}"
        eng.sql(f"DROP TABLE IF EXISTS tb_adv_{tbl}")
        eng.sql(
            f"CREATE TABLE tb_adv_{tbl} PARTITION BY HASH({c}) PARTITIONS 4"
            f" AS SELECT * FROM {tbl}"
        )
    df = eng.sql(
        f"SELECT COUNT(*) AS n FROM {names['orders']} o "
        f"JOIN [shuffle] {names['lineitem']} l ON o.o_orderkey = l.l_orderkey"
    )
    n = df.collect()[0][0]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"Exchange hashpartitioning\((?:o_orderkey|l_orderkey)", plan
    ), plan
    base = spark.sql(
        "SELECT COUNT(*) FROM orders o JOIN lineitem l"
        " ON o.o_orderkey = l.l_orderkey"
    ).collect()[0][0]
    assert n == base
    for t in names.values():
        eng.sql(f"DROP TABLE {t}")


def test_colocation_advice_byte_weighting(spark):
    from impala_spark.engine import ImpalaEngine
    from impala_spark.equivalence import colocation_advice

    # equal coverage: the heavier (fact-fact) class ranks first
    workload = [
        "SELECT 1 FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey",
        "SELECT 2 FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey",
    ]
    sizes = {"orders": 10_000, "lineitem": 50_000, "nation": 10, "region": 5}
    advice = colocation_advice(workload, table_bytes=sizes)
    assert advice[0]["tables"] == ["lineitem", "orders"]
    assert advice[0]["shuffle_bytes_per_use"] == 60_000
    assert advice[1]["shuffle_bytes_per_use"] == 15
    # engine variant fills sizes from its data dir
    eng = ImpalaEngine(spark, "/root/testdata/sf0.001")
    ea = eng.colocation_advice(workload)
    assert ea[0]["tables"] == ["lineitem", "orders"]
    assert ea[0]["shuffle_bytes_per_use"] > ea[1]["shuffle_bytes_per_use"] > 0
