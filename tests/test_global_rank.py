"""Two-pass global rank (r12, VERDICT r11 #4): an unpartitioned ranking
window serializes its whole input through one task (WindowExec "No
Partition Defined"); operators.global_rank splits it into a range
exchange + slice-local windows + a broadcast offset join, and the
engine routes gated statements through it (rewrites.parse_global_rank).

Correctness notes the tests pin:
- partition-id consistency is pinned by localCheckpoint, NOT by
  Catalyst exchange reuse (column pruning can differentiate the
  consumer subtrees; an un-reused range exchange re-samples bounds —
  reproduced with a pure-SQL CTE spelling of the same plan);
- peers co-locate because range partitioning assigns by VALUE, so
  local rank + rows-before-slice is exact for ANY direction mix once
  the partitioning key decides cross-partition comparisons;
- Impala null ordering (ASC -> NULLS LAST, DESC -> NULLS FIRST) is
  replicated on the DataFrame path, matching the translate shim.
"""

import random
import re

import pytest

from impala_spark.rewrites import parse_global_rank

SF_001 = "/root/testdata/sf0.001"
SF_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from impala_spark.session import get_spark

    s = get_spark("impala_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.fixture(scope="module")
def tview(spark):
    random.seed(5)
    rows = [
        (
            random.choice(["a", "b", "c", None]),
            random.choice([1, 2, 3, None]),
            random.randrange(6),
        )
        for _ in range(5000)
    ]
    spark.createDataFrame(rows, "k string, g int, v int") \
        .createOrReplaceTempView("grk_t")
    return "grk_t"


# ---------------------------------------------------------------------------
# parse routing
# ---------------------------------------------------------------------------

PARSES = [
    "SELECT k, v, RANK() OVER (ORDER BY v) AS r FROM t",
    "SELECT k, v, DENSE_RANK() OVER (ORDER BY v DESC, k) AS r FROM t",
    "SELECT k, CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) AS r FROM t",
    "SELECT k, COUNT(*) AS n, RANK() OVER (ORDER BY COUNT(*) DESC) AS r"
    " FROM t GROUP BY k HAVING COUNT(*) > 1 ORDER BY r LIMIT 5",
    "WITH c AS (SELECT * FROM t) SELECT k, RANK() OVER (ORDER BY v) AS r"
    " FROM c",
]

BAILS = [
    # partitioned windows are already parallel — out of scope
    "SELECT k, RANK() OVER (PARTITION BY k ORDER BY v) AS r FROM t",
    # two global windows
    "SELECT RANK() OVER (ORDER BY v) AS a, ROW_NUMBER() OVER (ORDER BY v)"
    " AS b FROM t",
    # window aggregate (not a ranking fn)
    "SELECT k, SUM(v) OVER (ORDER BY k) AS s FROM t",
    # frame / NULLS modifiers stay conservative
    "SELECT k, RANK() OVER (ORDER BY v NULLS FIRST) AS r FROM t",
    # window buried in an expression (only the bare/CAST item rewrites)
    "SELECT k, RANK() OVER (ORDER BY v) + 1 AS r FROM t",
    # outer ORDER BY on a non-alias expression
    "SELECT k, RANK() OVER (ORDER BY v) AS r FROM t ORDER BY v + 1",
    # nondeterministic input would be re-evaluated inconsistently
    "SELECT k, RANK() OVER (ORDER BY v) AS r FROM t WHERE rand() < 0.5",
]


def test_parse_routing():
    for q in PARSES:
        assert parse_global_rank(q) is not None, q
    for q in BAILS:
        assert parse_global_rank(q) is None, q


# ---------------------------------------------------------------------------
# operator equivalence vs the single-window plan
# ---------------------------------------------------------------------------

def test_operator_matches_single_window(spark, tview):
    """All three kinds, all direction mixes, NULL keys, and a
    low-cardinality order key (6 values over 5000 rows x 8 slices — the
    peer-splitting trap) against the plain Window.orderBy plan."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from impala_spark.operators import global_rank

    df = spark.table(tview)
    cases = [
        ("rank", [("v", False)]),
        ("rank", [("v", True), ("k", False)]),
        ("dense_rank", [("v", True)]),
        ("dense_rank", [("g", False)]),
        ("row_number", [("v", False), ("k", False), ("g", False)]),
    ]
    fns = {
        "rank": F.rank, "dense_rank": F.dense_rank,
        "row_number": F.row_number,
    }
    for kind, keys in cases:
        sort_cols = [
            F.col(c).desc_nulls_first() if d else F.col(c).asc_nulls_last()
            for c, d in keys
        ]
        uniform = len({d for _c, d in keys}) == 1
        got = global_rank(
            df, sort_cols,
            partition_order_by=sort_cols if uniform else sort_cols[:1],
            kind=kind, out_col="r", num_partitions=8,
        )
        ref = df.withColumn("r", fns[kind]().over(Window.orderBy(*sort_cols)))
        a = sorted(map(tuple, got.collect()), key=str)
        b = sorted(map(tuple, ref.collect()), key=str)
        assert a == b, (kind, keys, a[:3], b[:3])
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert not re.findall(r"Window \[[^\]]*\], \[\]", plan), (kind, keys)


# ---------------------------------------------------------------------------
# engine integration: gated, plan-asserted, order-preserving
# ---------------------------------------------------------------------------

def test_engine_global_rank_gated(spark, tview, monkeypatch):
    import impala_spark.rewrites as RW

    from impala_spark.engine import ImpalaEngine

    q = (
        "SELECT k, g, v, RANK() OVER (ORDER BY v DESC, k) AS r"
        " FROM grk_t ORDER BY r LIMIT 50"
    )
    default_rows = list(
        map(tuple, ImpalaEngine(spark, sf_dir=SF_001).sql(q).collect())
    )
    monkeypatch.setattr(RW, "GLOBAL_RANK_MIN_INPUT_BYTES", 0)
    df = ImpalaEngine(spark, sf_dir=SF_001).sql(q)
    rows = list(map(tuple, df.collect()))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.findall(r"Window \[[^\]]*\], \[\]", plan), plan[:600]
    assert df.columns == ["k", "g", "v", "r"]
    # ORDER BY r has ties below LIMIT — compare the deterministic prefix
    assert sorted(rows, key=str) == sorted(default_rows, key=str) or \
        [r[3] for r in rows] == [r[3] for r in default_rows]


def test_engine_chained_distinct_and_rank(spark, monkeypatch):
    """The named r11 watch-item: a ranking window over a multi-distinct
    aggregation — the distinct rewrite removes the Expand, the rank
    rewrite removes the single-task window, in ONE statement."""
    import impala_spark.rewrites as RW

    from impala_spark.engine import ImpalaEngine

    q = (
        "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS nc,"
        " COUNT(DISTINCT o_orderstatus) AS ns,"
        " RANK() OVER (ORDER BY COUNT(DISTINCT o_custkey) DESC,"
        " o_orderpriority) AS rnk"
        " FROM orders GROUP BY o_orderpriority ORDER BY rnk"
    )
    default_rows = list(
        map(tuple, ImpalaEngine(spark, sf_dir=SF_01).sql(q).collect())
    )
    monkeypatch.setattr(RW, "TWO_LEVEL_DISTINCT_MIN_INPUT_BYTES", 0)
    monkeypatch.setattr(RW, "GLOBAL_RANK_MIN_INPUT_BYTES", 0)
    df = ImpalaEngine(spark, sf_dir=SF_01).sql(q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert not re.findall(r"Window \[[^\]]*\], \[\]", plan), plan[:600]
    assert df.columns == ["o_orderpriority", "nc", "ns", "rnk"]
    assert list(map(tuple, df.collect())) == default_rows  # exact order


def test_engine_explain_reflects_rank_rewrite(spark, tview, monkeypatch):
    import impala_spark.rewrites as RW

    from impala_spark.engine import ImpalaEngine

    q = "SELECT k, v, RANK() OVER (ORDER BY v) AS r FROM grk_t"
    below = ImpalaEngine(spark, sf_dir=SF_001).explain(q)
    monkeypatch.setattr(RW, "GLOBAL_RANK_MIN_INPUT_BYTES", 0)
    above = ImpalaEngine(spark, sf_dir=SF_001).explain(q)
    assert above != below
    assert "__wo" not in above and "__grank" not in above
