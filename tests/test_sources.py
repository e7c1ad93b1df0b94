"""Multi-format source/sink layer (planner/HdfsScanNode.java:61-96,
planner/HdfsTableSink.java; catalog/HdfsPartition.java format descriptor)."""

import os

import pytest

from impala_spark import sources
from impala_spark.session import table


@pytest.mark.parametrize("fmt", ["PARQUET", "ORC", "TEXTFILE", "CSV", "JSON"])
def test_round_trip_lossless(spark, sf_dir, tmp_path, fmt):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = os.path.join(str(tmp_path), fmt.lower())
    sources.write_table(o, path, fmt)
    back = sources.read_table(
        spark, path, fmt,
        schema="o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    assert back.count() == o.count()
    a = {(r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 2)) for r in o.collect()}
    b = {(r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 2)) for r in back.collect()}
    assert a == b


def test_columnar_formats_get_pushdown(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = os.path.join(str(tmp_path), "orc_pushdown")
    sources.write_table(o, path, "ORC")
    df = sources.read_table(spark, path, "ORC").filter("o_orderkey = 7")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]" in plan


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = os.path.join(str(tmp_path), "part_parquet")
    sources.write_table(o, path, "PARQUET", partition_by=["o_orderstatus"])
    df = sources.read_table(spark, path, "PARQUET").filter("o_orderstatus = 'O'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:120]


def test_unsupported_formats_fail_loudly():
    with pytest.raises(ValueError, match="SEQUENCEFILE"):
        sources.format_spec("sequencefile")
    with pytest.raises(ValueError, match="unknown storage format"):
        sources.format_spec("wat")


def test_textfile_uses_impala_delimiter(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "nation")
    path = os.path.join(str(tmp_path), "textfile")
    sources.write_table(o.select("n_nationkey", "n_name"), path, "TEXTFILE")
    files = [f for f in os.listdir(path) if f.startswith("part-")]
    body = open(os.path.join(path, files[0])).read()
    assert "\x01" in body  # Impala's default field terminator


def test_textfile_malformed_rows_read_permissive(spark, tmp_path):
    """Impala TEXTFILE scans turn unparseable numerics into NULL and keep
    going; Spark's csv PERMISSIVE mode (default) matches — a malformed
    row must not fail the scan."""
    import os

    p = str(tmp_path / "malformed")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.csv"), "w") as f:
        f.write("1\x01good\x0110.5\n")
        f.write("oops\x01bad-int\x01not-a-number\n")
        f.write("3\x01fine\x012.5\n")
    df = sources.read_table(
        spark, p, "TEXTFILE", schema="id bigint, name string, val double"
    )
    rows = df.collect()
    assert len(rows) == 3
    by_name = {r.name: r for r in rows}
    assert by_name["good"].id == 1
    assert by_name["bad-int"].id is None and by_name["bad-int"].val is None


def test_register_tables_memo_repoints_after_ddl_shadow(spark, sf_dir):
    """register_tables skips re-pointing when the session's views already
    point at the requested sf_dir (r12 optimization: 87 ms/call of py4j
    round trips saved per query invocation) — but a managed table that
    shadows or drops a fixture-named view must invalidate the memo so the
    next register_tables restores last-one-wins semantics."""
    from impala_spark import ddl
    from impala_spark.engine import ImpalaEngine
    from impala_spark.session import register_tables

    eng = ImpalaEngine(spark, sf_dir)
    n_fixture = spark.sql("SELECT count(*) AS c FROM nation").collect()[0].c
    # memoized call: views untouched, same answer
    register_tables(spark, sf_dir)
    assert spark.sql("SELECT count(*) AS c FROM nation").collect()[0].c == n_fixture

    eng.sql("CREATE TABLE nation (x INT)")
    try:
        shadowed = spark.sql("SELECT * FROM nation")
        assert shadowed.columns == ["x"]
        # shadow invalidated the memo: re-register restores the fixture
        register_tables(spark, sf_dir)
        assert (
            spark.sql("SELECT count(*) AS c FROM nation").collect()[0].c
            == n_fixture
        )
    finally:
        ddl.drop_table(spark, "nation")
    register_tables(spark, sf_dir)
    assert spark.sql("SELECT count(*) AS c FROM nation").collect()[0].c == n_fixture
