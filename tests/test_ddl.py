"""DDL/write-path tests (reference: analysis/InsertStmt.java,
analysis/ModifyStmt.java, sql-parser.cup TRUNCATE/LOAD DATA)."""

import os

import pytest
from pyspark.sql import functions as F

from impala_spark import ddl


@pytest.fixture(autouse=True)
def cleanup(spark):
    yield
    for t in list(ddl._REGISTRY):
        if t.startswith("t_"):
            ddl.drop_table(spark, t)


def test_ctas_and_readback(spark):
    ddl.create_table_as_select(spark, "t_seg", "SELECT DISTINCT c_mktsegment FROM customer")
    assert spark.table("t_seg").count() == 5


def test_ctas_partitioned_layout(spark):
    ddl.create_table_as_select(
        spark, "t_ord", "SELECT o_orderkey, o_orderstatus FROM orders",
        partition_cols=["o_orderstatus"],
    )
    path = ddl._REGISTRY["t_ord"].path
    parts = {p for p in os.listdir(path) if p.startswith("o_orderstatus=")}
    assert len(parts) >= 2  # hive-style partition dirs exist


def test_create_table_like(spark):
    ddl.create_table_like(spark, "t_like", "region")
    assert spark.table("t_like").count() == 0
    assert spark.table("t_like").columns == spark.table("region").columns


def test_insert_append_and_overwrite(spark):
    ddl.create_table_as_select(spark, "t_r", "SELECT * FROM region")
    ddl.insert(spark, "t_r", "SELECT * FROM region")
    assert spark.table("t_r").count() == 10
    ddl.insert(spark, "t_r", "SELECT * FROM region", overwrite=True)
    assert spark.table("t_r").count() == 5


def test_insert_static_partition(spark):
    ddl.create_table_as_select(
        spark, "t_p", "SELECT n_nationkey, 'x' AS tag FROM nation LIMIT 0",
        partition_cols=["tag"],
    )
    ddl.insert(
        spark, "t_p", "SELECT n_nationkey FROM nation WHERE n_nationkey < 3",
        static_partition={"tag": "batch1"},
    )
    got = spark.table("t_p").filter("tag = 'batch1'").count()
    assert got == 3


def test_update_where(spark):
    ddl.create_table_as_select(spark, "t_u", "SELECT * FROM customer", primary_key=["c_custkey"])
    before = spark.table("t_u").filter("c_acctbal > 9000").count()
    ddl.modify(spark, "UPDATE t_u SET c_mktsegment = 'RICH' WHERE c_acctbal > 9000")
    after = spark.table("t_u").filter("c_mktsegment = 'RICH'").count()
    assert after == before


def test_delete_where(spark):
    ddl.create_table_as_select(spark, "t_d", "SELECT * FROM customer")
    total = spark.table("t_d").count()
    doomed = spark.table("t_d").filter("c_acctbal < 0").count()
    ddl.modify(spark, "DELETE FROM t_d WHERE c_acctbal < 0")
    assert spark.table("t_d").count() == total - doomed


def test_upsert_merge(spark):
    ddl.create_table_as_select(
        spark, "t_up", "SELECT n_nationkey, n_name FROM nation", primary_key=["n_nationkey"]
    )
    src = spark.createDataFrame([(0, "ZERO"), (999, "NEW")], "n_nationkey: int, n_name: string")
    ddl.upsert(spark, "t_up", src)
    t = spark.table("t_up")
    assert t.count() == 26
    assert t.filter("n_nationkey = 0").first().n_name == "ZERO"
    assert t.filter("n_nationkey = 999").first().n_name == "NEW"


def test_truncate(spark):
    ddl.create_table_as_select(spark, "t_t", "SELECT * FROM region")
    ddl.truncate(spark, "TRUNCATE TABLE t_t")
    assert spark.table("t_t").count() == 0
    assert len(spark.table("t_t").columns) == 2


def test_load_data(spark, sf_dir):
    ddl.create_table_like(spark, "t_l", "region")
    ddl.load_data(spark, f"LOAD DATA INPATH '{sf_dir}/region.parquet' INTO TABLE t_l")
    assert spark.table("t_l").count() == 5


def test_add_drop_partition_lifecycle(spark, sf_dir):
    import os

    from impala_spark import ddl
    from impala_spark.session import register_tables

    register_tables(spark, sf_dir)
    ddl.drop_table(spark, "t_part_lifecycle")
    ddl.create_table_as_select(
        spark, "t_part_lifecycle",
        "SELECT r_regionkey, r_name FROM region",
        partition_cols=["r_name"],
    )
    t = ddl.table_info("t_part_lifecycle")
    ddl.alter_table(spark, "ALTER TABLE t_part_lifecycle ADD PARTITION (r_name='NOWHERE')")
    assert os.path.isdir(os.path.join(t.path, "r_name=NOWHERE"))
    before = spark.table("t_part_lifecycle").count()
    ddl.alter_table(spark, "ALTER TABLE t_part_lifecycle DROP PARTITION (r_name='ASIA')")
    after = spark.table("t_part_lifecycle").count()
    assert after == before - 1  # one region row per partition


def test_add_partition_rejects_unpartitioned(spark, sf_dir):
    import pytest

    from impala_spark import ddl
    from impala_spark.session import register_tables

    register_tables(spark, sf_dir)
    ddl.drop_table(spark, "t_unpart")
    ddl.create_table_as_select(spark, "t_unpart", "SELECT r_regionkey FROM region")
    with pytest.raises(ValueError, match="not partitioned"):
        ddl.alter_table(spark, "ALTER TABLE t_unpart ADD PARTITION (x='1')")


def test_plain_create_table_with_cols(spark, sf_dir):
    """CREATE TABLE with explicit column defs (sql-parser.cup:2373):
    empty typed table -> partitioned inserts -> PK upsert."""
    from impala_spark.engine import ImpalaEngine

    eng = ImpalaEngine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS plain_t")
    eng.sql(
        "CREATE TABLE plain_t (id BIGINT, name VARCHAR(20), "
        "price DECIMAL(18,4), PRIMARY KEY (id)) "
        "PARTITIONED BY (year INT) STORED AS PARQUET"
    )
    assert spark.table("plain_t").count() == 0
    assert dict(spark.table("plain_t").dtypes) == {
        "id": "bigint", "name": "string", "price": "decimal(18,4)", "year": "int",
    }
    eng.sql("INSERT INTO plain_t PARTITION (year=2026) SELECT 1, 'x', 9.5")
    eng.sql("INSERT INTO plain_t SELECT 2, 'y', CAST(3.25 AS DECIMAL(18,4)), 2025")
    eng.sql("UPSERT INTO plain_t VALUES (2, 'z', CAST(4.0 AS DECIMAL(18,4)), 2025)")
    rows = {r.id: (r.name, float(r.price), r.year) for r in spark.table("plain_t").collect()}
    assert rows == {1: ("x", 9.5, 2026), 2: ("z", 4.0, 2025)}
    # IF NOT EXISTS keeps the table; plain re-create in strict mode errors
    eng.sql("CREATE TABLE IF NOT EXISTS plain_t (a INT)")
    assert spark.table("plain_t").count() == 2
    import pytest as _p

    from impala_spark.engine import ImpalaAnalysisError

    strict = ImpalaEngine(spark, strict=True)
    with _p.raises(ImpalaAnalysisError, match="Table already exists: default.plain_t"):
        strict.sql("CREATE TABLE plain_t (a INT)")
    # unsupported storage format rejected with the sources.py gate
    with _p.raises(ValueError, match="SEQUENCEFILE"):
        eng.sql("CREATE TABLE seq_t (a INT) STORED AS SEQUENCEFILE")
    eng.sql("DROP TABLE plain_t")


def test_create_and_alter_view_through_engine(spark, sf_dir):
    """CREATE VIEW / ALTER VIEW (CreateViewStmt/AlterViewStmt): views are
    session-scoped (fixture tables are temp views) and resolve through
    the catalog; existence errors use the reference's message text."""
    import pytest as _p

    from impala_spark.engine import ImpalaAnalysisError, ImpalaEngine

    eng = ImpalaEngine(spark, sf_dir)
    spark.sql("DROP VIEW IF EXISTS v_probe")
    eng.sql("CREATE VIEW v_probe AS SELECT r_regionkey FROM region")
    assert eng.sql("SELECT count(*) AS n FROM v_probe").first().n == 5
    eng.sql(
        "ALTER VIEW v_probe AS SELECT r_regionkey FROM region WHERE r_regionkey < 2"
    )
    assert eng.sql("SELECT count(*) AS n FROM v_probe").first().n == 2
    # IF NOT EXISTS keeps; strict re-create errors; missing ALTER errors
    eng.sql("CREATE VIEW IF NOT EXISTS v_probe AS SELECT 1 AS x")
    assert eng.sql("SELECT count(*) AS n FROM v_probe").first().n == 2
    strict = ImpalaEngine(spark, strict=True)
    with _p.raises(ImpalaAnalysisError, match="Table already exists: default.v_probe"):
        strict.sql("CREATE VIEW v_probe AS SELECT 1 AS x")
    with _p.raises(ImpalaAnalysisError, match="Table does not exist: default.no_view"):
        eng.sql("ALTER VIEW no_view AS SELECT 1 AS x")
    spark.sql("DROP VIEW IF EXISTS v_probe")
