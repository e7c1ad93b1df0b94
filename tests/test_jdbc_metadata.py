"""HS2/JDBC metadata-operation pins — T/service/JdbcTest.java adapted to
the fixture catalog (tables lineitem/orders/... in `default`; a created
table supplies the decimal/char/complex column shapes the original read
from its functional db). JDBC getInt() renders SQL NULL as 0 — the
original asserts 0 for complex columns' size/digits/radix; here the
values are properly NULL."""

import pytest

from impala_spark.engine import ImpalaEngine

# java.sql.Types constants used by the pins
BOOLEAN, TINYINT, SMALLINT = 16, -6, 5
INTEGER, BIGINT, FLOAT, DOUBLE = 4, -5, 6, 8
TIMESTAMP, VARCHAR, CHAR, DECIMAL = 93, 12, 1, 3
STRUCT, ARRAY = 2002, 2003


@pytest.fixture()
def eng(spark, sf_dir):
    e = ImpalaEngine(spark, sf_dir)
    e.sql("SELECT 1 FROM lineitem LIMIT 1")  # register fixture tables
    return e


# -- testMetaDataGetTables (JdbcTest.java:113-149) ------------------------------

def test_get_tables_patterns(eng):
    for pattern in ("lineitem", "%line_tem"):
        for types in (None, ["TABLE"]):
            rows = eng.get_tables(
                "", "default", pattern, types).collect()
            assert len(rows) == 1
            assert rows[0]["TABLE_NAME"] == "lineitem"
            assert rows[0]["TABLE_TYPE"].lower() == "table"
    # null patterns return at least one row
    assert len(eng.get_tables(None, None, None, None).collect()) >= 1


# -- testMetaDataGetCatalogs (JdbcTest.java:152-159) ----------------------------

def test_get_catalogs_empty(eng):
    df = eng.get_catalogs()
    assert df.columns == ["TABLE_CAT"]
    assert df.count() == 0


# -- testMetaDataGetSchemas (JdbcTest.java:162-174) ------------------------------

def test_get_schemas_pattern(eng):
    df = eng.get_schemas("", "d_f%")
    assert df.columns == ["TABLE_SCHEM", "TABLE_CATALOG"]
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["TABLE_SCHEM"].lower() == "default"


# -- testMetaDataGetTableTypes (JdbcTest.java:177-185) ---------------------------

def test_get_table_types(eng):
    rows = eng.get_table_types().collect()
    assert len(rows) == 1
    assert rows[0][0].lower() == "table"


# -- testMetaDataGetColumns (JdbcTest.java:187-330) -------------------------------

def test_get_columns_pattern_and_scalars(eng):
    eng.sql("CREATE TABLE jdbc_alltypes ("
            "id INT, bool_col BOOLEAN, tinyint_col TINYINT,"
            " smallint_col SMALLINT, int_col INT, bigint_col BIGINT,"
            " float_col FLOAT, double_col DOUBLE, date_string_col STRING,"
            " string_col STRING, timestamp_col TIMESTAMP)")
    try:
        # pattern s%rin% matches string_col only (and date_string_col —
        # the original schema has both; assert on string_col)
        rows = eng.get_columns(None, "default", "jdbc_alltypes",
                               "s%rin%_col").collect()
        names = [r["COLUMN_NAME"] for r in rows]
        assert names == ["string_col"]
        assert rows[0]["ORDINAL_POSITION"] == 10
        assert rows[0]["DATA_TYPE"] == VARCHAR

        def one(col):
            rs = eng.get_columns(None, "default", "jdbc_alltypes",
                                 col).collect()
            assert len(rs) == 1
            return rs[0]

        r = one("bool_col")
        assert r["DATA_TYPE"] == BOOLEAN
        r = one("tinyint_col")
        assert (r["DATA_TYPE"], r["COLUMN_SIZE"], r["DECIMAL_DIGITS"],
                r["NUM_PREC_RADIX"]) == (TINYINT, 3, 0, 10)
        r = one("smallint_col")
        assert (r["DATA_TYPE"], r["COLUMN_SIZE"], r["DECIMAL_DIGITS"],
                r["NUM_PREC_RADIX"]) == (SMALLINT, 5, 0, 10)
        r = one("int_col")
        assert (r["DATA_TYPE"], r["COLUMN_SIZE"], r["DECIMAL_DIGITS"],
                r["NUM_PREC_RADIX"]) == (INTEGER, 10, 0, 10)
        r = one("bigint_col")
        assert (r["DATA_TYPE"], r["COLUMN_SIZE"], r["DECIMAL_DIGITS"],
                r["NUM_PREC_RADIX"]) == (BIGINT, 19, 0, 10)
        r = one("float_col")
        assert (r["DATA_TYPE"], r["COLUMN_SIZE"], r["DECIMAL_DIGITS"],
                r["NUM_PREC_RADIX"]) == (FLOAT, 7, 7, 10)
        r = one("double_col")
        assert (r["DATA_TYPE"], r["COLUMN_SIZE"], r["DECIMAL_DIGITS"],
                r["NUM_PREC_RADIX"]) == (DOUBLE, 15, 15, 10)
        r = one("timestamp_col")
        assert (r["DATA_TYPE"], r["COLUMN_SIZE"],
                r["DECIMAL_DIGITS"]) == (TIMESTAMP, 29, 9)
        assert r["NUM_PREC_RADIX"] is None  # getString() null, not 0

        # null column pattern returns all columns
        assert len(eng.get_columns(
            None, "default", "jdbc_alltypes", None).collect()) == 11
    finally:
        eng.sql("DROP TABLE IF EXISTS jdbc_alltypes")


def test_get_columns_decimal(eng):
    # decimal_tbl shape (functional schema): d1-d6 with these params
    eng.sql("CREATE TABLE jdbc_decimal_tbl (d1 DECIMAL(9,0),"
            " d2 DECIMAL(10,0), d3 DECIMAL(20,10), d4 DECIMAL(38,38),"
            " d5 DECIMAL(10,5), d6 DECIMAL(9,0))")
    try:
        rows = eng.get_columns(None, "default", "jdbc_decimal_tbl",
                               None).collect()
        expected = [(9, 0), (10, 0), (20, 10), (38, 38), (10, 5), (9, 0)]
        assert len(rows) == 6
        for r, (size, digits) in zip(rows, expected):
            assert r["DATA_TYPE"] == DECIMAL
            assert r["COLUMN_SIZE"] == size
            assert r["DECIMAL_DIGITS"] == digits
            assert r["NUM_PREC_RADIX"] == 10
            assert r["TYPE_NAME"] == "DECIMAL"  # bare name for scalars
    finally:
        eng.sql("DROP TABLE IF EXISTS jdbc_decimal_tbl")


def test_get_columns_char_varchar(eng):
    eng.sql("CREATE TABLE jdbc_chars_tiny (cs CHAR(5), cl CHAR(140),"
            " vc VARCHAR(32))")
    try:
        rows = eng.get_columns(None, "default", "jdbc_chars_tiny",
                               None).collect()
        assert [(r["DATA_TYPE"], r["COLUMN_SIZE"]) for r in rows] == [
            (CHAR, 5), (CHAR, 140), (VARCHAR, 32)]
    finally:
        eng.sql("DROP TABLE IF EXISTS jdbc_chars_tiny")


def test_get_columns_complex_types(eng, spark):
    # complex TYPE_NAMEs keep full toSql; DATA_TYPE: STRUCT for structs,
    # ARRAY for both arrays and maps (Hive-consistent,
    # Type.getJavaSqlType). Declared through CREATE TABLE — Spark
    # expressions erase CHAR/VARCHAR, declared column texts do not.
    eng.sql("DROP TABLE IF EXISTS jdbc_complex_type_test")
    eng.sql(
        "CREATE TABLE jdbc_complex_type_test ("
        "s struct<f1:int,f2:char(4),f3:varchar(5),f4:decimal(10,10)>,"
        "a1 array<int>,"
        "a2 array<char(4)>,"
        "a3 array<varchar(5)>,"
        "a4 array<decimal(10,10)>,"
        "m1 map<int,string>,"
        "m2 map<string,char(4)>,"
        "m3 map<bigint,varchar(5)>,"
        "m4 map<boolean,decimal(10,10)>)")
    try:
        rows = eng.get_columns(None, "default", "jdbc_complex_type_test",
                               None).collect()
        by_name = {r["COLUMN_NAME"]: r for r in rows}
        s = by_name["s"]
        assert s["DATA_TYPE"] == STRUCT
        assert s["TYPE_NAME"] == (
            "STRUCT<f1:INT,f2:CHAR(4),f3:VARCHAR(5),f4:DECIMAL(10,10)>")
        assert s["COLUMN_SIZE"] is None  # JDBC getInt reads this as 0
        for name, tn in [("a1", "ARRAY<INT>"), ("a2", "ARRAY<CHAR(4)>"),
                         ("a3", "ARRAY<VARCHAR(5)>"),
                         ("a4", "ARRAY<DECIMAL(10,10)>"),
                         ("m1", "MAP<INT,STRING>"),
                         ("m2", "MAP<STRING,CHAR(4)>"),
                         ("m3", "MAP<BIGINT,VARCHAR(5)>"),
                         ("m4", "MAP<BOOLEAN,DECIMAL(10,10)>")]:
            r = by_name[name]
            assert r["DATA_TYPE"] == ARRAY, name
            assert r["TYPE_NAME"] == tn, name
            assert r["COLUMN_SIZE"] is None
            assert r["DECIMAL_DIGITS"] is None
            assert r["NUM_PREC_RADIX"] is None
    finally:
        eng.sql("DROP TABLE IF EXISTS jdbc_complex_type_test")


# -- testMetaDataGetColumnsMetaData (JdbcTest.java:468-478) -----------------------

def test_get_columns_result_schema(eng):
    df = eng.get_columns(None, "default", "lineitem", None)
    assert df.columns[0] == "TABLE_CAT"
    assert df.columns[16] == "ORDINAL_POSITION"
    assert dict(df.dtypes)["ORDINAL_POSITION"] == "int"
    assert len(df.columns) == 23


# -- testMetaDataGetFunctions (JdbcTest.java:480-503) ------------------------------

def test_get_functions_substring(eng):
    rows = eng.get_functions(None, None, "substring").collect()
    assert len(rows) == 2  # two overloads
    for r in rows:
        assert r["FUNCTION_NAME"].lower() == "substring"
        assert r["FUNCTION_SCHEM"].lower() == "_impala_builtins"
        assert r["SPECIFIC_NAME"].startswith("substring(")
    # builtins are not in the default db
    assert eng.get_functions(None, "default", "substring").count() == 0


# -- FrontendTest.TestGetTypeInfo (18 columns, 11 supported types) ---------------

def test_get_type_info(eng):
    df = eng.get_type_info()
    assert len(df.columns) == 18
    assert df.columns[0] == "TYPE_NAME"
    rows = df.collect()
    # PrimitiveType.values().length - 6 == 11 (INVALID/DATE/DATETIME/
    # DECIMAL/CHAR/VARCHAR excluded)
    assert len(rows) == 11
    by_name = {r["TYPE_NAME"]: r for r in rows}
    assert set(by_name) == {"NULL_TYPE", "BOOLEAN", "TINYINT", "SMALLINT",
                            "INT", "BIGINT", "FLOAT", "DOUBLE",
                            "TIMESTAMP", "STRING", "BINARY"}
    r = by_name["INT"]
    assert (r["DATA_TYPE"], r["PRECISION"], r["NULLABLE"], r["SEARCHABLE"],
            r["NUM_PREC_RADIX"]) == (INTEGER, 10, 1, 3, 10)
    assert r["CASE_SENSITIVE"] is False and r["UNSIGNED_ATTRIBUTE"] is False
    r = by_name["STRING"]
    assert r["DATA_TYPE"] == VARCHAR and r["CASE_SENSITIVE"] is True
    assert r["PRECISION"] is None and r["UNSIGNED_ATTRIBUTE"] is True
