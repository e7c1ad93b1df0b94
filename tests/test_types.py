"""Type-system unit tests (reference: catalog/PrimitiveType.java,
catalog/ScalarType.java, analysis/TypesUtil.java)."""

import pytest
from pyspark.sql import types as T

from impala_spark.types import (
    arithmetic_result_type,
    decimal_arithmetic_result,
    parse_type,
    smallest_int_literal_type,
)


def test_scalar_mappings():
    assert parse_type("BOOLEAN") == T.BooleanType()
    assert parse_type("TINYINT") == T.ByteType()
    assert parse_type("SMALLINT") == T.ShortType()
    assert parse_type("INT") == T.IntegerType()
    assert parse_type("BIGINT") == T.LongType()
    assert parse_type("FLOAT") == T.FloatType()
    assert parse_type("DOUBLE") == T.DoubleType()
    assert parse_type("STRING") == T.StringType()
    assert parse_type("TIMESTAMP") == T.TimestampNTZType()


def test_decimal():
    assert parse_type("DECIMAL(12,3)") == T.DecimalType(12, 3)
    assert parse_type("DECIMAL") == T.DecimalType(9, 0)  # Impala default


def test_decimal_bounds():
    with pytest.raises(ValueError):
        parse_type("DECIMAL(40,0)")  # > max precision 38
    with pytest.raises(ValueError):
        parse_type("DECIMAL(10,11)")  # scale > precision


def test_varchar_char():
    assert parse_type("VARCHAR(10)") == T.VarcharType(10)
    assert parse_type("CHAR(3)") == T.CharType(3)


def test_complex_types():
    assert parse_type("ARRAY<INT>") == T.ArrayType(T.IntegerType())
    assert parse_type("MAP<STRING,DOUBLE>") == T.MapType(T.StringType(), T.DoubleType())
    assert parse_type("ARRAY<MAP<STRING,ARRAY<BIGINT>>>") == T.ArrayType(
        T.MapType(T.StringType(), T.ArrayType(T.LongType()))
    )


def test_literal_inference():
    # analysis/NumericLiteral.java: smallest fitting type
    assert smallest_int_literal_type(1) == T.ByteType()
    assert smallest_int_literal_type(127) == T.ByteType()
    assert smallest_int_literal_type(128) == T.ShortType()
    assert smallest_int_literal_type(40000) == T.IntegerType()
    assert smallest_int_literal_type(2**33) == T.LongType()
    assert smallest_int_literal_type(2**65) == T.DecimalType(38, 0)


def test_decimal_add_result():
    # TypesUtil.getDecimalArithmeticResultType: + keeps max scale, +1 digit
    # int digits = max(10-2, 8-4) = 8; scale = max(2,4) = 4; +1 carry digit
    assert decimal_arithmetic_result("+", 10, 2, 8, 4) == (13, 4)


def test_decimal_mul_result():
    assert decimal_arithmetic_result("*", 10, 2, 10, 2) == (21, 4)


def test_decimal_div_scale_floor():
    p, s = decimal_arithmetic_result("/", 10, 2, 10, 2)
    assert s >= 4  # Impala: division result scale >= 4


def test_decimal_cap_38():
    p, s = decimal_arithmetic_result("*", 38, 10, 38, 10)
    assert p == 38 and s <= 20


def test_int_promotion():
    # ArithmeticExpr: +,-,* promote to next larger int type
    assert arithmetic_result_type("TINYINT", "TINYINT", "+") == "SMALLINT"
    assert arithmetic_result_type("INT", "SMALLINT", "*") == "BIGINT"
    assert arithmetic_result_type("BIGINT", "BIGINT", "+") == "BIGINT"


def test_division_always_double():
    assert arithmetic_result_type("INT", "INT", "/") == "DOUBLE"


def test_decimal_arithmetic_result_table():
    """Pin the Impala 2.7 rules (TypesUtil.java:98-158) over a case table,
    including the precision-cap squeeze."""
    from impala_spark.types import decimal_arithmetic_result as r

    assert r("+", 10, 2, 8, 3) == (12, 3)
    assert r("-", 5, 0, 5, 0) == (6, 0)
    assert r("*", 10, 2, 8, 3) == (19, 5)
    assert r("/", 10, 2, 8, 3) == (22, 11)
    assert r("/", 3, 0, 2, 0) == (7, 4)    # min divide scale 4
    assert r("%", 10, 2, 8, 3) == (8, 3)
    # cap: 38 with scale squeezed, never negative
    assert r("*", 38, 10, 38, 10) == (38, 0)
    p, s = r("/", 38, 19, 38, 19)
    assert p == 38 and 0 <= s <= 38


def test_decimal_divide_known_spark_divergence(spark):
    """DOCUMENTED DELTA: Impala's divide result scale floor is 4
    (TypesUtil.java:145), Spark's is 6 — for small-scale operands the
    declared types differ while the VALUES agree. The engine keeps
    Spark's type (values are what the oracle hashes); this test pins the
    divergence so a silent change in either engine surfaces."""
    from impala_spark.types import decimal_arithmetic_result as r

    impala_p, impala_s = r("/", 3, 0, 2, 0)
    assert (impala_p, impala_s) == (7, 4)
    row = spark.sql(
        "SELECT typeof(CAST(6 AS DECIMAL(3,0)) / CAST(2 AS DECIMAL(2,0))) AS t, "
        "CAST(CAST(6 AS DECIMAL(3,0)) / CAST(2 AS DECIMAL(2,0)) AS DOUBLE) AS v"
    ).first()
    assert row.t != f"decimal({impala_p},{impala_s})"  # the divergence
    assert row.t == "decimal(9,6)"  # Spark: scale floor 6
    assert row.v == 3.0  # values identical regardless
