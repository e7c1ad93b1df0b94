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
