"""Assignment-compatibility and implicit-cast pins — every assertion from
the reference's T/analysis/TypesUtilTest.java:29-216 over
types.assignment_compatible_type / is_implicitly_castable /
decimal_assignment_compatible."""

import pytest

from impala_spark.types import (
    assignment_compatible_type as compat,
    decimal_assignment_compatible,
    is_implicitly_castable as castable,
)


# -- TestDecimalAssignementType (TypesUtilTest.java:29-89) --------------------

DECIMAL_ASSIGN_CASES = [
    # (t1, t2, expected)
    ((10, 2), (12, 2), (12, 2)),
    ((10, 5), (12, 3), (14, 5)),
    ((12, 2), (10, 2), (12, 2)),
    ((12, 3), (10, 5), (14, 5)),
    ((10, 0), (16, 5), (16, 5)),
    ((9, 0), (9, 0), (9, 0)),       # default decimal with itself
    # decimal(38,38) && decimal(3,0): needs 41 digits; best we can do
    ((38, 38), (3, 0), (38, 38)),
]


@pytest.mark.parametrize("t1,t2,expected", DECIMAL_ASSIGN_CASES)
def test_decimal_assignment_compatible(t1, t2, expected):
    assert decimal_assignment_compatible(*t1, *t2) == expected


def test_wildcard_decimal_adopts_other_side():
    # Decimal(5,0) with Decimal(*,*) is Decimal(5,0) — both directions
    assert compat("DECIMAL(5,0)", "DECIMAL") == "DECIMAL(5,0)"
    assert compat("DECIMAL", "DECIMAL(5,0)") == "DECIMAL(5,0)"


# -- TestNumericImplicitCast: decimal -> integer (no loss only) ----------------

def test_decimal_to_int_no_precision_loss():
    assert castable("DECIMAL(2,0)", "TINYINT")
    assert castable("DECIMAL(4,0)", "SMALLINT")
    assert castable("DECIMAL(9,0)", "INT")
    assert castable("DECIMAL(18,0)", "BIGINT")
    assert not castable("DECIMAL(3,0)", "TINYINT")
    assert not castable("DECIMAL(5,0)", "SMALLINT")
    assert not castable("DECIMAL(10,0)", "INT")
    assert not castable("DECIMAL(19,0)", "BIGINT")
    assert not castable("DECIMAL(2,1)", "TINYINT")
    assert not castable("DECIMAL(4,1)", "SMALLINT")
    assert not castable("DECIMAL(2,1)", "INT")
    assert not castable("DECIMAL(18,5)", "BIGINT")


def test_int_to_decimal_needs_containing_type():
    assert not castable("TINYINT", "DECIMAL(2,0)")
    assert not castable("SMALLINT", "DECIMAL(4,0)")
    assert not castable("INT", "DECIMAL(9,0)")
    assert not castable("BIGINT", "DECIMAL(18,0)")
    assert castable("TINYINT", "DECIMAL(3,0)")
    assert castable("SMALLINT", "DECIMAL(5,0)")
    assert castable("INT", "DECIMAL(10,0)")
    assert castable("BIGINT", "DECIMAL(19,0)")
    assert castable("TINYINT", "DECIMAL(4,1)")
    assert castable("SMALLINT", "DECIMAL(6,1)")
    assert castable("INT", "DECIMAL(11,1)")
    assert castable("BIGINT", "DECIMAL(20,1)")


# -- only promotions among integer types (TypesUtilTest.java:145-166) ----------

_INT_TYPES = ["TINYINT", "SMALLINT", "INT", "BIGINT"]


@pytest.mark.parametrize("i", range(4))
@pytest.mark.parametrize("j", range(4))
def test_int_promotions_only(i, j):
    t1, t2 = _INT_TYPES[i], _INT_TYPES[j]
    for strict in (True, False):
        if i <= j:
            assert castable(t1, t2, strict)
        else:
            assert not castable(t1, t2, strict)


def test_float_promotions_only():
    assert castable("FLOAT", "FLOAT", True)
    assert not castable("DOUBLE", "FLOAT", False)
    assert castable("FLOAT", "DOUBLE", False)
    assert castable("FLOAT", "DOUBLE", True)


def test_decimal_to_float_only_non_strict():
    for dt in ("DECIMAL(30,10)", "DECIMAL(2,0)"):
        assert not castable(dt, "FLOAT", True)
        assert castable(dt, "FLOAT", False)
        assert not castable(dt, "DOUBLE", True)
        assert castable(dt, "DOUBLE", False)


# -- TestComplexImplicitCast (TypesUtilTest.java:182-199) -----------------------

def test_complex_types_never_implicitly_cast():
    arr, mp = "ARRAY<INT>", "MAP<STRING,INT>"
    st = "STRUCT<foo:FLOAT,bar:FLOAT>"
    assert not castable("INT", arr)
    assert not castable(arr, "INT")
    assert not castable("INT", mp)
    assert not castable(mp, "INT")
    assert not castable(mp, arr)
    assert not castable(st, "INT")
    assert not castable("INT", st)
    assert not castable(arr, st)


# -- corollaries from the implementation notes ----------------------------------

def test_strict_int_to_float_promotes_to_double():
    # strictCompatibilityMatrix: INT/BIGINT + FLOAT -> DOUBLE, so the
    # implicit cast to FLOAT is refused under strict
    assert castable("INT", "FLOAT", False)
    assert not castable("INT", "FLOAT", True)
    assert castable("BIGINT", "FLOAT", False)
    assert not castable("BIGINT", "FLOAT", True)
    # ...but the BIGINT->DOUBLE strict hole is preserved deliberately
    # (catalog/Type.java:714 TODO)
    assert castable("BIGINT", "DOUBLE", True)


def test_string_timestamp_only_non_strict():
    assert castable("STRING", "TIMESTAMP", False)
    assert not castable("STRING", "TIMESTAMP", True)
    assert not castable("TIMESTAMP", "STRING", False)


def test_null_compatible_with_everything():
    assert compat("NULL", "INT") == "INT"
    assert compat("DECIMAL(5,2)", "NULL") == "DECIMAL(5,2)"


def test_string_ladder():
    assert compat("VARCHAR(10)", "STRING") == "STRING"
    assert compat("CHAR(5)", "STRING") == "STRING"
    assert compat("VARCHAR(10)", "CHAR(20)") == "VARCHAR(20)"
    assert compat("CHAR(5)", "CHAR(9)") == "CHAR(9)"
    assert compat("VARCHAR(10)", "INT") == "INVALID"


# -- LiteralExpr.create from strings (T/analysis/ExprTest.java:14-43) ----------

def test_literal_from_string_positive():
    from impala_spark.types import literal_from_string as lit

    assert lit("false", "BOOLEAN") is False
    for t in ("TINYINT", "SMALLINT", "INT", "BIGINT"):
        assert lit("1", t) == 1
    assert lit("1.0", "FLOAT") == 1.0
    assert lit("1.0", "DOUBLE") == 1.0
    assert lit("ABC", "STRING") == "ABC"
    from decimal import Decimal
    assert lit("1.1", "DECIMAL(2,1)") == Decimal("1.1")


def test_literal_from_string_negative():
    from impala_spark.types import literal_from_string as lit

    bad = ["BOOLEAN", "TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT",
           "DOUBLE", "TIMESTAMP", "DECIMAL", "INVALID"]
    for t in bad:
        with pytest.raises(ValueError):
            lit("ABC", t)
    # date types not implemented: even a well-formed date string fails
    for t in ("DATE", "DATETIME", "TIMESTAMP"):
        with pytest.raises(ValueError):
            lit("2010-01-01", t)
    # range checks
    with pytest.raises(ValueError):
        lit("128", "TINYINT")
    with pytest.raises(ValueError):
        lit("12.34", "DECIMAL(3,1)")
