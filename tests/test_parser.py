"""Dialect-translation unit tests (reference: sql-parser.cup grammar,
sql-scanner.flex aliases, analysis/OrderByElement.java null ordering)."""

import pytest

from impala_spark.parser import ImpalaUnsupportedError, translate


def norm(s: str) -> str:
    return " ".join(s.split())


def test_order_by_nulls_asc():
    out = translate("SELECT a FROM t ORDER BY a")
    assert "NULLS LAST" in out


def test_order_by_nulls_desc():
    out = translate("SELECT a FROM t ORDER BY a DESC")
    assert "NULLS FIRST" in out


def test_order_by_explicit_nulls_untouched():
    out = translate("SELECT a FROM t ORDER BY a ASC NULLS FIRST")
    assert out.count("NULLS") == 1


def test_order_by_multiple_items():
    out = translate("SELECT a, b FROM t ORDER BY a DESC, b LIMIT 3")
    assert "NULLS FIRST" in out and "NULLS LAST" in out
    assert "LIMIT 3" in out


def test_window_order_by():
    out = translate("SELECT rank() OVER (PARTITION BY p ORDER BY x DESC) FROM t")
    assert "NULLS FIRST" in out


def test_bool_aliases():
    out = translate("SELECT 1 FROM t WHERE a && b || ! c")
    assert " AND " in out and " OR " in out and " NOT " in out


def test_not_equal_untouched():
    out = translate("SELECT 1 FROM t WHERE a != b")
    assert "!=" in out and " NOT " not in out


def test_iregexp_literal():
    out = translate("SELECT 1 FROM t WHERE name IREGEXP 'abc'")
    assert "RLIKE '(?i)abc'" in out


def test_iregexp_expression():
    out = translate("SELECT 1 FROM t WHERE name IREGEXP (p)")
    assert "concat('(?i)', (p))" in out


def test_broadcast_hint():
    out = translate("SELECT a FROM big JOIN [broadcast] small ON big.k = small.k")
    assert "/*+ BROADCAST(small) */" in out and "[" not in out


def test_shuffle_hint():
    out = translate("SELECT a FROM t1 JOIN [shuffle] t2 ON t1.k = t2.k")
    assert "/*+ SHUFFLE_HASH(t2) */" in out


def test_straight_join_dropped():
    out = translate("SELECT STRAIGHT_JOIN a FROM t1 JOIN t2 ON t1.k = t2.k")
    assert "STRAIGHT_JOIN" not in out.upper()


def test_ndv_rename():
    assert "approx_count_distinct(" in translate("SELECT ndv(x) FROM t").lower()


def test_appx_median():
    out = translate("SELECT appx_median(x) FROM t").lower()
    assert "percentile_approx" in out and "0.5" in out


def test_group_concat_default_sep():
    out = translate("SELECT group_concat(x) FROM t").lower()
    assert "listagg" in out and "', '" in out


def test_group_concat_explicit_sep():
    out = translate("SELECT group_concat(x, '|') FROM t").lower()
    assert "listagg" in out and out.count(",") == 1


def test_zeroifnull():
    out = translate("SELECT zeroifnull(x) FROM t").lower()
    assert "coalesce" in out and ", 0" in out


def test_isnull_two_arg_becomes_nvl():
    out = translate("SELECT isnull(x, y) FROM t").lower()
    assert "nvl" in out


def test_isnull_one_arg_untouched():
    out = translate("SELECT isnull(x) FROM t").lower()
    assert "isnull(x)" in out


def test_rejects_intersect():
    with pytest.raises(ImpalaUnsupportedError):
        translate("SELECT a FROM t INTERSECT SELECT a FROM u")


def test_rejects_rollup():
    with pytest.raises(ImpalaUnsupportedError):
        translate("SELECT a FROM t GROUP BY ROLLUP(a)")


def test_rejects_grouping_sets():
    with pytest.raises(ImpalaUnsupportedError):
        translate("SELECT a FROM t GROUP BY GROUPING SETS ((a))")


def test_strings_and_comments_preserved():
    q = "SELECT 'a && b -- not a comment' AS s FROM t -- trailing"
    out = translate(q)
    assert "'a && b -- not a comment'" in out


def test_keywords_inside_strings_untouched():
    out = translate("SELECT 'INTERSECT' AS word FROM t")
    assert "'INTERSECT'" in out
