"""Pins for the expression rewrite rules — every RewritesOk case from the
reference's T/analysis/ExprRewriteRulesTest.java (233 lines, all three
rules), plus driver-loop behaviors from ExprRewriter.java.

Expected strings are the reference's expected toSql outputs verbatim.
"""

import pytest

from impala_spark.exprrules import (
    BETWEEN_TO_COMPOUND,
    EXTRACT_COMMON_CONJUNCTS,
    FOLD_CONSTANTS,
    ExprRewriter,
    parse_expr,
    rewrite_sql,
)


def rewrites_ok(expr_sql, rule, expected):
    """Mirror of ExprRewriteRulesTest.RewritesOk:40-63: apply one rule,
    compare toSql, and assert the changed() flag matches whether a
    change was expected."""
    orig_sql = parse_expr(expr_sql).to_sql()
    out_sql, num_changes = rewrite_sql(expr_sql, rule)
    if expected is None:
        assert out_sql == orig_sql, f"unexpected rewrite: {out_sql}"
        assert num_changes == 0
    else:
        assert out_sql == expected
        assert num_changes > 0


# ---------------------------------------------------------------------------
# TestBetweenToCompoundRule (ExprRewriteRulesTest.java:74-112)
# ---------------------------------------------------------------------------

BETWEEN_CASES = [
    ("int_col between float_col and double_col",
     "int_col >= float_col AND int_col <= double_col"),
    ("int_col not between float_col and double_col",
     "int_col < float_col OR int_col > double_col"),
    ("50.0 between null and 5000",
     "50.0 >= NULL AND 50.0 <= 5000"),
    ("int_col between 10 and 20",
     "int_col >= 10 AND int_col <= 20"),
    ("int_col not between 10 and 20",
     "int_col < 10 OR int_col > 20"),
    ("50.0 not between null and 5000",
     "50.0 < NULL OR 50.0 > 5000"),
    # Nested BETWEEN predicates.
    ("int_col between if(tinyint_col between 1 and 2, 10, 20) "
     "and cast(smallint_col between 1 and 2 as int)",
     "int_col >= if(tinyint_col >= 1 AND tinyint_col <= 2, 10, 20) "
     "AND int_col <= CAST(smallint_col >= 1 AND smallint_col <= 2 AS INT)"),
    # Nested NOT BETWEEN predicates.
    ("int_col not between if(tinyint_col not between 1 and 2, 10, 20) "
     "and cast(smallint_col not between 1 and 2 as int)",
     "int_col < if(tinyint_col < 1 OR tinyint_col > 2, 10, 20) "
     "OR int_col > CAST(smallint_col < 1 OR smallint_col > 2 AS INT)"),
    # Mixed nested BETWEEN and NOT BETWEEN.
    ("int_col between if(tinyint_col between 1 and 2, 10, 20) "
     "and cast(smallint_col not between 1 and 2 as int)",
     "int_col >= if(tinyint_col >= 1 AND tinyint_col <= 2, 10, 20) "
     "AND int_col <= CAST(smallint_col < 1 OR smallint_col > 2 AS INT)"),
]


@pytest.mark.parametrize("expr,expected", BETWEEN_CASES)
def test_between_to_compound(expr, expected):
    rewrites_ok(expr, BETWEEN_TO_COMPOUND, expected)


# ---------------------------------------------------------------------------
# TestExtractCommonConjunctsRule (ExprRewriteRulesTest.java:114-204)
# ---------------------------------------------------------------------------

EXTRACT_CASES = [
    # One common conjunct.
    ("(int_col < 10 and bigint_col < 10) or "
     "(string_col = '10' and int_col < 10)",
     "int_col < 10 AND ((bigint_col < 10) OR (string_col = '10'))"),
    # One common conjunct in multiple disjuncts.
    ("(int_col < 10 and bigint_col < 10) or "
     "(string_col = '10' and int_col < 10) or "
     "(id < 20 and int_col < 10) or "
     "(int_col < 10 and float_col > 3.14)",
     "int_col < 10 AND "
     "((bigint_col < 10) OR (string_col = '10') OR "
     "(id < 20) OR (float_col > 3.14))"),
    # Same but with a bushy OR tree.
    ("((int_col < 10 and bigint_col < 10) or "
     " (string_col = '10' and int_col < 10)) or "
     "((id < 20 and int_col < 10) or "
     " (int_col < 10 and float_col > 3.14))",
     "int_col < 10 AND "
     "((bigint_col < 10) OR (string_col = '10') OR "
     "(id < 20) OR (float_col > 3.14))"),
    # Multiple common conjuncts.
    ("(int_col < 10 and bigint_col < 10 and bool_col is null) or "
     "(bool_col is null and string_col = '10' and int_col < 10)",
     "int_col < 10 AND bool_col IS NULL AND "
     "((bigint_col < 10) OR (string_col = '10'))"),
    # Negated common conjunct.
    ("(!(int_col=5 or tinyint_col > 9) and double_col = 7) or "
     "(!(int_col=5 or tinyint_col > 9) and double_col = 8)",
     "NOT (int_col = 5 OR tinyint_col > 9) AND "
     "((double_col = 7) OR (double_col = 8))"),
    # Common BetweenPredicate.
    ("(int_col between 10 and 30 and bigint_col < 10) or "
     "(string_col = '10' and int_col between 10 and 30) or "
     "(id < 20 and int_col between 10 and 30) or "
     "(int_col between 10 and 30 and float_col > 3.14)",
     "int_col BETWEEN 10 AND 30 AND "
     "((bigint_col < 10) OR (string_col = '10') OR "
     "(id < 20) OR (float_col > 3.14))"),
    # Common NOT BetweenPredicate.
    ("(int_col not between 10 and 30 and bigint_col < 10) or "
     "(string_col = '10' and int_col not between 10 and 30) or "
     "(id < 20 and int_col not between 10 and 30) or "
     "(int_col not between 10 and 30 and float_col > 3.14)",
     "int_col NOT BETWEEN 10 AND 30 AND "
     "((bigint_col < 10) OR (string_col = '10') OR "
     "(id < 20) OR (float_col > 3.14))"),
    # Mixed BetweenPredicates are not common.
    ("(int_col not between 10 and 30 and bigint_col < 10) or "
     "(string_col = '10' and int_col between 10 and 30) or "
     "(id < 20 and int_col not between 10 and 30) or "
     "(int_col between 10 and 30 and float_col > 3.14)",
     None),
    # All conjuncts are common.
    ("(int_col < 10 and id between 5 and 6) or "
     "(id between 5 and 6 and int_col < 10) or "
     "(int_col < 10 and id between 5 and 6)",
     "int_col < 10 AND id BETWEEN 5 AND 6"),
    # Complex disjuncts are redundant.
    ("(int_col < 10) or "
     "(int_col < 10 and bigint_col < 10 and bool_col is null) or "
     "(int_col < 10) or "
     "(bool_col is null and int_col < 10)",
     "int_col < 10"),
    # Redundant disjuncts left by the original OR-tree shape.
    ("(int_col < 10 and bigint_col < 10) or "
     "(string_col = '10' and int_col < 10) or "
     "(id < 20 and int_col < 10) or "
     "(int_col < 10 and id < 20)",
     "int_col < 10 AND "
     "((bigint_col < 10) OR (string_col = '10') OR (id < 20) OR (id < 20))"),
]


@pytest.mark.parametrize("expr,expected", EXTRACT_CASES)
def test_extract_common_conjuncts(expr, expected):
    rewrites_ok(expr, EXTRACT_COMMON_CONJUNCTS, expected)


# ---------------------------------------------------------------------------
# TestFoldConstantsRule (ExprRewriteRulesTest.java:206-232)
# ---------------------------------------------------------------------------

FOLD_CASES = [
    ("1 + 1", "2"),
    ("1 + 1 + 1 + 1 + 1", "5"),
    ("10 - 5 - 2 - 1 - 8", "-6"),
    ("cast('2016-11-09' as timestamp)", "TIMESTAMP '2016-11-09 00:00:00'"),
    ("cast('2016-11-09' as timestamp) + interval 1 year",
     "TIMESTAMP '2017-11-09 00:00:00'"),
    # Strings with escape sequences.
    (r"'_' LIKE '\\_'", "TRUE"),
    (r"base64decode(base64encode('\047\001\132\060')) = "
     r"'\047\001\132\060'", "TRUE"),
    # Strings with chars > 127 must not be folded.
    ("hex(unhex(hex(unhex('D3'))))", None),
    # Non-deterministic functions must not be folded.
    ("rand()", None),
    ("random()", None),
    ("uuid()", None),
    # Exprs that warn during evaluation must not be folded.
    ("coalesce(1.8, cast(int_col as decimal(38,38)))", None),
]


@pytest.mark.parametrize("expr,expected", FOLD_CASES)
def test_fold_constants(expr, expected):
    rewrites_ok(expr, FOLD_CONSTANTS, expected)


# ---------------------------------------------------------------------------
# Driver behaviors (ExprRewriter.java:48-99)
# ---------------------------------------------------------------------------

def test_rule_list_applied_to_fixpoint():
    # BetweenToCompound exposes new fold opportunities; the driver must
    # loop the rule list until no rule fires.
    out, n = rewrite_sql(
        "5 between 1 and 10", [BETWEEN_TO_COMPOUND, FOLD_CONSTANTS])
    assert out == "TRUE"
    assert n >= 2  # between rewrite + at least one fold


def test_changed_flag_and_reset():
    r = ExprRewriter(BETWEEN_TO_COMPOUND)
    e = parse_expr("int_col between 1 and 2")
    out = r.rewrite(e)
    assert r.changed() and r.get_num_changes() == 1
    assert out.to_sql() == "int_col >= 1 AND int_col <= 2"
    r.reset()
    assert not r.changed()


def test_no_change_returns_same_tree():
    r = ExprRewriter(EXTRACT_COMMON_CONJUNCTS)
    e = parse_expr("(a < 1 and b < 2) or (c < 3 and d < 4)")
    out = r.rewrite(e)
    assert out is e and not r.changed()


def test_fold_like_does_not_interpret_wildcard_escape():
    # '\\%' is a literal percent: 'x%' must not match.
    out, _ = rewrite_sql(r"'x1' LIKE 'x\\%'", FOLD_CONSTANTS)
    assert out == "FALSE"
    out, _ = rewrite_sql(r"'x%' LIKE 'x\\%'", FOLD_CONSTANTS)
    assert out == "TRUE"


def test_fold_preserves_null_semantics():
    out, _ = rewrite_sql("1 + null", FOLD_CONSTANTS)
    assert out == "NULL"
    out, _ = rewrite_sql("null and false", FOLD_CONSTANTS)
    assert out == "FALSE"
    out, _ = rewrite_sql("null or true", FOLD_CONSTANTS)
    assert out == "TRUE"
    out, _ = rewrite_sql("null or false", FOLD_CONSTANTS)
    assert out == "NULL"


def test_fold_string_functions():
    out, _ = rewrite_sql("upper('abc')", FOLD_CONSTANTS)
    assert out == "'ABC'"
    out, _ = rewrite_sql("concat('a', 'b', 'c')", FOLD_CONSTANTS)
    assert out == "'abc'"
    out, _ = rewrite_sql("length('hello')", FOLD_CONSTANTS)
    assert out == "5"


def test_fold_unknown_function_refused():
    # Functions outside the evaluable surface are left alone (the
    # reference refuses when the BE eval fails).
    out, n = rewrite_sql("my_udf(1, 2)", FOLD_CONSTANTS)
    assert out == "my_udf(1, 2)" and n == 0


def test_extract_cost_bound():
    # > 900 pairwise comparisons: rule must bail (MAX_EQUALS_COMPARISONS).
    lhs = " and ".join(f"a{i} < {i}" for i in range(31))
    rhs = " and ".join(f"b{i} < {i}" for i in range(31))
    out, n = rewrite_sql(f"({lhs}) or ({rhs})", EXTRACT_COMMON_CONJUNCTS)
    assert n == 0


def test_differential_fuzz_sample(sf_dir):
    """Seeded 60-predicate differential sample of tools/exprrules_fuzz:
    original vs rule-rewritten predicate on the same DuckDB engine —
    isolates rewrite semantic preservation from dialect differences.
    Full campaigns (3 seeds x 500-1000, 0 mismatches) run per-round."""
    import random

    import duckdb

    from tools.exprrules_fuzz import gen_predicate

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')")
    rng = random.Random(12)
    rules = ["between_to_compound", "extract_common_conjuncts",
             "fold_constants"]
    q = ("SELECT l_returnflag, COUNT(*) AS c,"
         " COALESCE(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)),0) AS s"
         " FROM lineitem WHERE {p} GROUP BY l_returnflag ORDER BY 1")
    n_changed = 0
    for _ in range(60):
        pred = gen_predicate(rng)
        rewritten, changes = rewrite_sql(pred, rules)
        n_changed += bool(changes)
        assert con.execute(q.format(p=pred)).fetchall() == \
            con.execute(q.format(p=rewritten)).fetchall(), pred
    assert n_changed > 40  # the generator's shapes mostly fire the rules
