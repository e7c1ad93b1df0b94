"""ExprRewriter statement-clause coverage — every change/tree count from
the reference's T/analysis/ExprRewriterTest.java:66-175, adapted to the
fixture schema where the original used the functional test db (column
and table names changed, counts identical because the tree shapes are
identical).

The two probe rules mirror the reference's test rules: ExprToBool
replaces any expr not containing a subquery with TRUE (bottom-up, so
every node of a tree counts one change); TrueToFalse flips TRUE
literals, which counts how many distinct expr trees were actually
replaced."""

from impala_spark.exprrules import BoolLit, ExprRewriter, contains_subquery
from impala_spark.stmtrewriter import parse_statement


class ExprToBoolRule:
    def apply(self, expr):
        if contains_subquery(expr):
            return expr
        if isinstance(expr, BoolLit) and expr.val:
            return expr
        return BoolLit(True)


class TrueToFalseRule:
    def apply(self, expr):
        if isinstance(expr, BoolLit) and expr.val:
            return BoolLit(False)
        return expr


def rewrites_ok(stmt_sql, expected_changes, expected_trees):
    """Mirror of ExprRewriterTest.RewritesOk:81-99."""
    stmt = parse_statement(stmt_sql)
    to_true = ExprRewriter(ExprToBoolRule())
    stmt.rewrite_exprs(to_true)
    assert to_true.num_changes == expected_changes, (
        f"changes: got {to_true.num_changes}, want {expected_changes}")
    to_false = ExprRewriter(TrueToFalseRule())
    stmt.rewrite_exprs(to_false)
    assert to_false.num_changes == expected_trees, (
        f"trees: got {to_false.num_changes}, want {expected_trees}")


def check_no_rewrite(stmt_sql):
    stmt = parse_statement(stmt_sql)
    to_true = ExprRewriter(ExprToBoolRule())
    stmt.rewrite_exprs(to_true)
    assert to_true.num_changes == 0


# Select statement with all clauses: 11 rewritable Expr trees, 23 exprs
# changed in total (ExprRewriterTest.java:122-128, names adapted to the
# fixture schema — same tree shapes, same counts).
STMT = (
    "select a.l_orderkey a, 10 b, 20.2 c, count(b.l_orderkey) cnt from "
    "lineitem a join lineitem b on (a.l_orderkey = b.l_orderkey) "
    "where b.l_quantity > 1 and b.l_tax > 2 "
    "group by 1, a.l_shipmode "
    "having count(b.l_orderkey) < 3 "
    "order by a.l_orderkey, 4 limit 10"
)


def test_all_clauses():
    rewrites_ok(STMT, 23, 11)


def test_inline_view_star_not_rewritten():
    # same stmt inside an inline view; the outer expanded star adds 0
    rewrites_ok(f"select * from ({STMT}) v", 23, 11)


def test_union_all():
    rewrites_ok(f"{STMT} union all ({STMT}) order by cnt", 47, 23)


def test_union_inside_inline_view():
    rewrites_ok(
        f"select * from ({STMT} union all ({STMT}) order by cnt limit 10) v",
        47, 23)


def test_constant_select():
    rewrites_ok("select 1, 2, 3, 4", 4, 4)


def test_values_stmt():
    rewrites_ok("values(1, '2', 3, 4.1), (1, '2', 3, 4.1)", 8, 8)


def test_where_exists_subquery():
    # subquery-containing exprs are skipped; the subquery's own stmt is
    # rewritten (ExprRewriterTest.java:144-147)
    rewrites_ok(
        "select l_orderkey, l_linenumber from lineitem a "
        "where exists (select 1 from lineitem "
        "where l_shipmode = 'test' having count(*) < 10)", 9, 5)


def test_where_in_subquery():
    # a.l_orderkey before IN does not contain the subquery: it rewrites
    rewrites_ok(
        "select l_orderkey, l_linenumber from lineitem a "
        "where a.l_orderkey in (select count(*) from lineitem "
        "where l_shipmode = 'test' having count(*) < 10)", 10, 6)


# -- TestDdlStmts (ExprRewriterTest.java:150-157) -------------------------------

def test_ctas_rewritten():
    rewrites_ok("create table ctas_test as " + STMT, 23, 11)


def test_create_alter_view_never_rewritten():
    check_no_rewrite("create view view_test as " + STMT)
    check_no_rewrite("alter view some_view as " + STMT)


# -- TestDmlStmts (ExprRewriterTest.java:159-174, the non-Kudu case) -------------

def test_insert_select_rewritten():
    rewrites_ok(
        "insert into lineitem (l_orderkey, l_linenumber) "
        "partition(year=2009,month=10) " + STMT, 23, 11)


# -- splice rewriting of statement text (rewrite_predicates_sql) -----------------

def test_rewrite_predicates_sql_where_and_having():
    from impala_spark.stmtrewriter import rewrite_predicates_sql

    sql = ("SELECT a, count(*) FROM t "
           "WHERE (x between 1 and 2 and y < 3) or (z = 4 and x between 1 and 2) "
           "GROUP BY a HAVING count(*) > 1 + 1 ORDER BY a")
    out, n = rewrite_predicates_sql(sql)
    assert n > 0
    assert ("WHERE x >= 1 AND x <= 2 AND ((y < 3) OR (z = 4)) " in out)
    assert "HAVING count(*) > 2 " in out
    assert out.startswith("SELECT a, count(*) FROM t")
    assert out.endswith("ORDER BY a")


def test_rewrite_predicates_sql_bails_on_subqueries():
    from impala_spark.stmtrewriter import rewrite_predicates_sql

    sql = ("SELECT a FROM t WHERE exists (SELECT 1 FROM u WHERE u.k = t.k) "
           "and b between 1 and 2")
    out, n = rewrite_predicates_sql(sql)
    # the span contains a subquery the expression parser doesn't claim
    # without the statement hook -> verbatim, zero changes
    assert n == 0 and out == sql.strip()


def test_rewrite_predicates_sql_nested_where_untouched():
    from impala_spark.stmtrewriter import rewrite_predicates_sql

    # only TOP-LEVEL WHERE/HAVING spans rewrite; a derived table's WHERE
    # sits inside parens and is left alone
    sql = ("SELECT * FROM (SELECT a FROM t WHERE x between 1 and 2) v "
           "WHERE a between 3 and 4")
    out, n = rewrite_predicates_sql(sql)
    assert n > 0
    assert "WHERE x between 1 and 2" in out       # inner: verbatim
    assert "WHERE a >= 3 AND a <= 4" in out       # outer: rewritten
