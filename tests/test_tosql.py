"""toSql emission parity: impala_spark.tosql.to_impala_sql re-emits a
statement the way the reference's analyzed-statement toSql() prints it.

Reference surfaces: A/SelectStmt.java#toSql, A/Expr.java#toSql,
A/SortInfo.java, A/CastExpr.java#toSqlImpl, A/StringLiteral.java,
A/BaseTableRef.java; pins from T/analysis/ToSqlTest.java (line cited on
each case). Two layers:

1. exact-string pins (the reference test's expected outputs)
2. the round-trip property toSql == toSql(toSql(..)) plus re-translate
   validity over every registered query text — the same closure
   ToSqlTest enforces by re-analyzing each emitted string
"""

import pytest

from impala_spark.tosql import to_impala_sql

#: (input, expected) — cited ToSqlTest.java line per case.
PINS = [
    # --- selectListTest (:160-177) ---
    ('select 1234, 1234.0, 1234.0 + 1, 1234.0 + 1.0, 1 + 1, "abc" from functional.alltypes',
     "SELECT 1234, 1234.0, 1234.0 + 1, 1234.0 + 1.0, 1 + 1, 'abc' FROM functional.alltypes"),
    ("select 1234 i, 1234.0 as j, (1234.0 + 1) k, (1234.0 + 1.0) as l from functional.alltypes",
     "SELECT 1234 i, 1234.0 j, (1234.0 + 1) k, (1234.0 + 1.0) l FROM functional.alltypes"),
    ("select 1234 i, 1234.0 as j, (1234.0 + 1) k, (1234.0 + 1.0) as l",
     "SELECT 1234 i, 1234.0 j, (1234.0 + 1) k, (1234.0 + 1.0) l"),
    ("select null, 1234 < 5678, 1234.0 < 5678.0, 1234 < null from functional.alltypes",
     "SELECT NULL, 1234 < 5678, 1234.0 < 5678.0, 1234 < NULL FROM functional.alltypes"),
    # --- qualification: IMPALA-962, testAllTableAliases (:195-215) ---
    ("select int_col from alltypes", "SELECT int_col FROM functional.alltypes"),
    ("select alltypes.int_col from alltypes",
     "SELECT alltypes.int_col FROM functional.alltypes"),
    ("select int_col from alltypes a", "SELECT int_col FROM functional.alltypes a"),
    ("select a.int_col from alltypes a",
     "SELECT a.int_col FROM functional.alltypes a"),
    ("select * from alltypes", "SELECT * FROM functional.alltypes"),
    ("select functional.alltypes.int_col from functional.alltypes",
     "SELECT functional.alltypes.int_col FROM functional.alltypes"),
    ("select functional.alltypes.int_col, functional.alltypessmall.int_col "
     "from functional.alltypes, functional.alltypessmall",
     "SELECT functional.alltypes.int_col, functional.alltypessmall.int_col "
     "FROM functional.alltypes, functional.alltypessmall"),
    # --- aggregationTest (:512-533): function names lowercase ---
    ("select COUNT(*), count(id), COUNT(id), SUM(id), AVG(id) "
     "from functional.alltypes group by tinyint_col",
     "SELECT count(*), count(id), count(id), sum(id), avg(id) "
     "FROM functional.alltypes GROUP BY tinyint_col"),
    ("select avg(float_col / id) from functional.alltypes group by tinyint_col",
     "SELECT avg(float_col / id) FROM functional.alltypes GROUP BY tinyint_col"),
    ("select avg(double_col) from functional.alltypes "
     "group by int_col, tinyint_col, bigint_col",
     "SELECT avg(double_col) FROM functional.alltypes "
     "GROUP BY int_col, tinyint_col, bigint_col"),
    ("select avg(id) from functional.alltypes "
     "group by tinyint_col having count(tinyint_col) > 10",
     "SELECT avg(id) FROM functional.alltypes "
     "GROUP BY tinyint_col HAVING count(tinyint_col) > 10"),
    ("select sum(id) from functional.alltypes group by tinyint_col "
     "having avg(tinyint_col) > 10 AND count(tinyint_col) > 5",
     "SELECT sum(id) FROM functional.alltypes GROUP BY tinyint_col "
     "HAVING avg(tinyint_col) > 10 AND count(tinyint_col) > 5"),
    # --- orderByTest (:536-574): explicit directions, default NULLS
    #     order suppressed (ASC->NULLS LAST, DESC->NULLS FIRST) ---
    ("select id, string_col from functional.alltypes "
     "order by string_col ASC, float_col DESC, int_col ASC",
     "SELECT id, string_col FROM functional.alltypes "
     "ORDER BY string_col ASC, float_col DESC, int_col ASC"),
    ("select id, string_col from functional.alltypes "
     "order by string_col DESC, float_col ASC, int_col DESC",
     "SELECT id, string_col FROM functional.alltypes "
     "ORDER BY string_col DESC, float_col ASC, int_col DESC"),
    ("select id, string_col from functional.alltypes "
     "order by string_col ASC NULLS FIRST, float_col DESC NULLS LAST, int_col DESC",
     "SELECT id, string_col FROM functional.alltypes "
     "ORDER BY string_col ASC NULLS FIRST, float_col DESC NULLS LAST, int_col DESC"),
    ("select id, string_col from functional.alltypes "
     "order by string_col ASC NULLS FIRST, float_col DESC NULLS LAST, "
     "int_col DESC LIMIT 10 OFFSET 5",
     "SELECT id, string_col FROM functional.alltypes "
     "ORDER BY string_col ASC NULLS FIRST, float_col DESC NULLS LAST, "
     "int_col DESC LIMIT 10 OFFSET 5"),
    # OFFSET 0 suppressed (:559-565)
    ("select id, string_col from functional.alltypes "
     "order by string_col ASC NULLS FIRST, float_col DESC NULLS LAST, "
     "int_col DESC LIMIT 10 OFFSET 0",
     "SELECT id, string_col FROM functional.alltypes "
     "ORDER BY string_col ASC NULLS FIRST, float_col DESC NULLS LAST, "
     "int_col DESC LIMIT 10"),
    # default NULLS order suppressed (:568-574)
    ("select id, string_col from functional.alltypes "
     "order by string_col DESC NULLS FIRST, float_col ASC NULLS LAST, int_col DESC",
     "SELECT id, string_col FROM functional.alltypes "
     "ORDER BY string_col DESC, float_col ASC, int_col DESC"),
    # bare direction defaults to ASC (SortInfo.toSql; unionTest :597)
    ("select id from functional.alltypes order by id",
     "SELECT id FROM functional.alltypes ORDER BY id ASC"),
    # --- allTest (:578-588) ---
    ('select bigint_col, avg(double_col), sum(tinyint_col) '
     'from functional.alltypes where double_col > 2.5 AND string_col != "abc" '
     'group by bigint_col, int_col having count(int_col) > 10 OR sum(bigint_col) > 20 '
     'order by 2 DESC NULLS LAST, 3 ASC',
     "SELECT bigint_col, avg(double_col), sum(tinyint_col) "
     "FROM functional.alltypes WHERE double_col > 2.5 AND string_col != 'abc' "
     "GROUP BY bigint_col, int_col HAVING count(int_col) > 10 OR sum(bigint_col) > 20 "
     "ORDER BY 2 DESC NULLS LAST, 3 ASC"),
    # --- unionTest (:592-608) ---
    ("select bool_col, rank() over(order by id) from functional.alltypes "
     "union select bool_col, int_col from functional.alltypessmall",
     "SELECT bool_col, rank() OVER (ORDER BY id ASC) FROM functional.alltypes "
     "UNION SELECT bool_col, int_col FROM functional.alltypessmall"),
    ("select bool_col, int_col from functional.alltypes "
     "union all select bool_col, int_col from functional.alltypessmall",
     "SELECT bool_col, int_col FROM functional.alltypes "
     "UNION ALL SELECT bool_col, int_col FROM functional.alltypessmall"),
    # --- whereTest (:403-425) ---
    ("select id from functional.alltypes "
     "where tinyint_col < 40 OR int_col = 4 AND float_col > 1.4",
     "SELECT id FROM functional.alltypes "
     "WHERE tinyint_col < 40 OR int_col = 4 AND float_col > 1.4"),
    ('select id from functional.alltypes where string_col = "abc"',
     "SELECT id FROM functional.alltypes WHERE string_col = 'abc'"),
    ("select id from functional.alltypes where string_col = 'abc'",
     "SELECT id FROM functional.alltypes WHERE string_col = 'abc'"),
    ("select id from functional.alltypes where 5 between smallint_col and int_col",
     "SELECT id FROM functional.alltypes WHERE 5 BETWEEN smallint_col AND int_col"),
    ("select id from functional.alltypes where 5 not between smallint_col and int_col",
     "SELECT id FROM functional.alltypes WHERE 5 NOT BETWEEN smallint_col AND int_col"),
    ("select id from functional.alltypes where 5 in (smallint_col, int_col)",
     "SELECT id FROM functional.alltypes WHERE 5 IN (smallint_col, int_col)"),
    ("select id from functional.alltypes where 5 not in (smallint_col, int_col)",
     "SELECT id FROM functional.alltypes WHERE 5 NOT IN (smallint_col, int_col)"),
    # --- joinTest (:429-439) ---
    ("select * from functional.alltypes a, functional.alltypes b where a.id = b.id",
     "SELECT * FROM functional.alltypes a, functional.alltypes b WHERE a.id = b.id"),
    ("select * from functional.alltypes a cross join functional.alltypes b",
     "SELECT * FROM functional.alltypes a CROSS JOIN functional.alltypes b"),
    # bare JOIN prints INNER JOIN (planHintsTest :457-461 expected form)
    ("select * from functional.alltypes a join functional.alltypes b on a.id = b.id",
     "SELECT * FROM functional.alltypes a INNER JOIN functional.alltypes b ON a.id = b.id"),
    # --- subqueryTest (:803-850) ---
    ("select * from functional.alltypes where id in "
     "(select id from functional.alltypestiny)",
     "SELECT * FROM functional.alltypes WHERE id IN "
     "(SELECT id FROM functional.alltypestiny)"),
    ("select * from functional.alltypes where id not in "
     "(select id from functional.alltypestiny)",
     "SELECT * FROM functional.alltypes WHERE id NOT IN "
     "(SELECT id FROM functional.alltypestiny)"),
    ("select * from functional.alltypes where bigint_col = "
     "(select count(*) from functional.alltypestiny)",
     "SELECT * FROM functional.alltypes WHERE bigint_col = "
     "(SELECT count(*) FROM functional.alltypestiny)"),
    ("select * from functional.alltypes where exists "
     "(select * from functional.alltypestiny)",
     "SELECT * FROM functional.alltypes WHERE EXISTS "
     "(SELECT * FROM functional.alltypestiny)"),
    ("select * from functional.alltypes where not exists "
     "(select * from functional.alltypestiny)",
     "SELECT * FROM functional.alltypes WHERE NOT EXISTS "
     "(SELECT * FROM functional.alltypestiny)"),
    ("select * from functional.alltypes where id in "
     "(select id from functional.alltypestiny where int_col = "
     "(select avg(int_col) from functional.alltypesagg))",
     "SELECT * FROM functional.alltypes WHERE id IN "
     "(SELECT id FROM functional.alltypestiny WHERE int_col = "
     "(SELECT avg(int_col) FROM functional.alltypesagg))"),
    ("select * from (select id from functional.alltypes where "
     "int_col in (select int_col from functional.alltypestiny)) t where t.id < 10",
     "SELECT * FROM (SELECT id FROM functional.alltypes WHERE "
     "int_col IN (SELECT int_col FROM functional.alltypestiny)) t WHERE t.id < 10"),
    ("with t as (select * from functional.alltypes where id in "
     "(select id from functional.alltypestiny)) select * from t",
     "WITH t AS (SELECT * FROM functional.alltypes WHERE id IN "
     "(SELECT id FROM functional.alltypestiny)) SELECT * FROM t"),
    # --- CAST rendering (:1103-1104, :1188) ---
    ("select cast(NULL as INT), (cast(NULL as INT))",
     "SELECT CAST(NULL AS INT), (CAST(NULL AS INT))"),
    ("select cast(1 as decimal)", "SELECT CAST(1 AS DECIMAL(9,0))"),
    # --- analytic window rendering (:597, :1053) ---
    ("select sum(int_col) over(partition by id order by tinyint_col "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) from functional.alltypes",
     "SELECT sum(int_col) OVER (PARTITION BY id ORDER BY tinyint_col ASC "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM functional.alltypes"),
    # --- CTE names stay unqualified (WithClause.toSql; :847-850) ---
    ("with t as (select id from alltypes) select id from t",
     "WITH t AS (SELECT id FROM functional.alltypes) SELECT id FROM t"),
]

#: JoinOperator.toString x joinConditions (ToSqlTest.java:36-46, :435-438
#: runTestTemplate): identity under toSql once keywords are uppercase.
JOIN_TYPES = [
    "INNER JOIN", "LEFT OUTER JOIN", "RIGHT OUTER JOIN", "FULL OUTER JOIN",
    "LEFT SEMI JOIN", "LEFT ANTI JOIN", "RIGHT SEMI JOIN", "RIGHT ANTI JOIN",
]
JOIN_CONDITIONS = ["USING (id)", "ON (a.id = b.id)"]
for _jt in JOIN_TYPES:
    for _jc in JOIN_CONDITIONS:
        _sql = f"select * from functional.alltypes a {_jt.lower()} functional.alltypes b {_jc.lower()}"
        _exp = f"SELECT * FROM functional.alltypes a {_jt} functional.alltypes b {_jc.replace('id', 'id')}"
        PINS.append((_sql, _exp.replace("USING (ID)", "USING (id)")))


@pytest.mark.parametrize("src,expected", PINS, ids=range(len(PINS)))
def test_tosql_pins(src, expected):
    assert to_impala_sql(src, default_db="functional") == expected


def test_tosql_idempotent_and_revalidatable_over_registry():
    """ToSqlTest re-analyzes every emitted string (testToSql's closing
    AnalyzesOk) — the equivalent closure here: for every registered
    query text, toSql(toSql(q)) == toSql(q) AND the emitted text still
    translates cleanly through the dialect shim."""
    from impala_spark.parser import translate
    from impala_spark.queries import SPARK_QUERIES

    checked = 0
    for name, fn in SPARK_QUERIES.items():
        sql = fn.__doc__
        if not sql or not sql.strip().upper().startswith(("SELECT", "WITH")):
            continue
        emitted = to_impala_sql(sql)
        assert to_impala_sql(emitted) == emitted, name  # fixpoint
        translate(emitted)  # still analyzable by the shim
        checked += 1
    assert checked >= 100, f"registry shrank? only {checked} query texts"


def test_tosql_identifier_quoting_pins():
    """ToSqlUtils.getIdentSql re-quoting (ToSqlTest.java:372-400):
    unnecessary backquotes removed, keyword/non-Hive-lexable identifiers
    (re)quoted, string-quoted aliases emitted as identifiers."""
    cases = [
        ("select 1 as `abc`, 2.0 as 'xyz'", "SELECT 1 abc, 2.0 xyz"),      # :374
        ("select 1 as _c0", "SELECT 1 `_c0`"),                              # :378
        ("select 1 as `???`", "SELECT 1 `???`"),                            # :381
        ("select `end`.`alter`, `end`.`table` from "
         "(select 1 as `alter`, 2 as `table`) `end`",
         "SELECT `end`.`alter`, `end`.`table` FROM "
         "(SELECT 1 `alter`, 2 `table`) `end`"),                            # :384-387
        ("select a from (select 1 as a) as _t",
         "SELECT a FROM (SELECT 1 a) `_t`"),                                # :390-391
        ("with _t as (select 1 as a) select * from _t",
         "WITH `_t` AS (SELECT 1 a) SELECT * FROM `_t`"),                   # :394-395
    ]
    for src, want in cases:
        assert to_impala_sql(src, default_db="functional") == want


def test_tosql_plan_hints_emit_eol_comment_style():
    """Plan hints re-emit in the end-of-line commented style for Hive
    view compatibility regardless of the input style
    (ToSqlTest.java:443-507 planHintsTest: traditional comment, eol
    comment, legacy bracket)."""
    expected_join = (
        "SELECT * FROM functional.alltypes a INNER JOIN \n-- +broadcast\n "
        "functional.alltypes b ON a.id = b.id"
    )
    expected_sel = "SELECT \n-- +straight_join\n * FROM functional.alltypes"
    cases = [
        ("select * from functional.alltypes a join /* +broadcast */ "
         "functional.alltypes b on a.id = b.id", expected_join),
        ("select * from functional.alltypes a join \n-- +broadcast\n "
         "functional.alltypes b on a.id = b.id", expected_join),
        ("select * from functional.alltypes a join [broadcast] "
         "functional.alltypes b on a.id = b.id", expected_join),
        ("select /* +straight_join */ * from functional.alltypes", expected_sel),
        ("select [straight_join] * from functional.alltypes", expected_sel),
        ("select distinct /* +straight_join */ * from functional.alltypes",
         "SELECT DISTINCT \n-- +straight_join\n * FROM functional.alltypes"),
        ("select * from functional.alltypes a join [shuffle,broadcast] "
         "functional.alltypes b on a.id = b.id",
         "SELECT * FROM functional.alltypes a INNER JOIN "
         "\n-- +shuffle,broadcast\n functional.alltypes b ON a.id = b.id"),
        # ordinary comments are dropped, not re-emitted
        ("select /* note */ 1", "SELECT 1"),
        ("select 1 -- trailing\n", "SELECT 1"),
    ]
    for src, want in cases:
        assert to_impala_sql(src, default_db="functional") == want
