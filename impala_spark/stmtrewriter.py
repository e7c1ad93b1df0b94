"""Statement-level expression rewriting — the reference's
``StatementBase.rewriteExprs(ExprRewriter)`` clause walk
(A/SelectStmt.java:884-904, A/UnionStmt.java, A/ValuesStmt.java), driven
by the same ExprRewriter as exprrules and pinned by
``T/analysis/ExprRewriterTest.java`` (all change/tree counts).

The walk order and coverage mirror the reference exactly:

* select-list items (star items are not exprs and are skipped),
* FROM-clause table refs — ON-clause exprs; inline views recurse into
  their statement,
* WHERE as one tree, then the statements of subqueries inside it,
* HAVING as one tree,
* grouping exprs — a GROUP BY ordinal was substituted with the
  corresponding select expr during analysis, so it rewrites as a copy
  of that tree,
* ORDER BY element exprs — an ordinal stays a single-node expr (the
  sort tuple slot),
* UNION operands then the union's own ORDER BY,
* VALUES rows item by item,
* CTAS and INSERT ... SELECT rewrite their query; CREATE/ALTER VIEW are
  never rewritten (the original SQL is preserved for the catalog,
  ExprRewriterTest.TestDdlStmts).

In our engine Catalyst performs equivalent rewrites during planning;
this module exists for frontend parity and for tools that want the
Impala-shape normalized statement.
"""

from __future__ import annotations

import copy
import re

from impala_spark.exprrules import (
    Expr,
    ExprRewriter,
    NumLit,
    Subquery,
    _P,
    contains_subquery,
)
from impala_spark.parser import ImpalaUnsupportedError, tokenize

__all__ = ["parse_statement", "rewrite_statement_exprs", "StmtParser"]


_JOIN_WORDS = {"JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "OUTER",
               "SEMI", "ANTI"}
_CLAUSE_STOP = {"FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
                "OFFSET", "UNION"}


class TableRef:
    """name [alias] or (inline statement) alias, with an optional
    ON-clause expr."""

    def __init__(self, name=None, inline_stmt=None, alias=None):
        self.name = name
        self.inline_stmt = inline_stmt
        self.alias = alias
        self.on_expr: Expr | None = None

    def rewrite_exprs(self, rewriter: ExprRewriter) -> None:
        if self.inline_stmt is not None:
            self.inline_stmt.rewrite_exprs(rewriter)
        if self.on_expr is not None:
            self.on_expr = rewriter.rewrite(self.on_expr)


class SelectStmt:
    def __init__(self):
        self.select_items: list[Expr] = []  # star items excluded
        self.table_refs: list[TableRef] = []
        self.where: Expr | None = None
        self.group_by: list[Expr] = []
        self.having: Expr | None = None
        self.order_by: list[Expr] = []

    def rewrite_exprs(self, rewriter: ExprRewriter) -> None:
        # SelectStmt.rewriteExprs:884-904 — same clause order
        for i, item in enumerate(self.select_items):
            self.select_items[i] = rewriter.rewrite(item)
        for ref in self.table_refs:
            ref.rewrite_exprs(rewriter)
        if self.where is not None:
            self.where = rewriter.rewrite(self.where)
            for sq in _collect_subqueries(self.where):
                sq.stmt.rewrite_exprs(rewriter)
        if self.having is not None:
            self.having = rewriter.rewrite(self.having)
        for i, g in enumerate(self.group_by):
            self.group_by[i] = rewriter.rewrite(g)
        for i, o in enumerate(self.order_by):
            self.order_by[i] = rewriter.rewrite(o)

    def to_sql(self) -> str:  # diagnostic emission, not a pin surface
        return "<select>"


class UnionStmt:
    def __init__(self, operands, order_by):
        self.operands = operands
        self.order_by: list[Expr] = order_by

    def rewrite_exprs(self, rewriter: ExprRewriter) -> None:
        for op in self.operands:
            op.rewrite_exprs(rewriter)
        for i, o in enumerate(self.order_by):
            self.order_by[i] = rewriter.rewrite(o)

    def to_sql(self) -> str:
        return "<union>"


class ValuesStmt:
    def __init__(self, rows):
        self.rows: list[list[Expr]] = rows

    def rewrite_exprs(self, rewriter: ExprRewriter) -> None:
        for row in self.rows:
            for i, item in enumerate(row):
                row[i] = rewriter.rewrite(item)

    def to_sql(self) -> str:
        return "<values>"


class NoRewriteStmt:
    """CREATE/ALTER VIEW — rewriteExprs is a no-op so the original SQL
    is what the catalog stores (ExprRewriterTest.CheckNoRewrite)."""

    def __init__(self, inner):
        self.inner = inner

    def rewrite_exprs(self, rewriter: ExprRewriter) -> None:
        return

    def to_sql(self) -> str:
        return "<view-ddl>"


def _collect_subqueries(expr: Expr) -> list[Subquery]:
    out: list[Subquery] = []

    def walk(e: Expr) -> None:
        if isinstance(e, Subquery):
            out.append(e)
            return
        for c in e.children():
            walk(c)

    walk(expr)
    return out


class StmtParser(_P):
    """Expression parser extended with statement parsing. The
    subselect hook routes (SELECT ...) in expression position back into
    statement parsing."""

    def __init__(self, tokens):
        super().__init__(tokens)

    # hook target — bound as a plain function on the class below
    def _parse_subselect(self) -> SelectStmt:
        return self.query_stmt(stop_at_paren=True)

    # -- statement grammar ----------------------------------------------------
    def query_stmt(self, stop_at_paren: bool = False):
        """SELECT/VALUES statement with optional UNION ALL chain and a
        trailing union-level ORDER BY / LIMIT."""
        if self.at_word("VALUES"):
            return self._values_stmt()
        first = self.select_stmt()
        operands = [first]
        while self.at_word("UNION"):
            self.take()
            if self.at_word("ALL", "DISTINCT"):
                self.take()
            if self.at_op("("):
                self.take()
                operands.append(self.query_stmt(stop_at_paren=True))
                self.expect_op(")")
            else:
                operands.append(self.select_stmt())
        if len(operands) == 1:
            # a trailing ORDER BY/LIMIT after a parenthesized operand
            # belongs to this (only) statement
            self._order_limit_into(first)
            return first
        order_by: list[Expr] = []
        if self.at_word("ORDER"):
            order_by = self._order_by_list()
        self._limit_offset()
        return UnionStmt(operands, order_by)

    def _values_stmt(self) -> ValuesStmt:
        self.expect_word("VALUES")
        rows = []
        while True:
            self.expect_op("(")
            row = [self.or_expr()]
            while self.at_op(","):
                self.take()
                row.append(self.or_expr())
            self.expect_op(")")
            rows.append(row)
            if self.at_op(","):
                self.take()
                continue
            break
        return ValuesStmt(rows)

    def select_stmt(self) -> SelectStmt:
        stmt = SelectStmt()
        self.expect_word("SELECT")
        if self.at_word("DISTINCT", "ALL"):
            self.take()
        raw_items: list[Expr | None] = []
        while True:
            raw_items.append(self._select_item())
            if self.at_op(","):
                self.take()
                continue
            break
        stmt.select_items = [e for e in raw_items if e is not None]
        if self.at_word("FROM"):
            self.take()
            stmt.table_refs = self._table_ref_list()
        if self.at_word("WHERE"):
            self.take()
            stmt.where = self.or_expr()
        if self.at_word("GROUP"):
            self.take()
            self.expect_word("BY")
            while True:
                g = self.or_expr()
                # analysis substitutes a GROUP BY ordinal with the
                # corresponding select expr (SelectStmt ordinal smap)
                if isinstance(g, NumLit) and isinstance(g.value(), int):
                    idx = g.value() - 1
                    if 0 <= idx < len(stmt.select_items):
                        g = copy.deepcopy(stmt.select_items[idx])
                stmt.group_by.append(g)
                if self.at_op(","):
                    self.take()
                    continue
                break
        if self.at_word("HAVING"):
            self.take()
            stmt.having = self.or_expr()
        self._order_limit_into(stmt)
        return stmt

    def _order_limit_into(self, stmt) -> None:
        if self.at_word("ORDER"):
            stmt.order_by = stmt.order_by or []
            stmt.order_by.extend(self._order_by_list())
        self._limit_offset()

    def _order_by_list(self) -> list[Expr]:
        self.expect_word("ORDER")
        self.expect_word("BY")
        out = []
        while True:
            # an ORDER BY ordinal stays a single-node expr: the sort
            # tuple slot (SortInfo), NOT the substituted select expr —
            # ExprRewriterTest counts 1 change for `order by 4`
            out.append(self.or_expr())
            if self.at_word("ASC", "DESC"):
                self.take()
            if self.at_word("NULLS"):
                self.take()
                self.take()  # FIRST/LAST
            if self.at_op(","):
                self.take()
                continue
            break
        return out

    def _limit_offset(self) -> None:
        # LIMIT/OFFSET exprs are not rewritten (LimitElement is not in
        # the rewriteExprs walk)
        for kw in ("LIMIT", "OFFSET"):
            if self.at_word(kw):
                self.take()
                self.take()

    def _select_item(self) -> Expr | None:
        # star items: `*` or `alias.*` — expanded stars are not
        # rewritten (ExprRewriterTest.TestQueryStmts inline-view case)
        if self.at_op("*"):
            self.take()
            return None
        t = self.peek()
        if (t is not None and t.kind in ("word", "bident")
                and self.peek(1) is not None and self.peek(1).text == "."
                and self.peek(2) is not None and self.peek(2).text == "*"):
            self.take(); self.take(); self.take()
            return None
        e = self.or_expr()
        if self.at_word("AS"):
            self.take()
            self.take()
        elif (self.peek() is not None and self.peek().kind == "word"
              and self.peek().upper not in _CLAUSE_STOP
              and self.peek().upper not in ("AS",)):
            self.take()  # bare alias
        return e

    def _table_ref_list(self) -> list[TableRef]:
        refs = [self._table_ref()]
        while True:
            if self.at_op(","):
                self.take()
                refs.append(self._table_ref())
                continue
            t = self.peek()
            if t is not None and t.kind == "word" and t.upper in _JOIN_WORDS:
                while self.at_word(*_JOIN_WORDS):
                    self.take()
                ref = self._table_ref()
                if self.at_word("ON"):
                    self.take()
                    ref.on_expr = self.or_expr()
                elif self.at_word("USING"):
                    self.take()
                    self.expect_op("(")
                    while not self.at_op(")"):
                        self.take()
                    self.take()
                refs.append(ref)
                continue
            return refs

    def _table_ref(self) -> TableRef:
        if self.at_op("("):
            self.take()
            inner = self.query_stmt(stop_at_paren=True)
            self.expect_op(")")
            ref = TableRef(inline_stmt=inner)
        else:
            parts = [self.take().text]
            while self.at_op(".") and self.peek(1) is not None \
                    and self.peek(1).kind in ("word", "bident"):
                self.take()
                parts.append(self.take().text)
            ref = TableRef(name=".".join(parts))
        if self.at_word("AS"):
            self.take()
            ref.alias = self.take().text
        elif (self.peek() is not None and self.peek().kind == "word"
              and self.peek().upper not in _CLAUSE_STOP
              and self.peek().upper not in _JOIN_WORDS
              and self.peek().upper not in ("ON", "USING")):
            ref.alias = self.take().text
        return ref


StmtParser.subselect_hook = StmtParser._parse_subselect


def parse_statement(sql: str):
    """Parse a statement for expr rewriting. Supports query statements
    (SELECT/UNION/VALUES), CTAS, INSERT ... SELECT, and the
    never-rewritten CREATE/ALTER VIEW forms."""
    text = sql.strip().rstrip(";")
    m = re.match(r"(?is)^\s*(CREATE|ALTER)\s+VIEW\b.*?\bAS\s+(.*)$", text)
    if m:
        return NoRewriteStmt(parse_statement(m.group(2)))
    m = re.match(r"(?is)^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\b.*?"
                 r"\bAS\s+((?:SELECT|WITH|VALUES)\b.*)$", text)
    if m:
        return parse_statement(m.group(1))
    m = re.match(r"(?is)^\s*(?:INSERT|UPSERT)\s+(?:INTO|OVERWRITE)\b.*?"
                 r"\b((?:SELECT|WITH|VALUES)\b.*)$", text)
    if m:
        return parse_statement(m.group(1))
    p = StmtParser(tokenize(text))
    stmt = p.query_stmt()
    if p.i != len(p.toks):
        raise ImpalaUnsupportedError(
            f"trailing statement tokens at {p.peek().text!r}")
    return stmt


def rewrite_statement_exprs(sql: str, rule_or_rewriter) -> int:
    """Parse ``sql``, run the statement clause walk with the given rule
    (or an existing ExprRewriter), and return the number of changes —
    the surface ExprRewriterTest.RewritesOk measures."""
    rewriter = (rule_or_rewriter
                if isinstance(rule_or_rewriter, ExprRewriter)
                else ExprRewriter(rule_or_rewriter))
    stmt = parse_statement(sql)
    stmt.rewrite_exprs(rewriter)
    return rewriter.num_changes


# ---------------------------------------------------------------------------
# In-place predicate rewriting over statement TEXT — the user-facing
# composition of the rules: locate top-level WHERE/HAVING spans, parse
# each as an expression, apply the rule list, splice the rewritten SQL
# back. Clauses that the expression parser cannot fully claim (e.g.
# subqueries) bail to the original text — conservative like every other
# rewrite gate in this engine.
# ---------------------------------------------------------------------------

_SPAN_END_WORDS = {"GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET", "UNION",
                   "WINDOW"}


def rewrite_predicates_sql(sql: str, rules=None) -> tuple[str, int]:
    """Rewrite every top-level WHERE/HAVING predicate of ``sql`` through
    the expression rewrite rules, returning (new_sql, num_changes).
    Spans that fail to parse as plain expressions (subqueries, exotic
    syntax) are left verbatim."""
    from impala_spark.exprrules import RULES_BY_NAME, ExprRewriter
    from impala_spark.exprrules import parse_expr as _parse

    if rules is None:
        rules = list(RULES_BY_NAME)
    rules = [RULES_BY_NAME[r] if isinstance(r, str) else r for r in rules]

    tokens = tokenize(sql)
    # significant-token indices with paren depth
    spans = []  # (start_tok_idx_exclusive, end_tok_idx_exclusive)
    depth = 0
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t.kind == "op":
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
        elif (t.kind == "word" and depth == 0
              and t.upper in ("WHERE", "HAVING")):
            j = i + 1
            d2 = 0
            while j < len(tokens):
                tj = tokens[j]
                if tj.kind == "op":
                    if tj.text == "(":
                        d2 += 1
                    elif tj.text == ")":
                        if d2 == 0:
                            break
                        d2 -= 1
                elif (tj.kind == "word" and d2 == 0
                      and tj.upper in _SPAN_END_WORDS):
                    break
                j += 1
            spans.append((i + 1, j))
            i = j
            continue
        i += 1

    total_changes = 0
    out_parts = []
    pos = 0
    for a, b in spans:
        frag = "".join(t.text for t in tokens[a:b])
        try:
            expr = _parse(frag)
        except Exception:
            continue  # conservative: leave the span verbatim
        rewriter = ExprRewriter(rules)
        rewritten = rewriter.rewrite(expr)
        if not rewriter.changed():
            continue
        total_changes += rewriter.num_changes
        out_parts.append("".join(t.text for t in tokens[pos:a]))
        out_parts.append(" " + rewritten.to_sql() + " ")
        pos = b
    out_parts.append("".join(t.text for t in tokens[pos:]))
    return "".join(out_parts).strip(), total_changes
