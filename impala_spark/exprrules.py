"""Expression rewrite rules — the reference's ``org.apache.impala.rewrite``
package re-expressed over a small Python expression AST.

The reference ships three ExprRewriteRules driven by an ExprRewriter
(``fe/src/main/java/org/apache/impala/rewrite/ExprRewriter.java:36-99``):

* ``BetweenToCompoundRule.java:21-49`` — ``A BETWEEN X AND Y`` becomes
  ``A >= X AND A <= Y``; the NOT form becomes a disjunction.
* ``ExtractCommonConjunctRule.java:25-96`` — conjuncts common to both
  children of an OR are hoisted in front:
  ``(a AND b) OR (b AND c)  ==>  b AND ((a) OR (c))``.
* ``FoldConstantsRule.java:24-47`` — a constant expr whose children are
  all literals is evaluated and replaced by the literal result.

The driver applies one rule bottom-up repeatedly until fixpoint, then the
next rule, then the whole list again until no rule fires
(``ExprRewriter.java:48-89``), counting changes.

In our engine Catalyst performs the equivalent optimizations during
planning (ConstantFolding, BooleanSimplification), so these rules are a
*frontend surface*: they let users and tests see the Impala-shape rewrite
and they back the ``to_sql``-level normalization parity pinned by
``T/analysis/ExprRewriteRulesTest.java`` (all 36 RewritesOk cases are
pinned in ``tests/test_exprrules.py``).

Nothing here touches the distributed execution path — the module is pure
Python over token streams, no SparkSession required.
"""

from __future__ import annotations

import base64
import re
from datetime import datetime, timedelta
from decimal import Decimal

from impala_spark.parser import ImpalaUnsupportedError, Token, tokenize

__all__ = [
    "parse_expr",
    "ExprRewriter",
    "BETWEEN_TO_COMPOUND",
    "EXTRACT_COMMON_CONJUNCTS",
    "FOLD_CONSTANTS",
    "rewrite_sql",
    "RULES_BY_NAME",
]


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

class Expr:
    """Base node. ``parens`` mirrors the reference's printSqlInParens flag
    (A/Expr.java) — structural equality ignores it, toSql honors it."""

    __slots__ = ("parens",)

    def __init__(self) -> None:
        self.parens = False

    # -- children ----------------------------------------------------------
    def children(self) -> list["Expr"]:
        return []

    def set_child(self, i: int, child: "Expr") -> None:  # pragma: no cover
        raise IndexError(i)

    # -- identity ----------------------------------------------------------
    def key(self):  # structural identity, parens excluded
        raise NotImplementedError

    def __eq__(self, other) -> bool:
        return isinstance(other, Expr) and self.key() == other.key()

    def __hash__(self) -> int:
        return hash(self.key())

    # -- emission -----------------------------------------------------------
    def _sql(self) -> str:
        raise NotImplementedError

    def to_sql(self) -> str:
        body = self._sql()
        return f"({body})" if self.parens else body

    # -- classification ------------------------------------------------------
    def is_literal(self) -> bool:
        return False

    def is_constant(self) -> bool:
        return all(c.is_constant() for c in self.children())


class _Leaf(Expr):
    __slots__ = ()


class ColumnRef(_Leaf):
    __slots__ = ("path",)

    def __init__(self, path: list[str]):
        super().__init__()
        self.path = path

    def key(self):
        return ("col", tuple(p.lower() for p in self.path))

    def _sql(self) -> str:
        return ".".join(self.path)

    def is_constant(self) -> bool:
        return False


class NumLit(_Leaf):
    __slots__ = ("text",)

    def __init__(self, text: str):
        super().__init__()
        self.text = text

    @classmethod
    def from_value(cls, v) -> "NumLit":
        if isinstance(v, bool):  # guard: bool is int in Python
            raise ValueError("bool is not numeric")
        if isinstance(v, int):
            return cls(str(v))
        if isinstance(v, Decimal):
            return cls(format(v, "f"))
        # double — render like Java's shortest round-trip where easy
        if v == int(v) and abs(v) < 1e16:
            return cls(str(int(v)))
        return cls(repr(v))

    def value(self):
        t = self.text
        if re.fullmatch(r"-?\d+", t):
            return int(t)
        if "e" in t.lower():
            return float(t)
        return Decimal(t)

    def key(self):
        return ("num", str(self.value()))

    def _sql(self) -> str:
        return self.text

    def is_literal(self) -> bool:
        return True


class StrLit(_Leaf):
    """``raw`` is the text between the quotes, still escaped — the
    reference's StringLiteral keeps it that way and toSql prints it
    verbatim (A/StringLiteral.java:74). Computed literals (fold results)
    carry ``computed`` bytes instead."""

    __slots__ = ("raw", "computed")

    def __init__(self, raw: str | None, computed: bytes | None = None):
        super().__init__()
        self.raw = raw
        self.computed = computed

    def value_bytes(self) -> bytes:
        if self.computed is not None:
            return self.computed
        return _unescape_sql_string(self.raw)

    def key(self):
        if self.raw is not None:
            return ("str", self.raw)
        return ("str-bytes", self.computed)

    def _sql(self) -> str:
        if self.raw is not None:
            return f"'{self.raw}'"
        return "'" + _escape_sql_bytes(self.computed) + "'"

    def is_literal(self) -> bool:
        return True


class BoolLit(_Leaf):
    __slots__ = ("val",)

    def __init__(self, val: bool):
        super().__init__()
        self.val = val

    def key(self):
        return ("bool", self.val)

    def _sql(self) -> str:
        return "TRUE" if self.val else "FALSE"

    def is_literal(self) -> bool:
        return True


class NullLit(_Leaf):
    __slots__ = ()

    def key(self):
        return ("null",)

    def _sql(self) -> str:
        return "NULL"

    def is_literal(self) -> bool:
        return True


class TimestampLit(_Leaf):
    __slots__ = ("dt",)

    def __init__(self, dt: datetime):
        super().__init__()
        self.dt = dt

    def key(self):
        return ("ts", self.dt)

    def _sql(self) -> str:
        base = self.dt.strftime("%Y-%m-%d %H:%M:%S")
        if self.dt.microsecond:
            base += f".{self.dt.microsecond:06d}".rstrip("0")
        return f"TIMESTAMP '{base}'"

    def is_literal(self) -> bool:
        return True


class _Nary(Expr):
    __slots__ = ("kids",)

    def __init__(self, kids: list[Expr]):
        super().__init__()
        self.kids = kids

    def children(self) -> list[Expr]:
        return self.kids

    def set_child(self, i: int, child: Expr) -> None:
        self.kids[i] = child


class Arith(_Nary):
    __slots__ = ("op",)

    def __init__(self, op: str, left: Expr, right: Expr):
        super().__init__([left, right])
        self.op = op  # + - * / % DIV & | ^

    def key(self):
        return ("arith", self.op, self.kids[0].key(), self.kids[1].key())

    def _sql(self) -> str:
        return f"{self.kids[0].to_sql()} {self.op} {self.kids[1].to_sql()}"


class UnaryMinus(_Nary):
    __slots__ = ()

    def __init__(self, child: Expr):
        super().__init__([child])

    def key(self):
        return ("neg", self.kids[0].key())

    def _sql(self) -> str:
        return f"-{self.kids[0].to_sql()}"


class BinaryPred(_Nary):
    __slots__ = ("op",)

    def __init__(self, op: str, left: Expr, right: Expr):
        super().__init__([left, right])
        self.op = op  # = != <> < <= > >= LIKE RLIKE REGEXP <=>

    def key(self):
        op = "!=" if self.op == "<>" else self.op
        return ("cmp", op, self.kids[0].key(), self.kids[1].key())

    def _sql(self) -> str:
        return f"{self.kids[0].to_sql()} {self.op} {self.kids[1].to_sql()}"


class Compound(_Nary):
    """AND / OR (binary) and NOT (unary) — A/CompoundPredicate.java."""

    __slots__ = ("op",)

    def __init__(self, op: str, kids: list[Expr]):
        super().__init__(kids)
        self.op = op  # AND OR NOT

    def key(self):
        return ("compound", self.op, tuple(k.key() for k in self.kids))

    def _child_sql(self, child: Expr) -> str:
        """Emission must re-parse to the same tree: a looser-binding
        compound child needs parens even when the analyzer's
        printSqlInParens flag is unset (AND over OR; NOT over AND/OR).
        The reference's toSql has the same ambiguity but its rewriter
        never re-parses the text; ours is executed."""
        text = child.to_sql()
        if child.parens or not isinstance(child, Compound):
            return text
        if self.op == "AND" and child.op == "OR":
            return f"({text})"
        if self.op == "NOT" and child.op in ("AND", "OR"):
            return f"({text})"
        return text

    def _sql(self) -> str:
        if self.op == "NOT":
            return f"NOT {self._child_sql(self.kids[0])}"
        return (f"{self._child_sql(self.kids[0])} {self.op} "
                f"{self._child_sql(self.kids[1])}")


class Between(_Nary):
    __slots__ = ("negated",)

    def __init__(self, negated: bool, value: Expr, lo: Expr, hi: Expr):
        super().__init__([value, lo, hi])
        self.negated = negated

    def key(self):
        return ("between", self.negated, tuple(k.key() for k in self.kids))

    def _sql(self) -> str:
        kw = "NOT BETWEEN" if self.negated else "BETWEEN"
        return (
            f"{self.kids[0].to_sql()} {kw} "
            f"{self.kids[1].to_sql()} AND {self.kids[2].to_sql()}"
        )


class IsNull(_Nary):
    __slots__ = ("negated",)

    def __init__(self, negated: bool, child: Expr):
        super().__init__([child])
        self.negated = negated

    def key(self):
        return ("isnull", self.negated, self.kids[0].key())

    def _sql(self) -> str:
        kw = "IS NOT NULL" if self.negated else "IS NULL"
        return f"{self.kids[0].to_sql()} {kw}"


class InPred(_Nary):
    __slots__ = ("negated",)

    def __init__(self, negated: bool, value: Expr, items: list[Expr]):
        super().__init__([value] + items)
        self.negated = negated

    def key(self):
        return ("in", self.negated, tuple(k.key() for k in self.kids))

    def _sql(self) -> str:
        kw = "NOT IN" if self.negated else "IN"
        items = ", ".join(k.to_sql() for k in self.kids[1:])
        return f"{self.kids[0].to_sql()} {kw} ({items})"


class Subquery(_Leaf):
    """A (SELECT ...) appearing in expression position — A/Subquery.java.
    Holds an opaque statement object (see stmtrewriter) so the rewriter
    driver can recurse into the statement's own expr trees; rules that
    must not fire on subquery-containing exprs test contains_subquery."""

    __slots__ = ("stmt",)

    def __init__(self, stmt):
        super().__init__()
        self.stmt = stmt

    def key(self):
        return ("subquery", id(self.stmt))

    def _sql(self) -> str:
        return f"({self.stmt.to_sql()})"

    def is_constant(self) -> bool:
        return False


class Exists(_Nary):
    """EXISTS (subquery) — A/ExistsPredicate.java."""

    __slots__ = ("negated",)

    def __init__(self, negated: bool, subquery: Subquery):
        super().__init__([subquery])
        self.negated = negated

    def key(self):
        return ("exists", self.negated, self.kids[0].key())

    def _sql(self) -> str:
        kw = "NOT EXISTS" if self.negated else "EXISTS"
        return f"{kw} {self.kids[0].to_sql()}"


def contains_subquery(expr: Expr) -> bool:
    if isinstance(expr, Subquery):
        return True
    return any(contains_subquery(c) for c in expr.children())


class FuncCall(_Nary):
    __slots__ = ("name", "star")

    def __init__(self, name: str, args: list[Expr], star: bool = False):
        super().__init__(args)
        self.name = name.lower()
        self.star = star

    def key(self):
        return ("fn", self.name, self.star,
                tuple(k.key() for k in self.kids))

    def _sql(self) -> str:
        if self.star:
            return f"{self.name}(*)"
        return f"{self.name}({', '.join(k.to_sql() for k in self.kids)})"

    def is_constant(self) -> bool:
        if self.name in _NONDETERMINISTIC_FNS or self.name in _AGG_FNS:
            return False
        return super().is_constant()


class Cast(_Nary):
    __slots__ = ("type_sql",)

    def __init__(self, child: Expr, type_sql: str):
        super().__init__([child])
        self.type_sql = type_sql.upper()

    def key(self):
        return ("cast", self.type_sql, self.kids[0].key())

    def _sql(self) -> str:
        return f"CAST({self.kids[0].to_sql()} AS {self.type_sql})"


class IntervalArith(_Nary):
    """``ts + INTERVAL n unit`` — A/TimestampArithmeticExpr.java."""

    __slots__ = ("op", "unit")

    def __init__(self, op: str, ts: Expr, amount: Expr, unit: str):
        super().__init__([ts, amount])
        self.op = op  # + or -
        self.unit = unit.lower()

    def key(self):
        return ("interval", self.op, self.unit,
                self.kids[0].key(), self.kids[1].key())

    def _sql(self) -> str:
        return (
            f"{self.kids[0].to_sql()} {self.op} "
            f"INTERVAL {self.kids[1].to_sql()} {self.unit}"
        )


class CaseExpr(_Nary):
    """CASE [expr] WHEN .. THEN .. [ELSE ..] END. Children laid out as
    [case_expr?] + when/then pairs + [else]; flags record the shape."""

    __slots__ = ("has_case", "has_else")

    def __init__(self, has_case: bool, has_else: bool, kids: list[Expr]):
        super().__init__(kids)
        self.has_case = has_case
        self.has_else = has_else

    def key(self):
        return ("case", self.has_case, self.has_else,
                tuple(k.key() for k in self.kids))

    def _sql(self) -> str:
        parts = ["CASE"]
        idx = 0
        if self.has_case:
            parts.append(self.kids[0].to_sql())
            idx = 1
        tail = len(self.kids) - (1 if self.has_else else 0)
        while idx < tail:
            parts.append(f"WHEN {self.kids[idx].to_sql()}")
            parts.append(f"THEN {self.kids[idx + 1].to_sql()}")
            idx += 2
        if self.has_else:
            parts.append(f"ELSE {self.kids[-1].to_sql()}")
        parts.append("END")
        return " ".join(parts)


_NONDETERMINISTIC_FNS = {"rand", "random", "uuid"}
_AGG_FNS = {
    "count", "sum", "avg", "min", "max", "ndv", "group_concat",
    "appx_median", "stddev", "stddev_samp", "stddev_pop", "variance",
    "variance_samp", "variance_pop", "var_samp", "var_pop",
}


# ---------------------------------------------------------------------------
# String escapes (Hive-compatible, see StringLiteral.getUnescapedValue —
# A/StringLiteral.java:85 delegates to Hive's unescapeSQLString)
# ---------------------------------------------------------------------------

_SIMPLE_ESCAPES = {
    "b": b"\b", "f": b"\f", "n": b"\n", "r": b"\r", "t": b"\t",
    "'": b"'", '"': b'"', "\\": b"\\", "`": b"`",
    # LIKE wildcards keep their backslash (Hive semantics)
    "%": b"\\%", "_": b"\\_",
}


def _unescape_sql_string(raw: str) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        ch = raw[i]
        if ch == "\\" and i + 1 < n:
            nxt = raw[i + 1]
            m = re.match(r"[0-7]{1,3}", raw[i + 1:i + 4])
            if m and nxt.isdigit():
                code = int(m.group(), 8)
                if code <= 0xFF:
                    out.append(code)
                    i += 1 + len(m.group())
                    continue
            if nxt in _SIMPLE_ESCAPES:
                out += _SIMPLE_ESCAPES[nxt]
                i += 2
                continue
            # unknown escape: drop the backslash, keep the char
            out += nxt.encode("utf-8")
            i += 2
            continue
        if ch == "'" and i + 1 < n and raw[i + 1] == "'":
            out.append(ord("'"))
            i += 2
            continue
        out += ch.encode("utf-8")
        i += 1
    return bytes(out)


def _escape_sql_bytes(val: bytes) -> str:
    out = []
    for b in val:
        c = chr(b)
        if c == "'":
            out.append("\\'")
        elif c == "\\":
            out.append("\\\\")
        elif 32 <= b < 127:
            out.append(c)
        else:
            out.append(f"\\{b:03o}")
    return "".join(out)


# ---------------------------------------------------------------------------
# Expression parser (recursive descent over parser.tokenize tokens)
# ---------------------------------------------------------------------------

_CMP_OPS = {"=", "!=", "<>", "<", "<=", ">", ">=", "<=>"}
_TYPE_WORDS = {
    "INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT", "BOOLEAN", "STRING",
    "DOUBLE", "FLOAT", "REAL", "TIMESTAMP", "DECIMAL", "CHAR", "VARCHAR",
    "DATE", "BINARY",
}


class _P:
    #: optional hook: callable(self) -> stmt object, invoked with the
    #: cursor ON the statement's first token, returning with the cursor
    #: past its last token (stmtrewriter sets this to parse subqueries)
    subselect_hook = None

    def __init__(self, tokens: list[Token]):
        self.toks = [t for t in tokens
                     if t.kind not in ("ws", "line_comment", "block_comment")]
        self.i = 0

    def _at_subselect(self, off: int = 0) -> bool:
        t = self.peek(off)
        return (self.subselect_hook is not None and t is not None
                and t.kind == "word"
                and t.upper in ("SELECT", "WITH", "VALUES"))

    def _subquery(self) -> "Subquery":
        stmt = type(self).subselect_hook(self)
        return Subquery(stmt)

    # -- cursor helpers ------------------------------------------------------
    def peek(self, off: int = 0) -> Token | None:
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else None

    def at_word(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "word" and t.upper in words

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "op" and t.text in ops

    def take(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_op(self, op: str) -> None:
        if not self.at_op(op):
            got = self.peek().text if self.peek() else "<eof>"
            raise ImpalaUnsupportedError(f"expected {op!r}, got {got!r}")
        self.take()

    def expect_word(self, word: str) -> None:
        if not self.at_word(word):
            got = self.peek().text if self.peek() else "<eof>"
            raise ImpalaUnsupportedError(f"expected {word}, got {got!r}")
        self.take()

    # -- grammar -------------------------------------------------------------
    def parse(self) -> Expr:
        e = self.or_expr()
        if self.i != len(self.toks):
            raise ImpalaUnsupportedError(
                f"trailing tokens at {self.peek().text!r}")
        return e

    def or_expr(self) -> Expr:
        e = self.and_expr()
        while self.at_word("OR") or self.at_op("||"):
            self.take()
            e = Compound("OR", [e, self.and_expr()])
        return e

    def and_expr(self) -> Expr:
        e = self.not_expr()
        while self.at_word("AND") or self.at_op("&&"):
            self.take()
            e = Compound("AND", [e, self.not_expr()])
        return e

    def not_expr(self) -> Expr:
        if self.at_word("NOT") or self.at_op("!"):
            # '!' only prefixes; postfix '!=' is one token already
            self.take()
            return Compound("NOT", [self.not_expr()])
        return self.predicate()

    def predicate(self) -> Expr:
        e = self.additive()
        while True:
            if self.at_word("BETWEEN"):
                self.take()
                lo = self.additive()
                self.expect_word("AND")
                hi = self.additive()
                e = Between(False, e, lo, hi)
            elif self.at_word("NOT") and self.peek(1) is not None \
                    and self.peek(1).upper == "BETWEEN":
                self.take(); self.take()
                lo = self.additive()
                self.expect_word("AND")
                hi = self.additive()
                e = Between(True, e, lo, hi)
            elif self.at_word("IS"):
                self.take()
                negated = False
                if self.at_word("NOT"):
                    self.take()
                    negated = True
                self.expect_word("NULL")
                e = IsNull(negated, e)
            elif self.at_word("IN") or (
                    self.at_word("NOT") and self.peek(1) is not None
                    and self.peek(1).upper == "IN"):
                negated = self.peek().upper == "NOT"
                if negated:
                    self.take()
                self.take()
                self.expect_op("(")
                if self._at_subselect():
                    items: list[Expr] = [self._subquery()]
                else:
                    items = [self.or_expr()]
                    while self.at_op(","):
                        self.take()
                        items.append(self.or_expr())
                self.expect_op(")")
                e = InPred(negated, e, items)
            elif self.at_word("LIKE", "RLIKE", "REGEXP", "ILIKE", "IREGEXP"):
                op = self.take().upper
                e = BinaryPred(op, e, self.additive())
            elif self.at_word("NOT") and self.peek(1) is not None \
                    and self.peek(1).upper in ("LIKE", "RLIKE", "REGEXP"):
                self.take()
                op = self.take().upper
                e = Compound("NOT", [BinaryPred(op, e, self.additive())])
            elif self.at_op(*_CMP_OPS):
                op = self.take().text
                e = BinaryPred(op, e, self.additive())
            else:
                return e

    def additive(self) -> Expr:
        e = self.multiplicative()
        while self.at_op("+", "-"):
            op = self.take().text
            if self.at_word("INTERVAL"):
                self.take()
                amount = self.multiplicative()
                unit_tok = self.take()
                e = IntervalArith(op, e, amount, unit_tok.text)
            else:
                e = Arith(op, e, self.multiplicative())
        return e

    def multiplicative(self) -> Expr:
        e = self.unary()
        while self.at_op("*", "/", "%") or self.at_word("DIV"):
            tok = self.take()
            op = "DIV" if tok.kind == "word" else tok.text
            e = Arith(op, e, self.unary())
        return e

    def unary(self) -> Expr:
        if self.at_op("-"):
            self.take()
            return UnaryMinus(self.unary())
        if self.at_op("+"):
            self.take()
            return self.unary()
        return self.primary()

    def _type_sql(self) -> str:
        tok = self.take()
        if tok.kind != "word" or tok.upper not in _TYPE_WORDS:
            raise ImpalaUnsupportedError(f"unknown type {tok.text!r}")
        base = tok.upper
        if self.at_op("("):
            self.take()
            args = []
            while not self.at_op(")"):
                args.append(self.take().text)
            self.take()
            return f"{base}({''.join(args)})"
        return base

    def primary(self) -> Expr:
        t = self.peek()
        if t is None:
            raise ImpalaUnsupportedError("unexpected end of expression")
        if t.kind == "number":
            self.take()
            return NumLit(t.text)
        if t.kind == "string":
            self.take()
            return StrLit(t.text[1:-1])
        if t.kind == "word":
            up = t.upper
            if up == "NULL":
                self.take()
                return NullLit()
            if up in ("TRUE", "FALSE"):
                self.take()
                return BoolLit(up == "TRUE")
            if up == "CAST":
                self.take()
                self.expect_op("(")
                inner = self.or_expr()
                self.expect_word("AS")
                type_sql = self._type_sql()
                self.expect_op(")")
                return Cast(inner, type_sql)
            if up == "CASE":
                return self._case()
            if up == "EXISTS" and self.peek(1) is not None \
                    and self.peek(1).text == "(" and self._at_subselect(2):
                self.take()
                self.take()  # (
                sq = self._subquery()
                self.expect_op(")")
                return Exists(False, sq)
            if up == "INTERVAL":
                raise ImpalaUnsupportedError(
                    "INTERVAL is only valid beside +/- in this surface")
            nxt = self.peek(1)
            if nxt is not None and nxt.kind == "op" and nxt.text == "(":
                name = self.take().text
                self.take()  # (
                args: list[Expr] = []
                star = False
                if self.at_op("*") and self.peek(1) is not None \
                        and self.peek(1).text == ")":
                    self.take()  # star argument: no children (count(*))
                    star = True
                elif not self.at_op(")"):
                    args.append(self.or_expr())
                    while self.at_op(","):
                        self.take()
                        args.append(self.or_expr())
                self.expect_op(")")
                return FuncCall(name, args, star=star)
            # dotted column ref
            path = [self.take().text]
            while self.at_op(".") and self.peek(1) is not None \
                    and self.peek(1).kind in ("word", "bident"):
                self.take()
                part = self.take().text
                path.append(part.strip("`"))
            return ColumnRef(path)
        if t.kind == "bident":
            self.take()
            return ColumnRef([t.text.strip("`")])
        if t.kind == "op" and t.text == "(":
            self.take()
            if self._at_subselect():
                sq = self._subquery()
                self.expect_op(")")
                return sq
            inner = self.or_expr()
            self.expect_op(")")
            inner.parens = True
            return inner
        raise ImpalaUnsupportedError(f"cannot parse expression at {t.text!r}")

    def _case(self) -> Expr:
        self.expect_word("CASE")
        kids: list[Expr] = []
        has_case = not self.at_word("WHEN")
        if has_case:
            kids.append(self.or_expr())
        while self.at_word("WHEN"):
            self.take()
            kids.append(self.or_expr())
            self.expect_word("THEN")
            kids.append(self.or_expr())
        has_else = self.at_word("ELSE")
        if has_else:
            self.take()
            kids.append(self.or_expr())
        self.expect_word("END")
        return CaseExpr(has_case, has_else, kids)


def parse_expr(expr_sql: str) -> Expr:
    return _P(tokenize(expr_sql)).parse()


# ---------------------------------------------------------------------------
# Rules
# ---------------------------------------------------------------------------

class _Rule:
    name = "rule"

    def apply(self, expr: Expr) -> Expr:
        return expr


class BetweenToCompoundRule(_Rule):
    """BetweenToCompoundRule.java:21-49."""

    name = "between_to_compound"

    def apply(self, expr: Expr) -> Expr:
        if not isinstance(expr, Between):
            return expr
        val, lo, hi = expr.kids
        if expr.negated:
            return Compound("OR", [
                BinaryPred("<", val, lo), BinaryPred(">", val, hi)])
        return Compound("AND", [
            BinaryPred(">=", val, lo), BinaryPred("<=", val, hi)])


def _conjuncts(e: Expr) -> list[Expr]:
    """Flatten an AND tree (A/Expr.getConjuncts)."""
    if isinstance(e, Compound) and e.op == "AND":
        return _conjuncts(e.kids[0]) + _conjuncts(e.kids[1])
    return [e]


def _conjunctive(exprs: list[Expr]) -> Expr:
    out = exprs[0]
    for nxt in exprs[1:]:
        out = Compound("AND", [out, nxt])
    return out


def _disjunctive(exprs: list[Expr]) -> Expr:
    out = exprs[0]
    for nxt in exprs[1:]:
        out = Compound("OR", [out, nxt])
    return out


class ExtractCommonConjunctRule(_Rule):
    """ExtractCommonConjunctRule.java:25-96 — applied bottom-up to binary
    OR nodes; conjuncts present in BOTH children are hoisted in front,
    preserving the first child's ordering; parens flags mirror the
    reference exactly (cleared on hoisted conjuncts, inherited on the
    residual disjuncts, forced on the new disjunction)."""

    name = "extract_common_conjuncts"

    MAX_EQUALS_COMPARISONS = 30 * 30

    def apply(self, expr: Expr) -> Expr:
        if not (isinstance(expr, Compound) and expr.op == "OR"):
            return expr
        c0 = _conjuncts(expr.kids[0])
        c1 = _conjuncts(expr.kids[1])
        if len(c0) * len(c1) > self.MAX_EQUALS_COMPARISONS:
            return expr
        common = []
        for conj in c0:
            if conj in c1:
                conj.parens = False
                common.append(conj)
        if not common:
            return expr
        rem0 = [c for c in c0 if not any(c is x or c == x for x in common)]
        rem1 = [c for c in c1 if not any(c is x or c == x for x in common)]
        if not rem0 or not rem1:
            # one side implied the other: (a AND b) OR (a) ==> a
            return _conjunctive(common)
        d0 = _conjunctive(rem0)
        d0.parens = expr.kids[0].parens
        d1 = _conjunctive(rem1)
        d1.parens = expr.kids[1].parens
        disjunction = _disjunctive([d0, d1])
        disjunction.parens = True
        return Compound("AND", [_conjunctive(common), disjunction])


class _CannotFold(Exception):
    pass


class FoldConstantsRule(_Rule):
    """FoldConstantsRule.java:24-47 — folds a constant node whose children
    are all literals. The reference evaluates in its backend and refuses
    when evaluation fails/warns or the result string isn't ASCII-safe
    (the thrift round-trip); we mirror that with a Python evaluator over
    the builtin surface and refuse (returning the node unchanged) for
    anything we can't evaluate exactly."""

    name = "fold_constants"

    def apply(self, expr: Expr) -> Expr:
        for child in expr.children():
            if not child.is_literal():
                return expr
        if expr.is_literal() or not expr.is_constant():
            return expr
        try:
            val = _eval(expr)
        except _CannotFold:
            return expr
        try:
            return _to_literal(val)
        except _CannotFold:
            return expr


def _to_literal(val) -> Expr:
    if val is None:
        return NullLit()
    if isinstance(val, bool):
        return BoolLit(val)
    if isinstance(val, (int, Decimal, float)):
        return NumLit.from_value(val)
    if isinstance(val, bytes):
        if any(b > 127 for b in val):
            # strings with chars > 127 are not folded
            # (ExprRewriteRulesTest.java:222-223)
            raise _CannotFold()
        return StrLit(None, computed=val)
    if isinstance(val, datetime):
        return TimestampLit(val)
    raise _CannotFold()


# -- constant evaluator ------------------------------------------------------

def _eval(e: Expr):
    if isinstance(e, NumLit):
        return e.value()
    if isinstance(e, StrLit):
        return e.value_bytes()
    if isinstance(e, BoolLit):
        return e.val
    if isinstance(e, NullLit):
        return None
    if isinstance(e, TimestampLit):
        return e.dt
    if isinstance(e, UnaryMinus):
        v = _eval(e.kids[0])
        if v is None:
            return None
        return -v
    if isinstance(e, Arith):
        return _eval_arith(e)
    if isinstance(e, BinaryPred):
        return _eval_cmp(e)
    if isinstance(e, Compound):
        return _eval_compound(e)
    if isinstance(e, IsNull):
        v = _eval(e.kids[0])
        return (v is None) != e.negated
    if isinstance(e, Between):
        v, lo, hi = (_eval(k) for k in e.kids)
        if v is None or lo is None or hi is None:
            return None
        inside = lo <= v <= hi
        return (not inside) if e.negated else inside
    if isinstance(e, Cast):
        return _eval_cast(e)
    if isinstance(e, IntervalArith):
        return _eval_interval(e)
    if isinstance(e, FuncCall):
        return _eval_fn(e)
    raise _CannotFold()


def _num(v):
    if isinstance(v, (int, Decimal, float)) and not isinstance(v, bool):
        return v
    raise _CannotFold()


def _eval_arith(e: Arith):
    left = _eval(e.kids[0])
    right = _eval(e.kids[1])
    if left is None or right is None:
        return None
    left, right = _num(left), _num(right)
    if isinstance(left, float) or isinstance(right, float):
        left, right = float(left), float(right)
    elif isinstance(left, Decimal) or isinstance(right, Decimal):
        left, right = Decimal(left), Decimal(right)
    op = e.op
    if op == "+":
        return left + right
    if op == "-":
        return left - right
    if op == "*":
        return left * right
    if op == "/":
        if right == 0:
            return None
        return float(left) / float(right)
    if op == "%":
        if right == 0:
            return None
        if isinstance(left, int) and isinstance(right, int):
            # Impala % truncates toward zero like C
            q = abs(left) % abs(right)
            return -q if left < 0 else q
        raise _CannotFold()
    if op == "DIV":
        if not (isinstance(left, int) and isinstance(right, int)):
            raise _CannotFold()
        if right == 0:
            return None
        q = abs(left) // abs(right)
        return -q if (left < 0) != (right < 0) else q
    raise _CannotFold()


def _cmp_pair(left, right):
    if isinstance(left, bytes) and isinstance(right, bytes):
        return left, right
    if isinstance(left, datetime) and isinstance(right, datetime):
        return left, right
    if isinstance(left, bool) and isinstance(right, bool):
        return left, right
    return _num(left), _num(right)


def _eval_cmp(e: BinaryPred):
    left = _eval(e.kids[0])
    right = _eval(e.kids[1])
    op = e.op
    if op == "<=>":
        if left is None or right is None:
            return left is None and right is None
        op = "="
    if left is None or right is None:
        return None
    if op in ("LIKE", "ILIKE"):
        return _eval_like(left, right, ci=op == "ILIKE")
    if op in ("RLIKE", "REGEXP", "IREGEXP"):
        try:
            flags = re.IGNORECASE if op == "IREGEXP" else 0
            return re.search(right.decode("utf-8"),
                             left.decode("utf-8"), flags) is not None
        except Exception:
            raise _CannotFold()
    left, right = _cmp_pair(left, right)
    if isinstance(left, Decimal) or isinstance(right, Decimal):
        if isinstance(left, float) or isinstance(right, float):
            left, right = float(left), float(right)
    if op == "=":
        return left == right
    if op in ("!=", "<>"):
        return left != right
    if op == "<":
        return left < right
    if op == "<=":
        return left <= right
    if op == ">":
        return left > right
    if op == ">=":
        return left >= right
    raise _CannotFold()


def _eval_like(value: bytes, pattern: bytes, ci: bool = False) -> bool:
    if not isinstance(value, bytes) or not isinstance(pattern, bytes):
        raise _CannotFold()
    rx = []
    i = 0
    while i < len(pattern):
        c = pattern[i:i + 1]
        if c == b"\\" and i + 1 < len(pattern):
            rx.append(re.escape(pattern[i + 1:i + 2].decode("latin-1")))
            i += 2
            continue
        if c == b"%":
            rx.append(".*")
        elif c == b"_":
            rx.append(".")
        else:
            rx.append(re.escape(c.decode("latin-1")))
        i += 1
    flags = re.DOTALL | (re.IGNORECASE if ci else 0)
    return re.fullmatch("".join(rx), value.decode("latin-1"), flags) is not None


def _eval_compound(e: Compound):
    if e.op == "NOT":
        v = _eval(e.kids[0])
        if v is None:
            return None
        if not isinstance(v, bool):
            raise _CannotFold()
        return not v
    left = _eval(e.kids[0])
    right = _eval(e.kids[1])
    for v in (left, right):
        if v is not None and not isinstance(v, bool):
            raise _CannotFold()
    if e.op == "AND":
        if left is False or right is False:
            return False
        if left is None or right is None:
            return None
        return True
    if e.op == "OR":
        if left is True or right is True:
            return True
        if left is None or right is None:
            return None
        return False
    raise _CannotFold()


_TS_FORMATS = (
    "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M",
    "%Y-%m-%d",
)


def _parse_ts(text: str) -> datetime:
    for fmt in _TS_FORMATS:
        try:
            return datetime.strptime(text, fmt)
        except ValueError:
            continue
    raise _CannotFold()


def _eval_cast(e: Cast):
    v = _eval(e.kids[0])
    if v is None:
        return None
    base = e.type_sql.split("(")[0]
    try:
        if base in ("INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT"):
            if isinstance(v, bool):
                n = int(v)
            elif isinstance(v, bytes):
                n = int(v.decode("utf-8").strip())
            elif isinstance(v, float) or isinstance(v, Decimal):
                n = int(v)  # truncation toward zero
            else:
                n = int(v)
            limits = {"TINYINT": 127, "SMALLINT": 32767,
                      "INT": 2147483647, "INTEGER": 2147483647,
                      "BIGINT": 2 ** 63 - 1}
            if abs(n) > limits[base]:
                return None
            return n
        if base in ("DOUBLE", "FLOAT", "REAL"):
            if isinstance(v, bytes):
                return float(v.decode("utf-8").strip())
            return float(v)
        if base == "DECIMAL":
            raise _CannotFold()  # precision/overflow warning surface
        if base == "STRING":
            if isinstance(v, bytes):
                return v
            if isinstance(v, bool):
                return b"true" if v else b"false"
            if isinstance(v, datetime):
                return TimestampLit(v)._sql().split("'")[1].encode()
            return str(v).encode("utf-8")
        if base == "TIMESTAMP":
            if isinstance(v, datetime):
                return v
            if isinstance(v, bytes):
                return _parse_ts(v.decode("utf-8").strip())
            raise _CannotFold()
        if base == "BOOLEAN":
            if isinstance(v, bool):
                return v
            if isinstance(v, (int, float, Decimal)):
                return v != 0
            raise _CannotFold()
    except (ValueError, UnicodeDecodeError):
        return None
    raise _CannotFold()


def _eval_interval(e: IntervalArith):
    ts = _eval(e.kids[0])
    amount = _eval(e.kids[1])
    if ts is None or amount is None:
        return None
    if not isinstance(ts, datetime) or not isinstance(amount, int):
        raise _CannotFold()
    if e.op == "-":
        amount = -amount
    unit = e.unit.rstrip("s")
    if unit == "year":
        return _add_months(ts, amount * 12)
    if unit == "month":
        return _add_months(ts, amount)
    deltas = {
        "week": timedelta(weeks=1), "day": timedelta(days=1),
        "hour": timedelta(hours=1), "minute": timedelta(minutes=1),
        "second": timedelta(seconds=1),
        "millisecond": timedelta(milliseconds=1),
        "microsecond": timedelta(microseconds=1),
    }
    if unit in deltas:
        return ts + deltas[unit] * amount
    raise _CannotFold()


def _add_months(ts: datetime, months: int) -> datetime:
    month0 = ts.year * 12 + (ts.month - 1) + months
    year, month = divmod(month0, 12)
    month += 1
    day = ts.day
    while day > 28:
        try:
            return ts.replace(year=year, month=month, day=day)
        except ValueError:
            day -= 1
    return ts.replace(year=year, month=month, day=day)


def _bytes_arg(v) -> bytes:
    if isinstance(v, bytes):
        return v
    raise _CannotFold()


def _eval_fn(e: FuncCall):
    args = [_eval(k) for k in e.kids]
    name = e.name
    if name == "if":
        if len(args) != 3:
            raise _CannotFold()
        return args[1] if args[0] is True else args[2]
    if name in ("coalesce", "nvl"):
        for a in args:
            if a is not None:
                return a
        return None
    if name in ("isnull", "ifnull"):
        return args[0] if args[0] is not None else args[1]
    if name == "nullif":
        return None if args[0] == args[1] else args[0]
    # string functions below — NULL propagates
    if any(a is None for a in args):
        return None
    if name in ("upper", "ucase", "toupper"):
        return _bytes_arg(args[0]).upper()
    if name in ("lower", "lcase", "tolower"):
        return _bytes_arg(args[0]).lower()
    if name == "length":
        return len(_bytes_arg(args[0]))
    if name == "reverse":
        return _bytes_arg(args[0])[::-1]
    if name == "concat":
        return b"".join(_bytes_arg(a) for a in args)
    if name in ("substr", "substring"):
        s = _bytes_arg(args[0])
        pos = int(_num(args[1]))
        if pos == 0:
            return b""
        start = pos - 1 if pos > 0 else len(s) + pos
        if start < 0:
            return b""
        n = int(_num(args[2])) if len(args) > 2 else len(s)
        if n < 0:
            return b""
        return s[start:start + n]
    if name == "trim":
        return _bytes_arg(args[0]).strip(b" ")
    if name == "ltrim":
        return _bytes_arg(args[0]).lstrip(b" ")
    if name == "rtrim":
        return _bytes_arg(args[0]).rstrip(b" ")
    if name == "base64encode":
        return base64.b64encode(_bytes_arg(args[0]))
    if name == "base64decode":
        try:
            return base64.b64decode(_bytes_arg(args[0]), validate=True)
        except Exception:
            return None
    if name == "hex":
        v = args[0]
        if isinstance(v, int):
            return format(v, "X").encode()
        return _bytes_arg(v).hex().upper().encode()
    if name == "unhex":
        try:
            return bytes.fromhex(_bytes_arg(args[0]).decode("ascii"))
        except Exception:
            return b""
    if name == "abs":
        return abs(_num(args[0]))
    if name == "negative":
        return -_num(args[0])
    if name == "positive":
        return _num(args[0])
    if name == "factorial":
        n = int(_num(args[0]))
        if n < 0:
            return None
        if n > 20:
            raise _CannotFold()
        out = 1
        for k in range(2, n + 1):
            out *= k
        return out
    if name in ("pow", "power"):
        return float(_num(args[0])) ** float(_num(args[1]))
    if name == "sqrt":
        v = float(_num(args[0]))
        if v < 0:
            return float("nan")
        return v ** 0.5
    if name in ("floor", "dfloor"):
        import math
        return int(math.floor(float(_num(args[0]))))
    if name in ("ceil", "ceiling", "dceil"):
        import math
        return int(math.ceil(float(_num(args[0]))))
    raise _CannotFold()


# ---------------------------------------------------------------------------
# Driver (ExprRewriter.java:36-99)
# ---------------------------------------------------------------------------

class ExprRewriter:
    def __init__(self, rules):
        if not isinstance(rules, (list, tuple)):
            rules = [rules]  # a single rule (any object with .apply)
        self.rules = list(rules)
        self.num_changes = 0

    def reset(self) -> None:
        self.num_changes = 0

    def changed(self) -> bool:
        return self.num_changes > 0

    def get_num_changes(self) -> int:
        return self.num_changes

    def rewrite(self, expr: Expr) -> Expr:
        while True:
            before = self.num_changes
            for rule in self.rules:
                expr = self._apply_repeatedly(expr, rule)
            if before == self.num_changes:
                return expr

    def _apply_repeatedly(self, expr: Expr, rule: _Rule) -> Expr:
        while True:
            before = self.num_changes
            expr = self._apply_bottom_up(expr, rule)
            if before == self.num_changes:
                return expr

    def _apply_bottom_up(self, expr: Expr, rule: _Rule) -> Expr:
        for i, child in enumerate(expr.children()):
            expr.set_child(i, self._apply_bottom_up(child, rule))
        rewritten = rule.apply(expr)
        if rewritten is not expr:
            self.num_changes += 1
        return rewritten


BETWEEN_TO_COMPOUND = BetweenToCompoundRule()
EXTRACT_COMMON_CONJUNCTS = ExtractCommonConjunctRule()
FOLD_CONSTANTS = FoldConstantsRule()

RULES_BY_NAME = {
    "between_to_compound": BETWEEN_TO_COMPOUND,
    "extract_common_conjuncts": EXTRACT_COMMON_CONJUNCTS,
    "fold_constants": FOLD_CONSTANTS,
}


def rewrite_sql(expr_sql: str, rules) -> tuple[str, int]:
    """Parse ``expr_sql``, run the rewriter, return (rewritten toSql,
    number of changes). Mirrors ExprRewriteRulesTest.RewritesOk."""
    if isinstance(rules, str):
        rules = [RULES_BY_NAME[rules]]
    elif isinstance(rules, _Rule):
        rules = [rules]
    else:
        rules = [RULES_BY_NAME[r] if isinstance(r, str) else r
                 for r in rules]
    expr = parse_expr(expr_sql)
    rewriter = ExprRewriter(rules)
    out = rewriter.rewrite(expr)
    return out.to_sql(), rewriter.num_changes
