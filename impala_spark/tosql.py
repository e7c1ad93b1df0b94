"""Impala toSql emission: parse a statement and re-emit it the way the
reference's analyzed-statement `toSql()` prints it.

This is the surface `T/analysis/ToSqlTest.java` pins (views persist
their definition through it, EXPLAIN and error messages quote it, and
`SHOW CREATE VIEW` replays it). The reference implements it per AST
node (`A/SelectStmt.java#toSql`, `A/Expr.java#toSql`,
`A/SortInfo.java`, `A/CastExpr.java#toSqlImpl`); here it is a
token-level normalizer over the same tokenizer the dialect shim uses —
no AST needed because toSql's output is a deterministic re-spelling of
the input token stream plus a handful of local rewrites:

- clause keywords uppercased, function names lowercased
  (`A/FunctionName.java` lowercases on construction)
- double-quoted string literals re-emitted single-quoted
  (`A/StringLiteral.java#toSqlImpl`)
- alias `AS` dropped (`A/SelectListItem.java#toSql` prints `expr alias`;
  the `AS` inside CAST is kept)
- bare table refs qualified with the session database
  (`A/BaseTableRef.java#toSql` prints the fully-qualified name,
  ToSqlTest "Unqualified table/view names should be fully qualified in
  the generated SQL (IMPALA-962)")
- ORDER BY items always carry an explicit direction, and NULLS
  FIRST/LAST is printed only when it differs from the direction's
  default — ASC defaults NULLS LAST, DESC defaults NULLS FIRST
  (`A/SortInfo.java`, ToSqlTest.java:545-574)
- `OFFSET 0` is not printed (`A/QueryStmt.java`, ToSqlTest.java:559-565)
- `CAST(x AS DECIMAL)` expands the default precision/scale to
  `DECIMAL(9,0)` (`C/ScalarType.java` DEFAULT_PRECISION,
  ToSqlTest.java:1188)
"""

from __future__ import annotations

from impala_spark.parser import (
    Token,
    _matching_paren,
    _significant,
    tokenize,
)

#: clause/operator keywords the analyzed toSql prints uppercase
_UPPER_KEYWORDS = frozenset({
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER", "LIMIT",
    "OFFSET", "JOIN", "ON", "USING", "INNER", "LEFT", "RIGHT", "FULL",
    "OUTER", "SEMI", "ANTI", "CROSS", "UNION", "ALL", "DISTINCT", "AS",
    "CASE", "WHEN", "THEN", "ELSE", "END", "AND", "OR", "NOT", "IN",
    "EXISTS", "BETWEEN", "LIKE", "ILIKE", "RLIKE", "REGEXP", "IS",
    "NULL", "TRUE", "FALSE", "CAST", "OVER", "PARTITION", "ROWS",
    "RANGE", "UNBOUNDED", "PRECEDING", "FOLLOWING", "CURRENT", "ROW",
    "WITH", "VALUES", "INTERVAL", "ASC", "DESC", "NULLS", "FIRST",
    "LAST", "INSERT", "INTO", "OVERWRITE", "TABLE", "DIV", "IGNORE",
    "STRAIGHT_JOIN",
})

#: type names uppercased in CAST targets (TypeDef toSql)
_TYPE_KEYWORDS = frozenset({
    "TINYINT", "SMALLINT", "INT", "INTEGER", "BIGINT", "FLOAT", "DOUBLE",
    "REAL", "DECIMAL", "STRING", "CHAR", "VARCHAR", "BOOLEAN",
    "TIMESTAMP",
})

#: keyword heads that look like calls but are not FunctionName-lowercased
_NOT_A_FUNCTION = frozenset({
    "CAST", "VALUES", "OVER", "EXISTS", "IN", "USING", "ON", "AND", "OR",
    "NOT", "WHEN", "THEN", "ELSE", "SELECT", "WHERE", "HAVING", "BY",
    "PARTITION", "INTERVAL",
})

#: tokens the renderer glues to the previous token (no space before)
_NO_SPACE_BEFORE = frozenset({",", ")", ".", ";"})
#: tokens the renderer glues to the next token (no space after)
_NO_SPACE_AFTER = frozenset({"(", "."})


def _strip_ws(tokens: list[Token]) -> list[tuple[Token, bool]]:
    """[(token, glued_to_previous_in_source)] without whitespace/comment
    tokens; source adjacency drives call-paren spacing. Plan-hint
    comments (`/* +h */` and `-- +h`) survive as synthetic HINT tokens —
    toSql always re-emits hints in the end-of-line commented style for
    Hive view compatibility (ToSqlTest.java:442-447 planHintsTest)."""
    import re

    out: list[tuple[Token, bool]] = []
    glued = True
    for t in tokens:
        if t.kind in ("line_comment", "block_comment"):
            m = re.match(r"/\*\s*\+(.+?)\s*\*/$", t.text) or re.match(
                r"--\s*\+(.+?)\s*$", t.text
            )
            if m:
                out.append((Token("hint", "\n-- +" + m.group(1) + "\n"), False))
            glued = False
            continue
        if t.kind == "ws":
            glued = False
            continue
        out.append((t, glued))
        glued = True
    return out


def _convert_bracket_hints(sig: list[tuple[Token, bool]]) -> list[tuple[Token, bool]]:
    """Legacy `[hint, hint]` style directly after JOIN or SELECT
    [DISTINCT] -> the same synthetic HINT token (sql-parser.cup
    plan_hints; ToSqlTest.java:449-452 legacy style)."""
    out: list[tuple[Token, bool]] = []
    i = 0
    n = len(sig)
    while i < n:
        t, glued = sig[i]
        out.append((t, glued))
        if (
            t.kind == "word"
            and t.upper in ("JOIN", "SELECT", "DISTINCT")
            and i + 1 < n
            and sig[i + 1][0].kind == "op"
            and sig[i + 1][0].text == "["
        ):
            j = i + 1
            names: list[str] = []
            k = j + 1
            ok = False
            while k < n:
                tk = sig[k][0]
                if tk.kind in ("word", "bident"):
                    names.append(tk.text)
                elif tk.kind == "op" and tk.text == ",":
                    pass
                elif tk.kind == "op" and tk.text == "]":
                    ok = True
                    break
                else:
                    break
                k += 1
            if ok and names:
                out.append((Token("hint", "\n-- +" + ",".join(names) + "\n"), False))
                i = k + 1
                continue
        i += 1
    return out


#: keywords that can never head a function call — a paren glued to one in
#: the source still gets toSql's single space ("IN (", "EXISTS (")
_PAREN_SPACED_KEYWORDS = frozenset({
    "IN", "EXISTS", "NOT", "AND", "OR", "BETWEEN", "ON", "WHERE",
    "HAVING", "WHEN", "THEN", "ELSE", "USING", "SELECT", "FROM", "JOIN",
    "BY", "ALL", "DISTINCT", "UNION", "AS", "LIKE", "ILIKE", "RLIKE",
    "REGEXP", "IREGEXP",
})


def _render(items: list[tuple[str, bool]]) -> str:
    """Join normalized token texts with toSql spacing: single spaces,
    except glued call-parens, no space inside parens or around dots or
    before commas, and a space after every comma."""
    parts: list[str] = []
    prev = ""
    prev2 = ""
    for text, glue_call in items:
        if not parts:
            parts.append(text)
            prev = text
            continue
        if text in _NO_SPACE_BEFORE or prev in _NO_SPACE_AFTER:
            parts.append(text)
        elif (
            prev == "-"
            and text[:1].isdigit()
            and (
                not prev2
                or prev2 in ("(", ",", "=", "<", ">", "<=", ">=", "!=",
                             "<>", "<=>", "+", "-", "*", "/", "%")
                or prev2 in _UPPER_KEYWORDS
            )
        ):
            # unary minus absorbed into the numeric literal
            # (NumericLiteral toSql prints -2, not - 2)
            parts.append(text)
        elif text == "(" and prev == "OVER":
            # AnalyticExpr.toSql always prints "OVER (" with a space
            parts.append(" " + text)
        elif text == "(" and glue_call and prev not in _PAREN_SPACED_KEYWORDS:
            # call paren: glued in source to a name/keyword -> glued in
            # output ("count(", "CAST(", "VALUES(") — but never after a
            # pure clause/operator keyword: Expr.toSql prints "IN (",
            # "EXISTS (", "NOT (" with a space even when the user glued
            # them ("id in(select ...)" -> "id IN (SELECT ...)")
            parts.append(text)
        else:
            parts.append(" " + text)
        prev2 = prev
        prev = text
    return "".join(parts)


#: identifier words that must stay/become backquoted because they are
#: statement keywords (ToSqlUtils.getIdentSql quotes Impala+Hive keywords)
_IDENT_QUOTE_KEYWORDS = _UPPER_KEYWORDS | _TYPE_KEYWORDS | frozenset({
    "ALTER", "DROP", "CREATE", "VIEW", "DATABASE", "FUNCTION", "LOAD",
    "DATA", "UPDATE", "DELETE", "UPSERT", "SET", "SHOW", "USE", "IF",
    "COMPUTE", "STATS", "REFRESH", "INVALIDATE", "METADATA", "TRUNCATE",
})

import re as _re

_SAFE_IDENT = _re.compile(r"[A-Za-z][A-Za-z0-9_]*")


def _ident_sql(name: str) -> str:
    """ToSqlUtils.getIdentSql: backquote an identifier iff it is a
    keyword or not lexable as a plain identifier by both Impala and
    Hive (leading underscore/digit, or any special character);
    otherwise emit it bare (ToSqlTest.java:372-400: `abc` -> abc,
    _c0 -> `_c0`, `alter` stays quoted)."""
    if _SAFE_IDENT.fullmatch(name) and name.upper() not in _IDENT_QUOTE_KEYWORDS:
        return name
    return f"`{name}`"


def _unquote_double(text: str) -> str:
    """\"abc\" -> 'abc' (StringLiteral.toSqlImpl always single-quotes)."""
    if len(text) >= 2 and text[0] == '"' and text[-1] == '"':
        inner = text[1:-1].replace('""', '"').replace("\\'", "'")
        return "'" + inner.replace("'", "\\'") + "'"
    return text


def _find_cast_as_indices(sig: list[tuple[Token, bool]]) -> set[int]:
    """Indices (into the significant list) of AS keywords that belong to
    a CAST target — the only AS toSql keeps."""
    keep: set[int] = set()
    for i, (t, _) in enumerate(sig):
        if t.kind == "word" and t.upper == "CAST":
            if i + 1 < len(sig) and sig[i + 1][0].text == "(":
                d = 0
                for k in range(i + 1, len(sig)):
                    tk = sig[k][0]
                    if tk.kind == "op" and tk.text == "(":
                        d += 1
                    elif tk.kind == "op" and tk.text == ")":
                        d -= 1
                        if d == 0:
                            break
                    elif d == 1 and tk.kind == "word" and tk.upper == "AS":
                        keep.add(k)
    return keep


def _cte_names(sig: list[tuple[Token, bool]]) -> set[str]:
    """Names bound by a WITH clause — local views the analyzer resolves
    without qualification (WithClause.toSql keeps them bare)."""
    names: set[str] = set()
    for i, (t, _) in enumerate(sig):
        if (
            t.kind == "word" and t.upper == "WITH"
            or (t.kind == "op" and t.text == ",")
        ):
            if (
                i + 2 < len(sig)
                and sig[i + 1][0].kind in ("word", "bident")
                and sig[i + 2][0].kind == "word"
                and sig[i + 2][0].upper == "AS"
                and i + 3 < len(sig)
                and sig[i + 3][0].text == "("
            ):
                names.add(sig[i + 1][0].text.lower())
    return names


def _table_ref_positions(sig: list[tuple[Token, bool]]) -> set[int]:
    """Indices of bare table-name words in FROM/JOIN position (to be
    db-qualified). Dotted refs (db.table or alias.collection), CTE
    names, and subquery parens are left alone."""
    ctes = _cte_names(sig)
    out: set[int] = set()
    i = 0
    n = len(sig)
    while i < n:
        t = sig[i][0]
        if t.kind == "word" and t.upper in ("FROM", "JOIN"):
            j = i + 1
            # a table ref may follow each FROM/JOIN and each comma of a
            # FROM list
            while j < n:
                tj = sig[j][0]
                if tj.kind in ("word", "bident") and tj.upper not in _UPPER_KEYWORDS:
                    is_dotted = (
                        (j + 1 < n and sig[j + 1][0].text == ".")
                    )
                    if not is_dotted and tj.text.lower() not in ctes:
                        out.add(j)
                    # skip the dotted path
                    k = j
                    while k + 2 < n and sig[k + 1][0].text == ".":
                        k += 2
                    # optional alias word after the ref
                    if (
                        k + 1 < n
                        and sig[k + 1][0].kind in ("word", "bident")
                        and sig[k + 1][0].upper not in _UPPER_KEYWORDS
                    ):
                        k += 1
                    j = k + 1
                    # another ref only after a comma (FROM list)
                    if j < n and sig[j][0].text == ",":
                        j += 1
                        continue
                    break
                elif tj.text == "(":
                    # subquery/inline view: skip to its close, then the
                    # optional alias
                    d = 0
                    while j < n:
                        if sig[j][0].text == "(":
                            d += 1
                        elif sig[j][0].text == ")":
                            d -= 1
                            if d == 0:
                                break
                        j += 1
                    j += 1
                    if (
                        j < n
                        and sig[j][0].kind in ("word", "bident")
                        and sig[j][0].upper not in _UPPER_KEYWORDS
                    ):
                        j += 1
                    if j < n and sig[j][0].text == ",":
                        j += 1
                        continue
                    break
                else:
                    break
        i += 1
    return out


def to_impala_sql(sql: str, default_db: str | None = "default") -> str:
    """Re-emit `sql` as the reference's analyzed `toSql()` would print
    it. `default_db` plays the session database's role in qualifying
    bare table refs (the analyzer's resolution step); pass None to keep
    bare refs unqualified — Expr/Stmt.toSql quoted inside ERROR messages
    prints table refs as written (only getCreateViewSql-style re-emission
    qualifies)."""
    sig = _convert_bracket_hints(_strip_ws(tokenize(sql)))
    cast_as = _find_cast_as_indices(sig)
    tbl_refs = _table_ref_positions(sig)

    out: list[tuple[str, bool]] = []
    i = 0
    n = len(sig)
    while i < n:
        t, glued = sig[i]
        up = t.upper

        # ---- drop alias AS (SelectListItem.toSql); the AS of a CAST
        #      target and of a WITH/CREATE VIEW definition (next token
        #      '(' or SELECT) are structural and stay ----
        if (
            t.kind == "word" and up == "AS" and i not in cast_as
            and not (
                i + 1 < n
                and (
                    sig[i + 1][0].text == "("
                    or sig[i + 1][0].upper == "SELECT"
                )
            )
        ):
            # a string-quoted alias after AS is an identifier, not a
            # literal: `2.0 as 'xyz'` -> `2.0 xyz` (ToSqlTest.java:374)
            if i + 1 < n and sig[i + 1][0].kind in ("string", "dstring"):
                alias = sig[i + 1][0].text[1:-1]
                out.append((_ident_sql(alias), False))
                i += 2
                continue
            i += 1
            continue

        # ---- drop OFFSET 0 (QueryStmt.toSql) ----
        if (
            t.kind == "word" and up == "OFFSET"
            and i + 1 < n and sig[i + 1][0].kind == "number"
            and sig[i + 1][0].text == "0"
        ):
            i += 2
            continue

        # ---- string literals: single quotes ----
        if t.kind in ("string", "dstring"):
            out.append((_unquote_double(t.text), glued))
            i += 1
            continue

        if t.kind == "word":
            is_call = (
                i + 1 < n and sig[i + 1][0].text == "(" and sig[i + 1][1]
            ) or (i + 1 < n and sig[i + 1][0].text == "(" and up not in _UPPER_KEYWORDS)

            # ---- CAST target types: uppercase + default-decimal ----
            prev_kw = out[-1][0] if out else ""
            if up in _TYPE_KEYWORDS and prev_kw == "AS":
                if up == "DECIMAL" and not (
                    i + 1 < n and sig[i + 1][0].text == "("
                ):
                    out.append(("DECIMAL(9,0)", glued))
                    i += 1
                    continue
                if up in ("DECIMAL", "CHAR", "VARCHAR") and i + 1 < n and sig[i + 1][0].text == "(":
                    # collapse the parenthesized params with no spaces
                    d = 0
                    k = i + 1
                    param = []
                    while k < n:
                        tk = sig[k][0]
                        param.append(tk.text)
                        if tk.text == "(":
                            d += 1
                        elif tk.text == ")":
                            d -= 1
                            if d == 0:
                                break
                        k += 1
                    out.append((up + "".join(param), glued))
                    i = k + 1
                    continue
                out.append((up, glued))
                i += 1
                continue

            # ---- function names: lowercase (FunctionName) ----
            if is_call and up not in _NOT_A_FUNCTION and up not in _TYPE_KEYWORDS:
                out.append((t.text.lower(), glued))
                i += 1
                continue

            # ---- keywords: uppercase; JOIN prints its JoinOperator
            #      toString — bare JOIN is INNER JOIN, LEFT/RIGHT JOIN
            #      spell out OUTER (A/JoinOperator toString values) ----
            if up in _UPPER_KEYWORDS:
                if up == "JOIN" and out:
                    prev_word = out[-1][0]
                    if prev_word in ("LEFT", "RIGHT"):
                        out.append(("OUTER", False))
                    elif prev_word not in ("INNER", "OUTER", "SEMI", "ANTI", "CROSS"):
                        out.append(("INNER", False))
                out.append((up, glued))
                i += 1
                continue

            # ---- bare table refs: qualify ----
            if i in tbl_refs and default_db is not None:
                out.append((f"{default_db}.{t.text}", glued))
                i += 1
                continue

            # ---- plain identifiers: ToSqlUtils.getIdentSql quoting ----
            out.append((_ident_sql(t.text), glued))
            i += 1
            continue

        # ---- backquoted identifiers: unquote when unnecessary ----
        if t.kind == "bident":
            out.append((_ident_sql(t.text[1:-1]), glued))
            i += 1
            continue

        out.append((t.text, glued))
        i += 1

    rendered = _render(_normalize_order_by(out))
    return rendered


#: sentinel texts ending an ORDER BY item list
_ORDER_END = frozenset({"LIMIT", "OFFSET", "UNION", ")", ";"})


def _normalize_order_by(items: list[tuple[str, bool]]) -> list[tuple[str, bool]]:
    """SortInfo.toSql: every ORDER BY item prints an explicit ASC/DESC,
    and NULLS FIRST/LAST only when it differs from the direction default
    (ASC -> NULLS LAST, DESC -> NULLS FIRST)."""
    out: list[tuple[str, bool]] = []
    i = 0
    n = len(items)
    while i < n:
        text, glued = items[i]
        out.append((text, glued))
        if text == "ORDER" and i + 1 < n and items[i + 1][0] == "BY":
            out.append(items[i + 1])
            i += 2
            # walk items until the clause ends, normalizing each
            # comma-separated entry
            depth = 0
            entry: list[tuple[str, bool]] = []

            def flush() -> None:
                if not entry:
                    return
                texts = [e[0] for e in entry]
                direction = None
                nulls = None
                # the item's grammar is <expr> [ASC|DESC] [NULLS F/L]:
                # peel NULLS first (it is outermost), then the direction
                while texts:
                    if (
                        len(texts) >= 2
                        and texts[-2] == "NULLS"
                        and texts[-1] in ("FIRST", "LAST")
                        and nulls is None
                        and direction is None
                    ):
                        nulls = texts.pop()
                        texts.pop()
                        entry.pop()
                        entry.pop()
                    elif texts[-1] in ("ASC", "DESC") and direction is None:
                        direction = texts.pop()
                        entry.pop()
                    else:
                        break
                direction = direction or "ASC"
                out.extend(entry)
                out.append((direction, False))
                default_nulls = "LAST" if direction == "ASC" else "FIRST"
                if nulls is not None and nulls != default_nulls:
                    out.append(("NULLS", False))
                    out.append((nulls, False))
                entry.clear()

            while i < n:
                text, glued = items[i]
                if text == "(":
                    depth += 1
                elif text == ")":
                    if depth == 0:
                        flush()
                        break
                    depth -= 1
                elif depth == 0 and text == ",":
                    flush()
                    out.append((",", False))
                    i += 1
                    continue
                elif depth == 0 and text in ("LIMIT", "OFFSET", "UNION", "ROWS", "RANGE"):
                    flush()
                    break
                entry.append((text, glued))
                i += 1
            else:
                flush()
            continue
        i += 1
    return out
