"""Analyzer-error scorecard: replay the reference's AnalysisError pins
through translate(strict=True) and report how many produce the exact
reference text.

Counterpart of tools/grammar_sweep.py (ParserTest) for the analysis
layer: extracts every `AnalysisError("sql", "expected")` pair from the
big reference test files and classifies each as

  matched        raised, and the expected text is in our message
  wrong-error    raised, but a different message
  accepted       not raised (our permissive superset or a gap)

Statements are further split by whether they need CATALOG knowledge
(reference test-warehouse tables like functional.alltypes, whose column
TYPES drive most errors) — a token-level dialect layer can only ever
match the catalog-free subset, so the headline number is
matched / catalog-free-total.

Dev-time tool; skips silently if the reference checkout is absent.

Usage: python tools/analyzer_sweep.py [--show-misses N]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TESTS = [
    "/root/reference/fe/src/test/java/org/apache/impala/analysis/AnalyzeExprsTest.java",
    "/root/reference/fe/src/test/java/org/apache/impala/analysis/AnalyzeStmtsTest.java",
    "/root/reference/fe/src/test/java/org/apache/impala/analysis/AnalyzeSubqueriesTest.java",
    "/root/reference/fe/src/test/java/org/apache/impala/analysis/AnalyzeDDLTest.java",
]

#: statements touching reference test-warehouse objects — their errors
#: depend on catalog column types a dialect layer cannot know
_CATALOG_RE = re.compile(
    r"functional\w*\.|\balltypes\w*\b|\btesttbl\b|\bdecimal_t\w*\b|\ballcomplextypes\b"
    r"|\bdefault\.\w+|\btinyint_col\b|\bint_col\b|\bstring_col\b|\bbool_col\b"
    r"|\bid\b|\bzip\b|\btimestamp_col\b|\bdouble_col\b|\bfloat_col\b|\bbigint_col\b"
    r"|\bsmallint_col\b|\baggfn\b|\budf\b|\bt1\b|\bt2\b",
    re.IGNORECASE,
)


def _java_string_args(body: str) -> list[str]:
    """Split a Java argument list into top-level args, then concatenate
    each arg's string-literal pieces ("a" + "b" -> "ab")."""
    args: list[str] = []
    depth = 0
    cur: list[str] = []
    in_str = False
    i = 0
    while i < len(body):
        c = body[i]
        if in_str:
            cur.append(c)
            if c == "\\":
                cur.append(body[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            cur.append(c)
        elif c in "([":
            depth += 1
            cur.append(c)
        elif c in ")]":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        args.append("".join(cur))

    out: list[str] = []
    for a in args:
        pieces = re.findall(r'"((?:[^"\\]|\\.)*)"', a)
        s = "".join(pieces)
        s = s.replace('\\"', '"').replace("\\n", "\n").replace("\\\\", "\\")
        out.append(s)
    return out


def _strip_java_comments(src: str) -> str:
    """Remove // and /* */ comments (string-literal aware) so
    commented-out AnalysisError/AnalyzesOk pins are not extracted."""
    out: list[str] = []
    i = 0
    n = len(src)
    in_str = False
    while i < n:
        c = src[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(src[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            out.append(c)
            i += 1
        elif c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            i += 2
            while i + 1 < n and not (src[i] == "*" and src[i + 1] == "/"):
                i += 1
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _java_raw_args(body: str) -> list[str]:
    """Split a Java argument list into top-level RAW argument texts
    (string-literal aware), without concatenating literals."""
    args: list[str] = []
    depth = 0
    cur: list[str] = []
    in_str = False
    i = 0
    while i < len(body):
        c = body[i]
        if in_str:
            cur.append(c)
            if c == "\\":
                cur.append(body[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            cur.append(c)
        elif c in "([":
            depth += 1
            cur.append(c)
        elif c in ")]":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        args.append("".join(cur))
    return args


def _has_variable_concat(raw_arg: str) -> bool:
    """True when a raw Java arg mixes string literals with identifiers
    (variable concatenation) — the extracted text would be truncated."""
    stripped = re.sub(r'"(?:[^"\\]|\\.)*"', '""', raw_arg)
    return bool(re.search(r'[A-Za-z_]\w*(?:\.\w+)*\s*(?:\+|\()', stripped)
                or re.search(r'\+\s*[A-Za-z_]', stripped))


def _drop_disabled_methods(src: str) -> str:
    """Blank the bodies of never-run methods (the `DoNotTest*` disable
    convention: the @Test annotation is commented out, so the method is
    dead code — its pins reflect no reference behavior)."""
    spans: list[tuple[int, int]] = []
    for m in re.finditer(r"void\s+(DoNotTest\w*)\s*\(", src):
        open_b = src.find("{", m.end())
        if open_b == -1:
            continue
        depth, j = 1, open_b + 1
        while j < len(src) and depth:
            if src[j] == "{":
                depth += 1
            elif src[j] == "}":
                depth -= 1
            j += 1
        spans.append((open_b, j))
    # splice by index in one reverse pass — substring replace could blank
    # the wrong region when two bodies share text
    out = src
    for open_b, j in sorted(spans, reverse=True):
        out = out[:open_b] + "{}" + out[j:]
    return out


#: createAnalyzer("db") in a raw argument list -> the declared session db
_SESSION_DB_RE = re.compile(r'createAnalyzer\(\s*"(\w+)"\s*\)')


def _declared_session_db(body: str) -> str:
    """The session db a pin analyzes under: createAnalyzer("db") when the
    test passes one, else the fixture default (Catalog.DEFAULT_DB =
    "default" — FrontendTestBase.java:226-235). Analyzer-valued args of
    other shapes (createAnalyzerUsingHiveColLabels(), variables) keep the
    default too: only the literal form declares a db."""
    m = _SESSION_DB_RE.search(body)
    return m.group(1).lower() if m else "default"



#: ScalarFunction.createForTesting("db", "name", ...) — the reference
#: registers its test UDFs MID-METHOD (AnalyzeExprsTest TestUdfs), so a
#: pin extracted from an earlier line must replay against the
#: PRE-registration catalog (r9 verdict task #5: capture the two
#: `select udf()` / `select udf(1)` "default.udf() unknown" twins by
#: replaying registration order)
_REGISTRATION_RE = re.compile(r'createForTesting\(\s*"(\w+)",\s*"(\w+)"')
_METHOD_RE = re.compile(r'public void (\w+)\s*\(')


def _pre_registration_fns(src: str):
    """pos -> frozenset of (db, fn) registered LATER in the same test
    method (JUnit runs each method on a fresh catalog instance, so only
    same-method ordering matters)."""
    methods = [m.start() for m in _METHOD_RE.finditer(src)] + [len(src)]
    regs = [
        (m.start(), m.group(1).lower(), m.group(2).lower())
        for m in _REGISTRATION_RE.finditer(src)
    ]

    def at(pos: int) -> frozenset:
        import bisect

        k = bisect.bisect_right(methods, pos) - 1
        lo = methods[k] if k >= 0 else 0
        hi = methods[k + 1] if k + 1 < len(methods) else len(src)
        return frozenset(
            (db, fn) for rpos, db, fn in regs if lo <= pos < rpos < hi
        )

    return at


def extract_pairs(path: str) -> list[tuple[str, str, str, frozenset]]:
    src = _drop_disabled_methods(_strip_java_comments(open(path).read()))
    pre_at = _pre_registration_fns(src)
    pairs: list[tuple[str, str, str, frozenset]] = []
    for m in re.finditer(r"AnalysisError\(", src):
        i = m.end()
        depth = 1
        in_str = False
        j = i
        while j < len(src) and depth:
            c = src[j]
            if in_str:
                if c == "\\":
                    j += 2
                    continue
                if c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        body = src[i:j - 1]
        args = _java_string_args(body)
        # forms: (sql), (sql, expected), (sql, analyzer, expected)
        strings = [a for a in args if a]
        if len(strings) < 2:
            continue
        # skip statements assembled from Java VARIABLES (the extractor
        # keeps only the string literals -> a truncated, unmatchable
        # statement like `select cast(NULL as ) = ...`)
        raw = _java_raw_args(body)
        if raw and _has_variable_concat(raw[0]):
            continue
        expected = strings[-1]
        # the expected text may be assembled as "literal" + variable +
        # "literal": concatenating literals ACROSS the variable yields a
        # string the reference never produced (e.g. "...are: " +
        # Joiner.join(...) -> "...are: , "). Truncate at the first
        # non-literal operand instead — a faithful known prefix.
        raw_exp = raw[-1] if raw else ""
        if _has_variable_concat(raw_exp):
            expected = _java_literal_prefix(raw_exp)
        if expected:
            pairs.append(
                (strings[0], expected, _declared_session_db(body),
                 pre_at(m.start()))
            )
    return pairs


def _java_literal_prefix(raw_arg: str) -> str:
    """Concatenated leading string-literal operands of a Java `+`
    expression, stopping at the first non-literal operand."""
    s = ""
    i = 0
    n = len(raw_arg)
    while i < n:
        while i < n and raw_arg[i] in " \t\r\n":
            i += 1
        if i >= n or raw_arg[i] != '"':
            break  # non-literal operand: stop
        j = i + 1
        piece: list[str] = []
        while j < n:
            if raw_arg[j] == "\\" and j + 1 < n:
                piece.append(raw_arg[j:j + 2])
                j += 2
                continue
            if raw_arg[j] == '"':
                break
            piece.append(raw_arg[j])
            j += 1
        s += "".join(piece)
        i = j + 1
        while i < n and raw_arg[i] in " \t\r\n":
            i += 1
        if i < n and raw_arg[i] == "+":
            i += 1
            continue
        break
    return s.replace('\\"', '"').replace("\\n", "\n").replace("\\\\", "\\")


def extract_positives(path: str) -> list[tuple[str, str, frozenset]]:
    """AnalyzesOk("sql" [, analyzer]) statements (+ declared session db
    + the pre-registration set) — the false-positive guard corpus."""
    src = _drop_disabled_methods(_strip_java_comments(open(path).read()))
    pre_at = _pre_registration_fns(src)
    out: list[tuple[str, str, frozenset]] = []
    for m in re.finditer(r"AnalyzesOk\(", src):
        i = m.end()
        depth = 1
        in_str = False
        j = i
        while j < len(src) and depth:
            c = src[j]
            if in_str:
                if c == "\\":
                    j += 2
                    continue
                if c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        body = src[i:j - 1]
        args = _java_string_args(body)
        strings = [a for a in args if a]
        if not strings:
            continue
        # skip statements assembled by concatenating a Java VARIABLE
        # (the extractor keeps only string literals, yielding a
        # truncated statement like `... where ` — not a real positive)
        raw = _java_raw_args(body)
        if raw and _has_variable_concat(raw[0]):
            continue
        out.append((strings[0], _declared_session_db(body), pre_at(m.start())))
    return out


def main() -> None:
    from impala_spark.parser import ImpalaUnsupportedError, translate
    from impala_spark.testcatalog import TABLE_SCHEMAS, schema_for_statement

    show = 0
    if "--show-misses" in sys.argv:
        show = int(sys.argv[sys.argv.index("--show-misses") + 1])

    total = cat_free = matched = wrong = accepted = 0
    cat_matched = 0
    misses: list[tuple[str, str, str | None]] = []
    for path in REF_TESTS:
        if not os.path.exists(path):
            print(f"skip (no reference checkout): {path}")
            continue
        for sql, expected, session_db, pre_reg in extract_pairs(path):
            if not sql.strip().lower().startswith((
                "select", "with", "values",
                # DDL heads: the parser's token-level DDL analysis runs
                # inside translate() before the engine dispatch
                "create", "alter", "drop", "truncate",
            )):
                continue  # remaining heads route outside translate()
            if "%s" in sql or "$TBL" in sql or "%s" in expected:
                continue  # Java String.format template, not a statement
            total += 1
            catalog = bool(_CATALOG_RE.search(sql)) or bool(
                # resolution-class errors need the canned test catalog
                # (paths like a.a / d.t3.c resolve through its schemas)
                re.search(
                    r"Could not resolve|ambiguous|Cannot expand star"
                    r"|returns a complex type|star exprs expanded"
                    r"|Illegal column/field reference",
                    expected,
                )
            )
            if not catalog:
                cat_free += 1
            try:
                translate(sql, strict=True, schema=schema_for_statement(sql),
                          catalog=TABLE_SCHEMAS, session_db=session_db,
                          unregistered_fns=pre_reg)
                got: str | None = None
            except ImpalaUnsupportedError as e:
                got = str(e)
            except Exception as e:  # tokenizer edge: count as wrong-error
                got = f"<{type(e).__name__}: {e}>"
            if got is not None and expected in got:
                matched += 1
                if catalog:
                    cat_matched += 1
            elif got is not None:
                wrong += 1
                misses.append((sql, expected, got))
            else:
                accepted += 1
                misses.append((sql, expected, None))

    # ---- false-positive guard: every AnalyzesOk statement must still
    # translate cleanly with the canned schema bound ----
    pos_total = pos_rejected = 0
    fp: list[tuple[str, str]] = []
    for path in REF_TESTS:
        if not os.path.exists(path):
            continue
        for sql, session_db, pre_reg in extract_positives(path):
            if not sql.strip().lower().startswith((
                "select", "with", "values",
                "create", "alter", "drop", "truncate",
            )):
                continue
            if "%s" in sql or "$TBL" in sql:
                continue
            # constructs our dialect documents as DIFFERENT from the
            # reference-version behavior (strict-mode rejections the
            # reference era genuinely had are pinned elsewhere)
            pos_total += 1
            try:
                translate(sql, strict=True, schema=schema_for_statement(sql),
                          catalog=TABLE_SCHEMAS, session_db=session_db,
                          unregistered_fns=pre_reg)
            except ImpalaUnsupportedError as e:
                pos_rejected += 1
                fp.append((sql, str(e)))
            except Exception:
                pos_rejected += 1
                fp.append((sql, "<tokenizer/translate error>"))

    print(f"reference AnalysisError statements (query heads): {total}")
    print(f"  catalog-free (token-level addressable):          {cat_free}")
    print(f"  matched exact text:                              {matched} "
          f"({cat_matched} of them catalog-dependent)")
    print(f"  raised with a different text:                    {wrong}")
    print(f"  accepted (permissive superset or gap):           {accepted}")
    cf_matched = matched - cat_matched
    if cat_free:
        print(f"  catalog-free match rate:                         "
              f"{cf_matched}/{cat_free} ({100.0 * cf_matched / cat_free:.1f}%)")
    print(f"AnalyzesOk guard: {pos_total} positives, "
          f"{pos_rejected} rejected (false positives)")
    for sql, err in fp[:show if show else 20]:
        print("FP ---")
        print("  sql:", sql[:140])
        print("  err:", err[:140])
    for sql, expected, got in misses[:show]:
        print("---")
        print("  sql:     ", sql[:140])
        print("  expected:", expected[:140])
        print("  got:     ", (got or "<accepted>")[:140])


if __name__ == "__main__" and "--ddl" not in sys.argv:
    main()


# ---------------------------------------------------------------------
# --ddl mode: replay AnalyzeDDLTest pins through the live engine
# ---------------------------------------------------------------------

DDL_TEST = (
    "/root/reference/fe/src/test/java/org/apache/impala/analysis/AnalyzeDDLTest.java"
)

#: statement heads the engine routes (engine.sql dispatch); everything
#: else in AnalyzeDDLTest (Kudu/HBase/cache/Sentry) is documented
#: out-of-scope in COVERAGE.md
_DDL_HEADS = (
    "create", "alter", "drop", "truncate", "compute", "describe", "show",
    "load", "refresh", "invalidate",
)


def ddl_main() -> None:
    from impala_spark.engine import ImpalaEngine, ImpalaAnalysisError
    from impala_spark.parser import ImpalaUnsupportedError
    from impala_spark.session import get_spark

    show = 0
    if "--show-misses" in sys.argv:
        show = int(sys.argv[sys.argv.index("--show-misses") + 1])
    if not os.path.exists(DDL_TEST):
        print("skip (no reference checkout)")
        return
    spark = get_spark("ddl_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    eng = ImpalaEngine(spark, strict=True)

    total = matched = wrong = accepted = 0
    misses: list[tuple[str, str, str | None]] = []
    for sql, expected, _db, _pre in extract_pairs(DDL_TEST):
        head = sql.strip().split(None, 1)[0].lower() if sql.strip() else ""
        if head not in _DDL_HEADS:
            continue
        if "%s" in sql or "$TBL" in sql or "%s" in expected:
            continue
        # out-of-scope storage/authz families (documented)
        low = sql.lower()
        if any(k in low for k in ("kudu", "hbase", "cached in", "uncached",
                                  "avro", "sequencefile", "rcfile")):
            continue
        total += 1
        try:
            eng.sql(sql)
            got: str | None = None
        except (ImpalaAnalysisError, ImpalaUnsupportedError) as e:
            got = str(e)
        except Exception as e:
            got = f"<{type(e).__name__}: {str(e)[:120]}>"
        if got is not None and expected in got:
            matched += 1
        elif got is not None:
            wrong += 1
            misses.append((sql, expected, got))
        else:
            accepted += 1
            misses.append((sql, expected, None))

    print(f"AnalyzeDDLTest in-scope AnalysisError statements: {total}")
    print(f"  matched exact text:   {matched} ({100.0 * matched / max(total, 1):.1f}%)")
    print(f"  different text:       {wrong}")
    print(f"  accepted:             {accepted}")
    for sql, expected, got in misses[:show]:
        print("---")
        print("  sql:     ", sql[:140])
        print("  expected:", expected[:140])
        print("  got:     ", (got or "<accepted>")[:140])


if __name__ == "__main__" and "--ddl" in sys.argv:
    ddl_main()
    sys.exit(0)
