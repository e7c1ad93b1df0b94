"""Grammar-compat scorecard: run the reference's ParserTest positive
statements through parser.translate (non-strict) and report the fraction
that translate cleanly.

Reads the statements from the READ-ONLY reference checkout at runtime
(dev-time tool; nothing is copied into this repo). Skips silently when
the reference is absent. Statement families the engine documents as
out-of-scope (Kudu range partitions, data sources, authz) are counted
separately, not as failures.

Usage: python tools/grammar_sweep.py [--show-failures N]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_spark.parser import ImpalaUnsupportedError, translate

REF = "/root/reference/fe/src/test/java/org/apache/impala/analysis/ParserTest.java"

#: documented out-of-scope statement families (README / COVERAGE.md)
_OUT_OF_SCOPE = re.compile(
    r"(?i)(^\s*(grant|revoke|show\s+(roles|role\s+grant|current\s+roles|grant\s+role"
    r"|data\s*sources)|create\s+(role|data\s*source)|drop\s+(role|data\s*source)"
    r"|alter\s+view|create\s+view|comment\s+on))"
    r"|(?i:\b(range\s+partition|distribute\s+by|kudu|cached\s+in|uncached)\b)"
)

#: statement heads the ENGINE routes outside translate() (engine.sql paths);
#: translate() only sees queries/DML, so these count via their own surface
_ENGINE_ROUTED = re.compile(
    r"(?i)^\s*(create|drop|alter|show|describe|compute|use|set|explain|invalidate"
    r"|refresh|load|truncate|update|delete|upsert|insert)\b"
)


def main() -> None:
    if not os.path.exists(REF):
        print("reference checkout not present; nothing to sweep")
        return
    src = open(REF, encoding="utf-8").read()
    # ParsesOk("..."): single-line Java string literals (the vast majority);
    # unescape the common Java escapes
    stmts = []
    for m in re.finditer(r'ParsesOk\(\s*"((?:[^"\\]|\\.)*)"\s*[),]', src):
        s = m.group(1).encode().decode("unicode_escape")
        stmts.append(s)
    show = 0
    if "--show-failures" in sys.argv:
        show = int(sys.argv[sys.argv.index("--show-failures") + 1])
    ok = fail = oos = routed = 0
    failures = []
    for s in stmts:
        if _OUT_OF_SCOPE.search(s):
            oos += 1
            continue
        try:
            translate(s)
            ok += 1
        except ImpalaUnsupportedError as e:
            if _ENGINE_ROUTED.match(s):
                routed += 1  # engine.sql surface, not translate's job
            else:
                fail += 1
                failures.append((s, str(e)))
        except Exception as e:  # noqa: BLE001 — scorecard must not crash
            if _ENGINE_ROUTED.match(s):
                routed += 1
            else:
                fail += 1
                failures.append((s, f"{type(e).__name__}: {e}"))
    total = ok + fail
    print(f"reference ParserTest positive statements: {len(stmts)}")
    print(f"  out-of-scope (authz/Kudu/data-src/views): {oos}")
    print(f"  engine-routed DDL/meta heads:             {routed}")
    print(f"  translate()-scope statements:             {total}")
    print(f"  translate cleanly:                        {ok} ({100.0 * ok / max(total, 1):.1f}%)")
    print(f"  failures:                                 {fail}")
    for s, e in failures[:show]:
        print(f"    FAIL {s[:100]!r} -> {e[:80]}")

    # Negative corpus: statements the reference parser REJECTS. Our
    # pipeline is a shim over Spark's parser, so full rejection parity
    # belongs to the engine (Spark raises at sql() time); what the shim
    # itself must reject are the Impala-absent constructs
    # (INTERSECT/ROLLUP/..., subquery-in-OR, strict-mode analysis). Count
    # how many negatives the shim already rejects standalone vs defers.
    neg = []
    for m in re.finditer(r'ParserError\(\s*"((?:[^"\\]|\\.)*)"\s*[),]', src):
        neg.append(m.group(1).encode().decode("unicode_escape"))
    rejected = deferred = 0
    deferred_stmts = []
    for s in neg:
        try:
            out = translate(s, strict=True)
            deferred += 1  # Spark's parser is the rejection authority here
            deferred_stmts.append(out)
        except Exception:
            rejected += 1
    print(f"reference ParserTest NEGATIVE statements: {len(neg)}")
    print(f"  rejected by the shim itself (strict):    {rejected}")
    print(f"  deferred to Spark's parser at sql():     {deferred}")
    if "--spark" in sys.argv:
        # parse-only check through Catalyst's parser (no tables needed):
        # how many deferred negatives does the ENGINE also reject?
        from impala_spark.session import get_spark

        spark = get_spark("grammar_sweep")
        parser = spark._jsparkSession.sessionState().sqlParser()
        spark_rejects = spark_accepts = 0
        accepted = []
        for out in deferred_stmts:
            try:
                parser.parsePlan(out)
                spark_accepts += 1
                accepted.append(out)
            except Exception:
                spark_rejects += 1
        print(f"  ...of which Spark's parser rejects:      {spark_rejects}")
        print(
            f"  accepted end-to-end (dialect supersets): {spark_accepts} "
            "(Spark grammar is wider, e.g. reserved-word laxity)"
        )
        for a in accepted[: (show or 0)]:
            print(f"    ACCEPTS {a[:100]!r}")


if __name__ == "__main__":
    main()
