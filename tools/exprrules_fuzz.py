"""Differential fuzz for the expression rewrite rules: random predicates
over lineitem, rewritten through BetweenToCompound + ExtractCommonConjuncts
+ FoldConstants, then ORIGINAL vs REWRITTEN executed on the SAME engine
(DuckDB) — any result difference is a semantic-preservation bug in the
rewrite, independent of dialect differences.

    python tools/exprrules_fuzz.py [--n 500] [--seed 7] [sf_dir]

Exits 1 on the first mismatch with the offending predicate pair.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from impala_spark.exprrules import rewrite_sql  # noqa: E402

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_linenumber", "l_orderkey"]
STR_COLS = ["l_returnflag", "l_linestatus"]


def gen_comparison(rng: random.Random) -> str:
    c = rng.choice(NUM_COLS)
    op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
    v = round(rng.uniform(0, 50), rng.choice([0, 1, 2]))
    return f"{c} {op} {v}"


def gen_between(rng: random.Random) -> str:
    c = rng.choice(NUM_COLS)
    lo = round(rng.uniform(0, 25), 1)
    hi = round(lo + rng.uniform(0, 25), 1)
    neg = "not " if rng.random() < 0.3 else ""
    return f"{c} {neg}between {lo} and {hi}"


def gen_str_pred(rng: random.Random) -> str:
    c = rng.choice(STR_COLS)
    v = rng.choice(["A", "N", "R", "O", "F", "MAIL", "SHIP", "AIR"])
    return f"{c} {rng.choice(['=', '!='])} '{v}'"


def gen_const(rng: random.Random) -> str:
    a, b = rng.randint(0, 9), rng.randint(1, 9)
    return rng.choice([
        f"{rng.choice(NUM_COLS)} < {a} + {b}",
        f"{rng.choice(NUM_COLS)} >= {a} * {b} - {rng.randint(0, 5)}",
    ])


def gen_conjunct(rng: random.Random) -> str:
    return rng.choice(
        [gen_comparison, gen_between, gen_str_pred, gen_const])(rng)


def gen_predicate(rng: random.Random) -> str:
    # OR of parenthesized conjunctions sharing some common conjuncts —
    # the shape ExtractCommonConjuncts fires on
    n_disjuncts = rng.randint(2, 4)
    common = [gen_conjunct(rng) for _ in range(rng.randint(0, 2))]
    disjuncts = []
    for _ in range(n_disjuncts):
        parts = list(common) + [gen_conjunct(rng)
                                for _ in range(rng.randint(1, 2))]
        rng.shuffle(parts)
        disjuncts.append("(" + " and ".join(parts) + ")")
    pred = " or ".join(disjuncts)
    if rng.random() < 0.4:
        pred = f"({pred}) and {gen_conjunct(rng)}"
    if rng.random() < 0.2:
        pred = f"not ({pred})"
    return pred


def gen_const_expr(rng: random.Random, depth: int = 0) -> str:
    """Pure-constant expression whose Impala and DuckDB semantics agree
    (no DIV, no negative substr, no float %)."""
    def leaf():
        k = rng.random()
        if k < 0.4:
            return str(rng.randint(0, 100))
        if k < 0.6:
            return f"{rng.uniform(0, 50):.2f}"
        return "'" + "".join(rng.choice("abcxyz ") for _ in
                             range(rng.randint(0, 6))).rstrip() + "'"

    if depth >= 3:
        return leaf()
    k = rng.random()
    sub = lambda: gen_const_expr(rng, depth + 1)  # noqa: E731
    if k < 0.25:
        a, b = str(rng.randint(0, 40)), str(rng.randint(1, 40))
        op = rng.choice(["+", "-", "*"])
        return f"({a} {op} {b})"
    if k < 0.35:
        return f"({rng.randint(1, 99)} % {rng.randint(1, 9)})"
    if k < 0.5:
        s = leaf() if rng.random() < 0.5 else sub()
        fn = rng.choice(["upper", "lower", "length", "trim", "reverse"])
        if fn == "length":
            return f"length(concat('x', {s!s}))" if s[0] != "'" \
                else f"length({s})"
        if s[0] != "'":
            s = "'ab'"
        return f"{fn}({s})"
    if k < 0.6:
        return (f"concat('{rng.choice('pqr')}', "
                f"'{rng.choice('stu')}', '{rng.choice('vw')}')")
    if k < 0.7:
        return (f"substr('{''.join(rng.choice('abcdef') for _ in range(8))}',"
                f" {rng.randint(1, 6)}, {rng.randint(0, 5)})")
    if k < 0.8:
        # if() branches must be type-compatible (both analyzers agree)
        a = f"({rng.randint(0, 40)} {rng.choice('+-*')} {rng.randint(1, 40)})"
        b = str(rng.randint(0, 100))
        return f"if({rng.randint(0, 9)} < {rng.randint(0, 9)}, {a}, {b})"
    if k < 0.9:
        a = rng.randint(0, 20)
        return f"({a} between {rng.randint(0, 10)} and {rng.randint(5, 25)})"
    return (f"({rng.randint(0, 9)} < {rng.randint(0, 9)} "
            f"{rng.choice(['and', 'or'])} "
            f"not {rng.randint(0, 9)} = {rng.randint(0, 9)})")


def gen_statement(rng: random.Random) -> str:
    """Full statement with WHERE (+ optional HAVING) for the statement
    splice-rewrite mode."""
    having = ""
    if rng.random() < 0.5:
        having = f" HAVING COUNT(*) > {rng.randint(0, 4)} + {rng.randint(0, 4)}"
    return (
        "SELECT l_returnflag, COUNT(*) AS c,"
        " COALESCE(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)),0) AS s"
        f" FROM lineitem WHERE {gen_predicate(rng)}"
        f" GROUP BY l_returnflag{having} ORDER BY 1"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--stmt", action="store_true",
                    help="fuzz rewrite_predicates_sql over full statements")
    ap.add_argument("--const", action="store_true",
                    help="fuzz FoldConstants: folded literal vs DuckDB's"
                         " evaluation of the original constant expr")
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{args.sf_dir}/lineitem.parquet')")

    rng = random.Random(args.seed)
    rules = ["between_to_compound", "extract_common_conjuncts",
             "fold_constants"]
    n_changed = 0

    if args.const:
        n_folded = 0
        for i in range(args.n):
            expr = gen_const_expr(rng)
            try:
                folded, changes = rewrite_sql(expr, ["fold_constants"])
            except Exception as exc:
                print(f"FAIL fold [{i}]: {expr!r}: {exc}")
                return 1
            if changes:
                n_folded += 1
            try:
                same = con.execute(
                    f"SELECT ({expr}) IS NOT DISTINCT FROM ({folded})"
                ).fetchone()[0]
            except Exception as exc:
                print(f"FAIL execute [{i}]:\n  orig: {expr}\n  folded: "
                      f"{folded}\n  {exc}")
                return 1
            if not same:
                a = con.execute(f"SELECT ({expr})").fetchone()[0]
                b = con.execute(f"SELECT ({folded})").fetchone()[0]
                print(f"MISMATCH [{i}]: {expr} -> {folded} "
                      f"({a!r} vs {b!r})")
                return 1
        print(f"OK(const): {args.n} exprs, {n_folded} folded, 0 mismatches"
              f" (seed {args.seed})")
        return 0

    if args.stmt:
        from impala_spark.stmtrewriter import rewrite_predicates_sql

        for i in range(args.n):
            stmt = gen_statement(rng)
            try:
                rewritten, changes = rewrite_predicates_sql(stmt, rules)
            except Exception as exc:
                print(f"FAIL stmt-rewrite [{i}]: {stmt!r}: {exc}")
                return 1
            if changes:
                n_changed += 1
            try:
                a = con.execute(stmt).fetchall()
                b = con.execute(rewritten).fetchall()
            except Exception as exc:
                print(f"FAIL execute [{i}]:\n  orig: {stmt}\n  rw:   "
                      f"{rewritten}\n  {exc}")
                return 1
            if a != b:
                print(f"MISMATCH [{i}]:\n  orig: {stmt}\n  rw:   "
                      f"{rewritten}\n  {a}\n  vs\n  {b}")
                return 1
        print(f"OK(stmt): {args.n} statements, {n_changed} rewritten, "
              f"0 mismatches (seed {args.seed})")
        return 0

    for i in range(args.n):
        pred = gen_predicate(rng)
        try:
            rewritten, changes = rewrite_sql(pred, rules)
        except Exception as exc:
            print(f"FAIL parse/rewrite [{i}]: {pred!r}: {exc}")
            return 1
        if changes:
            n_changed += 1
        q = ("SELECT l_returnflag, COUNT(*) AS c,"
             " COALESCE(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)),0) AS s"
             " FROM lineitem WHERE {p} GROUP BY l_returnflag ORDER BY 1")
        try:
            a = con.execute(q.format(p=pred)).fetchall()
            b = con.execute(q.format(p=rewritten)).fetchall()
        except Exception as exc:
            print(f"FAIL execute [{i}]:\n  orig: {pred}\n  rw:   "
                  f"{rewritten}\n  {exc}")
            return 1
        if a != b:
            print(f"MISMATCH [{i}]:\n  orig: {pred}\n  rw:   {rewritten}"
                  f"\n  orig result: {a}\n  rw result:   {b}")
            return 1
    print(f"OK: {args.n} predicates, {n_changed} rewritten, 0 mismatches "
          f"(seed {args.seed})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
