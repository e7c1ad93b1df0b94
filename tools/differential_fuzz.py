"""Differential fuzz: random dialect-common SELECTs executed through the
ENGINE (ImpalaEngine.sql — translate + plan rewrites + routing) and
compared cell-for-cell against DuckDB running the same text.

    python tools/differential_fuzz.py [sf_dir] [--n N] [--seed S]

The generator stays inside the dialect intersection the registry's
default-oracle entries already rely on (sql_query: oracle = same text),
and inside DETERMINISM rules that make cross-engine comparison exact:

  * integer/decimal arithmetic only in outputs (no double SUMs — FP
    accumulation order differs by engine; `/` excluded for the same
    reason), string functions with positive indices, CASE, LIKE,
    BETWEEN, IN lists, IS NULL;
  * aggregates over exact types (COUNT/COUNT DISTINCT/MIN/MAX/SUM
    BIGINT), HAVING spelled with the full aggregate expression (alias
    visibility in HAVING differs by engine);
  * ranking windows only (RANK/DENSE_RANK are tie-deterministic;
    ROW_NUMBER is not unless the order is a key);
  * no LIMIT (comparison is order-insensitive; LIMIT without a total
    order is nondeterministic);
  * equi-joins along the fixture's FK edges, IN/EXISTS subqueries in
    WHERE (the only subquery regions the reference dialect accepts).

Each mismatch prints the query and both results; exit 1 if any. A clean
run is a seeded, reproducible zero-mismatch artifact over N random
query shapes (record seed + N when citing it).
"""

from __future__ import annotations

import argparse
import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

import duckdb  # noqa: E402

from check import norm_rows  # noqa: E402

from impala_spark.session import TABLES, get_spark  # noqa: E402

# (table, int columns, string columns, join edges to other tables)
SCHEMA = {
    "nation": (["n_nationkey", "n_regionkey"], ["n_name"]),
    "region": (["r_regionkey"], ["r_name"]),
    "customer": (["c_custkey", "c_nationkey"], ["c_name", "c_mktsegment"]),
    "supplier": (["s_suppkey", "s_nationkey"], ["s_name"]),
    "part": (["p_partkey", "p_size"], ["p_name", "p_brand", "p_type"]),
}
JOINS = [
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey"),
    ("nation", "region", "n_regionkey = r_regionkey"),
]


def int_expr(rng, ints, depth=0):
    r = rng.random()
    if depth > 1 or r < 0.3:
        return rng.choice(ints)
    if r < 0.45:
        return f"({int_expr(rng, ints, depth + 1)} {rng.choice(['+', '-', '*'])} {rng.randint(1, 9)})"
    if r < 0.55:
        return f"abs({int_expr(rng, ints, depth + 1)} - {rng.randint(0, 20)})"
    if r < 0.67:
        return f"({int_expr(rng, ints, depth + 1)} % {rng.randint(2, 13)})"
    if r < 0.76:
        return (f"coalesce({int_expr(rng, ints, depth + 1)},"
                f" {rng.randint(0, 9)})")
    if r < 0.85:
        # nullif(a, b) is NULL when equal — injects NULLs both engines
        # agree on, downstream arithmetic must propagate them identically
        return (f"nullif({int_expr(rng, ints, depth + 1)},"
                f" {rng.randint(0, 8)})")
    return (f"CASE WHEN {pred(rng, ints, [], depth + 1)} THEN "
            f"{int_expr(rng, ints, depth + 1)} ELSE {rng.randint(0, 5)} END")


def str_expr(rng, strs, depth=0, nullable=False):
    r = rng.random()
    if depth > 1 or r < 0.4:
        return rng.choice(strs)
    if r < 0.55:
        return f"upper({str_expr(rng, strs, depth + 1, nullable)})"
    if r < 0.7:
        return f"lower({str_expr(rng, strs, depth + 1, nullable)})"
    if r < 0.85 or nullable:
        return f"substr({str_expr(rng, strs, depth + 1, nullable)}, 1, {rng.randint(1, 6)})"
    # concat ONLY over non-nullable inputs: a FOUND dialect divergence —
    # Impala (and Spark) return NULL when any concat argument is NULL,
    # DuckDB's concat skips NULLs ('_x' from concat(NULL, '_x')). The
    # engine side matches the reference; the shared-text oracle cannot
    # express it, so the generator keeps concat away from LEFT JOIN
    # null-producing columns (fuzz campaign seed 42 query 275).
    return f"concat({str_expr(rng, strs, depth + 1, nullable)}, '_x')"


def pred(rng, ints, strs, depth=0):
    r = rng.random()
    if depth < 1 and r < 0.25:
        op = rng.choice(["AND", "OR"])
        return (f"({pred(rng, ints, strs, depth + 1)} {op} "
                f"{pred(rng, ints, strs, depth + 1)})")
    if strs and r < 0.45:
        c = rng.choice(strs)
        k = rng.random()
        if k < 0.3:
            return f"{c} LIKE '%{rng.choice('AEIRST')}%'"
        if k < 0.5:
            return f"length({c}) > {rng.randint(3, 12)}"
        if k < 0.65:
            return (f"substr({c}, 1, 1) IN "
                    f"({', '.join(repr(ch) for ch in rng.sample('ABCEFIMRSU', rng.randint(2, 4)))})")
        if k < 0.8:
            return f"CAST(length({c}) AS STRING) <> '{rng.randint(1, 9)}'"
        return f"{c} IS NOT NULL"
    e = int_expr(rng, ints, depth + 1)
    k = rng.random()
    if k < 0.4:
        return f"{e} {rng.choice(['<', '<=', '>', '>=', '=', '<>'])} {rng.randint(0, 25)}"
    if k < 0.7:
        return f"{e} BETWEEN {rng.randint(0, 10)} AND {rng.randint(11, 30)}"
    return f"{e} IN ({', '.join(str(rng.randint(0, 20)) for _ in range(rng.randint(1, 4)))})"


def gen_query(rng) -> str:
    if rng.random() < 0.4:  # joined pair
        t1, t2, on = rng.choice(JOINS)
        ints = SCHEMA[t1][0] + SCHEMA[t2][0]
        strs = SCHEMA[t1][1] + SCHEMA[t2][1]
        kind = rng.choice(["JOIN", "JOIN", "LEFT JOIN"])
        nullable = kind == "LEFT JOIN"
        if kind == "LEFT JOIN":
            # make some probe rows actually miss: an extra build-side
            # predicate in the ON clause (FK edges always match in the
            # raw data, so nulls only appear this way) — this is where
            # engines disagree on null propagation if anything does
            extra = pred(rng, SCHEMA[t2][0], SCHEMA[t2][1], 1)
            on = f"{on} AND {extra}"
        frm = f"{t1} {kind} {t2} ON {on}"
    elif rng.random() < 0.2:
        # self-join on a low-cardinality key (small tables only — the
        # fan-out is |t|^2/ndv). Column pools are DISJOINT across the
        # two aliases so unaliased outputs never collide by name (the
        # order-insensitive compare sorts columns by name)
        t1 = rng.choice(["nation", "region", "supplier", "part"])
        key = SCHEMA[t1][0][-1]
        ints = [f"sj1.{c}" for c in SCHEMA[t1][0]]
        strs = [f"sj2.{c}" for c in SCHEMA[t1][1]]
        nullable = False
        frm = f"{t1} sj1 JOIN {t1} sj2 ON sj1.{key} = sj2.{key}"
    else:
        t1 = rng.choice(list(SCHEMA))
        ints, strs = SCHEMA[t1]
        nullable = False
        frm = t1
    where = f" WHERE {pred(rng, ints, strs)}" if rng.random() < 0.8 else ""
    # WHERE-region subqueries (the only region the dialect accepts)
    if rng.random() < 0.25:
        sub_t = rng.choice(list(SCHEMA))
        sub_i = SCHEMA[sub_t][0]
        k = rng.random()
        if k < 0.5:
            sub = (f"{rng.choice(ints)} IN (SELECT {rng.choice(sub_i)} FROM {sub_t}"
                   f" WHERE {pred(rng, sub_i, SCHEMA[sub_t][1], 1)})")
        else:  # uncorrelated scalar threshold
            sub = (f"{rng.choice(ints)} >= (SELECT {rng.choice(['MIN', 'MAX'])}"
                   f"({rng.choice(sub_i)}) % {rng.randint(2, 9)} FROM {sub_t})")
        where = f"{where} AND {sub}" if where else f" WHERE {sub}"
    shape = rng.random()
    if shape < 0.45:  # grouped aggregate
        keys = rng.sample(ints + strs, k=rng.randint(1, 2))
        aggs = []
        # Impala 2.x allows only ONE distinct-expression set per query
        # ("all DISTINCT aggregate functions need to have the same set of
        # parameters", A/AggregateInfo.java — the strict leg of this tool
        # caught the generator emitting two, seed 99): pick it once
        distinct_expr = rng.choice(ints + strs)
        for i in range(rng.randint(1, 3)):
            a = rng.random()
            if a < 0.3:
                aggs.append(f"COUNT(*) AS agg{i}")
            elif a < 0.5:
                aggs.append(f"COUNT(DISTINCT {distinct_expr}) AS agg{i}")
            elif a < 0.7:
                aggs.append(f"SUM(CAST({int_expr(rng, ints)} AS BIGINT)) AS agg{i}")
            else:
                aggs.append(f"{rng.choice(['MIN', 'MAX'])}({rng.choice(ints + strs)}) AS agg{i}")
        having = (f" HAVING COUNT(*) >= {rng.randint(0, 2)}"
                  if rng.random() < 0.3 else "")
        # ordinal GROUP BY sometimes (Impala substitutes ordinals before
        # HAVING binding, SelectStmt.java:610 — all three engines accept)
        group = (", ".join(str(i + 1) for i in range(len(keys)))
                 if rng.random() < 0.3 else ", ".join(keys))
        return (f"SELECT {', '.join(keys)}, {', '.join(aggs)} FROM {frm}"
                f"{where} GROUP BY {group}{having}")
    if shape < 0.6:  # window over a scan
        k = rng.choice(ints + strs)
        cols = rng.sample(ints + strs, k=2)
        w = rng.random()
        if w < 0.5:  # ranking (tie-deterministic fns only)
            o = rng.choice(ints)
            fn = rng.choice(["RANK()", "DENSE_RANK()"])
            return (f"SELECT {', '.join(cols)}, {fn} OVER (PARTITION BY {k}"
                    f" ORDER BY {o}) AS rnk FROM {frm}{where}")
        # whole-partition aggregate window: no ORDER BY means the frame
        # is the full partition — deterministic for exact-typed inputs
        # (BIGINT sums; MIN/MAX of anything)
        a = rng.random()
        if a < 0.4:
            fn = f"SUM(CAST({rng.choice(ints)} AS BIGINT))"
        elif a < 0.7:
            fn = f"{rng.choice(['MIN', 'MAX'])}({rng.choice(ints + strs)})"
        else:
            fn = "COUNT(*)"
        return (f"SELECT {', '.join(cols)}, {fn} OVER (PARTITION BY {k})"
                f" AS wagg FROM {frm}{where}")
    if shape < 0.75:  # DISTINCT projection
        cols = [int_expr(rng, ints) + f" AS e{i}" if rng.random() < 0.5
                else str_expr(rng, strs, nullable=nullable) + f" AS e{i}"
                for i in range(rng.randint(1, 3))]
        return f"SELECT DISTINCT {', '.join(cols)} FROM {frm}{where}"
    if shape < 0.82:  # CTE wrap: grouped inner, filtered outer
        key = rng.choice(ints)
        return (f"WITH t AS (SELECT {key} AS k, COUNT(*) AS n,"
                f" SUM(CAST({int_expr(rng, ints)} AS BIGINT)) AS s"
                f" FROM {frm}{where} GROUP BY {key})"
                f" SELECT k, n, s FROM t WHERE n >= {rng.randint(0, 2)}")
    if shape < 0.89:  # UNION ALL of two compatible projections
        c1 = rng.choice(ints)
        t2 = rng.choice(list(SCHEMA))
        return (f"SELECT {c1} AS v FROM {frm}{where}"
                f" UNION ALL SELECT {rng.choice(SCHEMA[t2][0])} AS v FROM {t2}")
    # ordered LIMIT over a full-row total order: duplicate rows straddling
    # the cut are interchangeable, so the multiset after LIMIT is exact.
    # NULLS FIRST pinned explicitly — Spark's ASC default is NULLS FIRST,
    # DuckDB's is NULLS LAST, and LEFT JOIN outputs can be NULL
    if shape < 0.95:
        pool = ints + strs
        cols = rng.sample(pool, k=min(len(pool), rng.randint(2, 3)))
        order = ", ".join(f"{c} NULLS FIRST" for c in cols)
        return (f"SELECT {', '.join(cols)} FROM {frm}{where}"
                f" ORDER BY {order} LIMIT {rng.randint(5, 50)}")
    # plain projection
    cols = [int_expr(rng, ints) + f" AS e{i}" if rng.random() < 0.5
            else str_expr(rng, strs, nullable=nullable) + f" AS e{i}"
            for i in range(rng.randint(1, 4))]
    return f"SELECT {', '.join(cols)} FROM {frm}{where}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--seed", type=int, default=12)
    ap.add_argument("--strict", action="store_true",
                    help="also run every query through the STRICT analyzer:"
                    " the generator emits only legal 2.7-dialect statements,"
                    " so a strict rejection is an analyzer FALSE POSITIVE")
    args = ap.parse_args()

    rng = random.Random(args.seed)
    spark = get_spark("diff-fuzz")
    spark.sparkContext.setLogLevel("ERROR")

    from impala_spark.engine import ImpalaEngine
    from impala_spark.session import register_tables

    register_tables(spark, args.sf_dir)
    engine = ImpalaEngine(spark, sf_dir=args.sf_dir)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    mismatches = 0
    for i in range(args.n):
        q = gen_query(rng)
        if args.strict:
            from impala_spark.parser import translate

            try:
                translate(q, strict=True)
            except Exception as e:
                print(f"MISMATCH {i}: STRICT FALSE POSITIVE"
                      f" {type(e).__name__}: {e}\n  {q}", flush=True)
                mismatches += 1
                continue
        try:
            sdf = engine.sql(q)
            scols, srows = list(sdf.columns), [tuple(r) for r in sdf.collect()]
        except Exception as e:  # engine must not crash on its own dialect
            print(f"MISMATCH {i}: SPARK ERROR {type(e).__name__}: {e}\n  {q}",
                  flush=True)
            mismatches += 1
            continue
        try:
            rel = con.execute(q)
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"#skip {i}: duckdb rejected ({type(e).__name__}) {q}",
                  flush=True)
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc or sr != dr:
            print(f"MISMATCH {i}:\n  {q}\n  spark {len(sr)} rows, duckdb"
                  f" {len(dr)} rows", flush=True)
            for a, b in list(zip(sr, dr))[:5]:
                if a != b:
                    print(f"    spark={a!r}\n    duck ={b!r}", flush=True)
            mismatches += 1
        elif i % 50 == 0:
            print(f"# {i}/{args.n} ok so far", flush=True)
    print(f"differential fuzz: {args.n} queries, seed {args.seed},"
          f" {mismatches} mismatches", flush=True)
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
