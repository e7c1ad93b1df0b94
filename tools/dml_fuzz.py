"""Model-based DML fuzz: random statement sequences through the ENGINE's
DDL/DML surface (ddl.py — CREATE TABLE [PARTITION BY HASH], INSERT
[column permutation], UPSERT, UPDATE, DELETE, INSERT OVERWRITE,
TRUNCATE), verified after EVERY mutating statement against a pure-Python
table model.

    python tools/dml_fuzz.py [--n N] [--seed S] [--ops K]

Unlike the SELECT differential fuzzer (tools/differential_fuzz.py, which
compares against DuckDB), DML semantics are modeled directly: a dict of
rows keyed by primary key, with SQL three-valued logic for predicates
(a comparison against NULL selects nothing) and NULL propagation for
SET col = col + k. Determinism rules:

  * INSERT generates fresh primary keys only (Kudu INSERT-on-existing-key
    raises; collision behavior is pinned in tests, not fuzzed);
  * values are small ints, short strings, integral doubles (exact in FP),
    ~15% NULLs in non-key columns;
  * every mutation is followed by a full-content compare (SELECT *),
    so a wrong write is caught at the statement that made it.

Exit 1 on any divergence, printing the statement history for replay.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

COLS = [
    ("a", "INT"),
    ("b", "BIGINT"),
    ("s", "STRING"),
    ("d", "DOUBLE"),
]
STRINGS = ["red", "green", "blue", "Large", "small", ""]
OPS = ["=", "!=", "<", "<=", ">", ">="]


def lit(v, typ):
    if v is None:
        return "NULL"
    if typ == "STRING":
        return "'" + str(v).replace("'", "''") + "'"
    return str(v)


def rand_value(rng, typ, allow_null=True):
    if allow_null and rng.random() < 0.15:
        return None
    if typ == "STRING":
        return rng.choice(STRINGS)
    if typ == "DOUBLE":
        return float(rng.randint(-20, 20))
    return rng.randint(-100, 100)


def sql_cmp(x, op, y):
    """Three-valued logic: any comparison against NULL is not-true."""
    if x is None or y is None:
        return False
    if op == "=":
        return x == y
    if op == "!=":
        return x != y
    if op == "<":
        return x < y
    if op == "<=":
        return x <= y
    if op == ">":
        return x > y
    return x >= y


class Model:
    """rows: pk -> {col: value}"""

    def __init__(self, cols):
        self.cols = cols  # [(name, type)] including pk first
        self.rows: dict[int, dict] = {}

    def tuples(self):
        names = [c for c, _ in self.cols]
        return [tuple(r.get(n) for n in names) for r in self.rows.values()]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def run_case(spark, eng, rng, case_idx, n_ops, log):
    cols = [("pk", "BIGINT")] + rng.sample(COLS, rng.randint(2, len(COLS)))
    tname = f"fz_dml_{case_idx}"
    layout = rng.choice(["plain", "bucketed", "partitioned"])
    col_sql = ", ".join(f"{c} {t}" for c, t in cols)
    create = f"CREATE TABLE {tname} ({col_sql}, PRIMARY KEY (pk))"
    if layout == "bucketed":
        create += " PARTITION BY HASH (pk) PARTITIONS 4 STORED AS KUDU"
    elif layout == "partitioned":
        # low-cardinality partition column appended LAST in the read view
        create += " PARTITIONED BY (p INT)"
        cols = cols + [("p", "INT")]
    history = [f"DROP TABLE IF EXISTS {tname}", create]
    eng.sql(f"DROP TABLE IF EXISTS {tname}")
    eng.sql(create)
    model = Model(cols)
    next_pk = 0

    # immutable side table for the FROM-join DML forms (unique keys so
    # the per-key match is deterministic)
    sname = f"fz_src_{case_idx}"
    src = {k: rng.randint(-50, 50) for k in rng.sample(range(0, 20), 8)}
    eng.sql(f"DROP TABLE IF EXISTS {sname}")
    eng.sql(f"CREATE TABLE {sname} (sk BIGINT, sv INT, PRIMARY KEY (sk))")
    eng.sql(
        f"INSERT INTO {sname} VALUES "
        + ", ".join(f"({k}, {v})" for k, v in src.items())
    )
    history.append(f"-- src {sname}: {sorted(src.items())}")

    def fresh_rows(k, names=None):
        nonlocal next_pk
        names = names or [c for c, _ in cols]
        typ = dict(cols)
        out = []
        for _ in range(k):
            row = {}
            for n in names:
                if n == "pk":
                    row[n] = next_pk
                    next_pk += 1
                elif n == "p":
                    # low-cardinality, non-null partition values so ops
                    # land on existing partitions often
                    row[n] = rng.randint(0, 3)
                else:
                    row[n] = rand_value(rng, typ[n])
            out.append(row)
        return out

    def values_sql(rows, names):
        typ = dict(cols)
        return ", ".join(
            "(" + ", ".join(lit(r[n], typ[n]) for n in names) + ")"
            for r in rows
        )

    def rand_pred():
        """Returns (sql, eval_fn) — eval_fn applies SQL three-valued
        logic row-wise like the engine's translated predicate."""
        c, t = rng.choice(cols)
        k = rng.random()
        if k < 0.12:
            neg = rng.random() < 0.5
            sql = f"{c} IS {'NOT ' if neg else ''}NULL"
            return sql, (lambda r, c=c, neg=neg:
                         (r.get(c) is not None) if neg else (r.get(c) is None))
        if k < 0.24 and t != "STRING":
            lo = rand_value(rng, t, allow_null=False)
            hi = rand_value(rng, t, allow_null=False)
            if hi < lo:
                lo, hi = hi, lo
            sql = f"{c} BETWEEN {lit(lo, t)} AND {lit(hi, t)}"
            return sql, (lambda r, c=c, lo=lo, hi=hi:
                         r.get(c) is not None and lo <= r[c] <= hi)
        if k < 0.36:
            vals = [rand_value(rng, t, allow_null=False) for _ in range(3)]
            sql = f"{c} IN ({', '.join(lit(v, t) for v in vals)})"
            return sql, (lambda r, c=c, vals=tuple(vals):
                         r.get(c) is not None and r[c] in vals)
        op = rng.choice(OPS if t != "STRING" else ["=", "!="])
        v = rand_value(rng, t, allow_null=False)
        return (f"{c} {op} {lit(v, t)}",
                lambda r, c=c, op=op, v=v: sql_cmp(r.get(c), op, v))

    n_added = [0]
    for _ in range(n_ops):
        kinds = ["insert", "insert_perm", "upsert", "update", "delete",
                 "overwrite", "truncate", "insert", "upsert", "update"]
        if layout == "partitioned":
            kinds += ["insert_static_part", "overwrite_part",
                      "insert_static_part"]
        kinds += ["update_from", "delete_from"]
        if n_added[0] < 2:
            kinds.append("add_column")
        if layout != "partitioned":
            # staged-file LOAD appends raw parquet — partitioned layouts
            # need partition dirs, which LOAD DATA doesn't synthesize
            kinds.append("load_data")
        kinds.append("ctas_snapshot")
        kind = rng.choice(kinds)
        if kind == "insert":
            rows = fresh_rows(rng.randint(1, 4))
            # sometimes aim at an existing key: Kudu-surface INSERT
            # discards it (first batch occurrence wins, row error only)
            if model.rows and rng.random() < 0.3:
                rows[0]["pk"] = rng.choice(list(model.rows))
            names = [c for c, _ in cols]
            stmt = f"INSERT INTO {tname} VALUES {values_sql(rows, names)}"
            for r in rows:
                if r["pk"] not in model.rows:
                    model.rows[r["pk"]] = dict(r)
        elif kind == "insert_perm":
            # column permutation: unmentioned columns NULL-fill (the
            # partition column always mentioned — a NULL partition is the
            # default-partition surface, pinned in tests, not fuzzed)
            names = ["pk"] + [
                c for c, _ in cols[1:]
                if c == "p" or rng.random() < 0.7
            ]
            rng.shuffle(names)
            rows = fresh_rows(rng.randint(1, 3), names)
            stmt = (
                f"INSERT INTO {tname} ({', '.join(names)}) "
                f"VALUES {values_sql(rows, names)}"
            )
            for r in rows:
                full = {c: None for c, _ in cols}
                full.update(r)
                model.rows[full["pk"]] = full
        elif kind == "upsert":
            # mix of existing and fresh keys
            names = [c for c, _ in cols]
            rows = fresh_rows(rng.randint(1, 3))
            for r in rows:
                if model.rows and rng.random() < 0.5:
                    r["pk"] = rng.choice(list(model.rows))
            stmt = f"UPSERT INTO {tname} VALUES {values_sql(rows, names)}"
            for r in rows:
                model.rows[r["pk"]] = dict(r)
        elif kind == "update":
            pred_sql, pred_fn = rand_pred()
            tc, tt = rng.choice(cols[1:])
            if tt in ("INT", "BIGINT") and rng.random() < 0.5:
                delta = rng.randint(1, 5)
                set_sql, apply = f"{tc} = {tc} + {delta}", (
                    lambda r: None if r[tc] is None else r[tc] + delta
                )
            else:
                nv = rand_value(rng, tt)
                set_sql, apply = f"{tc} = {lit(nv, tt)}", (lambda r: nv)
            stmt = f"UPDATE {tname} SET {set_sql} WHERE {pred_sql}"
            for r in model.rows.values():
                if pred_fn(r):
                    r[tc] = apply(r)
        elif kind == "delete":
            pred_sql, pred_fn = rand_pred()
            stmt = f"DELETE FROM {tname} WHERE {pred_sql}"
            model.rows = {
                k: r for k, r in model.rows.items() if not pred_fn(r)
            }
        elif kind == "overwrite":
            rows = fresh_rows(rng.randint(1, 3))
            names = [c for c, _ in cols]
            stmt = (
                f"INSERT OVERWRITE {tname} VALUES {values_sql(rows, names)}"
            )
            if layout == "partitioned":
                # dynamic-partition overwrite: only the partitions the new
                # rows land in are replaced (HdfsTableSink semantics)
                touched = {r["p"] for r in rows}
                model.rows = {
                    k: r for k, r in model.rows.items()
                    if r.get("p") not in touched
                }
                for r in rows:
                    model.rows[r["pk"]] = dict(r)
            else:
                model.rows = {r["pk"]: dict(r) for r in rows}
        elif kind == "update_from":
            # UPDATE target SET <int col> = s.sv [+k] FROM target JOIN src
            int_cols = [c for c, t in cols[1:] if t in ("INT", "BIGINT")]
            if not int_cols:
                continue
            tc = rng.choice(int_cols)
            delta = rng.randint(0, 3)
            thr = rng.randint(-30, 30)
            stmt = (
                f"UPDATE {tname} SET {tc} = s.sv + {delta} "
                f"FROM {tname} JOIN {sname} s ON {tname}.pk = s.sk "
                f"WHERE s.sv >= {thr}"
            )
            for k, r in model.rows.items():
                if k in src and src[k] >= thr:
                    r[tc] = src[k] + delta
        elif kind == "delete_from":
            thr = rng.randint(-30, 30)
            stmt = (
                f"DELETE {tname} FROM {tname} JOIN {sname} s "
                f"ON {tname}.pk = s.sk WHERE s.sv < {thr}"
            )
            model.rows = {
                k: r for k, r in model.rows.items()
                if not (k in src and src[k] < thr)
            }
        elif kind == "insert_static_part":
            pv = rng.randint(0, 3)
            names = [c for c, _ in cols if c != "p"]
            rows = fresh_rows(rng.randint(1, 3), names)
            stmt = (
                f"INSERT INTO {tname} PARTITION (p={pv}) "
                f"VALUES {values_sql(rows, names)}"
            )
            for r in rows:
                full = dict(r)
                full["p"] = pv
                model.rows[full["pk"]] = full
        elif kind == "overwrite_part":
            # replaces ONLY the named partition
            pv = rng.randint(0, 3)
            names = [c for c, _ in cols if c != "p"]
            rows = fresh_rows(rng.randint(1, 2), names)
            stmt = (
                f"INSERT OVERWRITE {tname} PARTITION (p={pv}) "
                f"VALUES {values_sql(rows, names)}"
            )
            model.rows = {
                k: r for k, r in model.rows.items() if r.get("p") != pv
            }
            for r in rows:
                full = dict(r)
                full["p"] = pv
                model.rows[full["pk"]] = full
        elif kind == "load_data":
            import tempfile

            rows = fresh_rows(rng.randint(1, 3))
            names = [c for c, _ in cols]
            typemap = {"INT": "int", "BIGINT": "bigint",
                       "STRING": "string", "DOUBLE": "double"}
            schema = ", ".join(
                f"{c} {typemap[t]}" for c, t in cols
            )
            stage = tempfile.mkdtemp(prefix="fz_load_")
            spark.createDataFrame(
                [tuple(r[n] for n in names) for r in rows], schema
            ).coalesce(1).write.mode("overwrite").parquet(stage)
            stmt = f"LOAD DATA INPATH '{stage}' INTO TABLE {tname}"
            for r in rows:
                model.rows[r["pk"]] = dict(r)
        elif kind == "add_column":
            # schema evolution mid-sequence: existing rows read NULL; the
            # new column lands BEFORE the partition column in the view
            nc = f"w{n_added[0]}"
            n_added[0] += 1
            nt = rng.choice(["INT", "STRING"])
            stmt = f"ALTER TABLE {tname} ADD COLUMNS ({nc} {nt})"
            at = len(cols) - 1 if layout == "partitioned" else len(cols)
            cols.insert(at, (nc, nt))
            model.cols = cols
            for r in model.rows.values():
                r[nc] = None
        elif kind == "ctas_snapshot":
            # CTAS from the managed table: the snapshot must equal the
            # model exactly (read-side check of every prior write)
            snap = f"{tname}_snap"
            eng.sql(f"DROP TABLE IF EXISTS {snap}")
            stmt = f"CREATE TABLE {snap} AS SELECT * FROM {tname}"
            eng.sql(stmt)
            history.append(stmt)
            got_s = sorted(
                (tuple(norm(v) for v in row)
                 for row in eng.sql(
                     f"SELECT {', '.join(c for c, _ in cols)} FROM {snap}"
                 ).collect()),
                key=lambda t: tuple((v is None, str(v)) for v in t),
            )
            want_s = sorted(
                (tuple(norm(v) for v in t) for t in model.tuples()),
                key=lambda t: tuple((v is None, str(v)) for v in t),
            )
            eng.sql(f"DROP TABLE {snap}")
            if got_s != want_s:
                print(f"MISMATCH in case {case_idx} after: {stmt}")
                print(f"snapshot ({len(got_s)}): {got_s[:20]}")
                print(f"model    ({len(want_s)}): {want_s[:20]}")
                return False
            log.append(stmt)
            continue
        else:  # truncate
            stmt = f"TRUNCATE TABLE {tname}"
            model.rows = {}
        history.append(stmt)
        eng.sql(stmt)
        skey = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
        got = sorted(
            (
                tuple(norm(v) for v in row)
                for row in eng.sql(
                    f"SELECT {', '.join(c for c, _ in cols)} FROM {tname}"
                ).collect()
            ),
            key=skey,
        )
        want = sorted(
            (tuple(norm(v) for v in t) for t in model.tuples()), key=skey
        )
        if got != want:
            print(f"MISMATCH in case {case_idx} after: {stmt}")
            print("history:")
            for h in history:
                print("  " + h + ";")
            print(f"engine ({len(got)} rows): {got[:20]}")
            print(f"model  ({len(want)} rows): {want[:20]}")
            return False
        log.append(stmt)
    eng.sql(f"DROP TABLE {tname}")
    eng.sql(f"DROP TABLE {sname}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10, help="number of cases")
    ap.add_argument("--ops", type=int, default=8, help="mutations per case")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from impala_spark.engine import ImpalaEngine
    from impala_spark.session import get_spark

    spark = get_spark("dml_fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    eng = ImpalaEngine(spark)
    rng = random.Random(args.seed)
    log: list[str] = []
    bad = 0
    for i in range(args.n):
        if not run_case(spark, eng, rng, i, args.ops, log):
            bad += 1
    print(
        f"dml fuzz: {args.n} cases x {args.ops} ops, seed {args.seed}, "
        f"{len(log)} verified mutations, {bad} mismatching cases",
        flush=True,
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
