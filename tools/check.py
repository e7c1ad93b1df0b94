"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, column
names, and order-insensitive values.

Usage: python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from impala_spark.session import TABLES, get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return v
    try:  # Decimal
        from decimal import Decimal

        if isinstance(v, Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    from impala_spark.queries import ORACLE_SQL, SPARK_QUERIES

    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(p):  # multi-file layout (tools/gen_sf1.py)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    passed = failed = rows_only = 0
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc(limit=8)
            failed += 1
            continue
        if name not in ORACLE_SQL:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            rows_only += 1
            continue
        try:
            res = con.execute(ORACLE_SQL[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {e}")
            failed += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} vs {oc}")
            failed += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(orr)}")
            failed += 1
            continue
        if sr != orr:
            bad = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL  {name}: values differ, e.g. {bad}")
            failed += 1
            continue
        print(f"ok    {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
        passed += 1
    print(f"\n{passed} ok, {rows_only} rows-only, {failed} FAILED")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
