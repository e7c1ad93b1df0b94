"""Interleaved A/B: partition-scoped UPDATE rewrite vs full-table rewrite.

    python tools/dmlscope_ab.py [sf_dir] [--reps N] [--out FILE]

The engine's UPDATE on a partitioned table rewrites ONLY the partitions
whose rows match the WHERE predicate (ddl.modify: _touched_partitions ->
_rewrite_partitions); the full-rewrite arm is the same statement with
the scoped path disabled (ddl.MAX_SCOPED_PARTITIONS = 0, the
unselective-WHERE fallback). At 100 TB this is the difference between
rewriting one day's partition and rewriting the table — the A/B
quantifies the constant at sf1 (~6M-row lineitem, month partitions,
one month updated per rep).

Two tables (one per arm) are CTAS'd once from the same source; each rep
applies the identical idempotent-cost mutation (quantity += 1) so arms
stay row-identical across reps. Arms alternate per rep (steal drift
cancels). Output: one JSON line with per-rep times and medians.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.path.join(HERE, ".bench_sf1"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from impala_spark import ddl
    from impala_spark.engine import ImpalaEngine
    from impala_spark.session import get_spark, register_tables

    spark = get_spark("dmlscope_ab")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, args.sf_dir)
    eng = ImpalaEngine(spark, args.sf_dir)

    src = (
        "SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, "
        "substr(l_shipdate, 1, 7) AS m FROM lineitem"
    )
    for arm in ("scoped", "full"):
        name = f"ab_dmlscope_{arm}"
        if ddl.table_info(name) is not None:
            ddl.drop_table(spark, name)
        ddl.create_table_as_select(spark, name, src, partition_cols=["m"])
    n_parts = spark.table("ab_dmlscope_scoped").select("m").distinct().count()
    target_month = (
        spark.table("ab_dmlscope_scoped")
        .groupBy("m").count().orderBy("m").collect()[n_parts // 2][0]
    )
    stmt = (
        "UPDATE {t} SET l_quantity = l_quantity + 1 WHERE m = '%s'"
        % target_month
    )

    times: dict[str, list[float]] = {"scoped": [], "full": []}
    order = []
    for rep in range(args.reps):
        arms = ["scoped", "full"] if rep % 2 == 0 else ["full", "scoped"]
        for arm in arms:
            saved = ddl.MAX_SCOPED_PARTITIONS
            if arm == "full":
                ddl.MAX_SCOPED_PARTITIONS = 0  # force the fallback path
            try:
                t0 = time.monotonic()
                eng.sql(stmt.format(t=f"ab_dmlscope_{arm}"))
                dt = time.monotonic() - t0
            finally:
                ddl.MAX_SCOPED_PARTITIONS = saved
            times[arm].append(round(dt, 3))
            order.append(f"{arm}:{dt:.2f}")
    rows = spark.table("ab_dmlscope_scoped").count()
    # both arms applied the same mutations — verify they agree
    diff = (
        spark.table("ab_dmlscope_scoped")
        .exceptAll(spark.table("ab_dmlscope_full"))
        .count()
    )
    out = {
        "metric": "partition_scoped_update_ab",
        "sf_dir": args.sf_dir,
        "rows": rows,
        "partitions": n_parts,
        "target_month": target_month,
        "reps": args.reps,
        "scoped_sec": times["scoped"],
        "full_sec": times["full"],
        "scoped_median": statistics.median(times["scoped"]),
        "full_median": statistics.median(times["full"]),
        "speedup": round(
            statistics.median(times["full"]) / statistics.median(times["scoped"]), 2
        ),
        "arms_row_identical": diff == 0,
        "interleave": order,
    }
    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    for arm in ("scoped", "full"):
        ddl.drop_table(spark, f"ab_dmlscope_{arm}")


if __name__ == "__main__":
    main()
