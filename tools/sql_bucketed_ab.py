"""Interleaved A/B at sf10: the SQL-surface hash-bucketed layout (r11,
CREATE TABLE ... PARTITION BY HASH -> bucketBy) vs the same fact-fact
join over unbucketed fixture parquet.

The r10 jff artifact (BENCH_sf30_jff_r10.json) established the layout's
value at sf30 through the Python API (operators.write_bucketed); this
run shows the SAME plan shape is now reachable from engine.sql: zero
join-key exchanges, zero sorts on the bucketed arm. Arms alternate per
rep so box drift cancels (memory: only interleaved A/Bs are
trustworthy here). One-time CTAS build cost disclosed, never mixed into
the per-query samples.

Usage: python tools/sql_bucketed_ab.py [reps]  (default 5)
Writes BENCH_sf10_sqlbkt_r11.json next to the repo's other artifacts.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_spark.engine import ImpalaEngine
from impala_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_sf10")

PLAIN = (
    "SELECT o_orderpriority, COUNT(*) AS n, SUM(l_quantity) AS qty"
    " FROM orders o JOIN [shuffle] lineitem l ON o.o_orderkey = l.l_orderkey"
    " GROUP BY o_orderpriority ORDER BY o_orderpriority"
)
BUCKETED = (
    "SELECT o_orderpriority, COUNT(*) AS n, SUM(l_quantity) AS qty"
    " FROM sqlbkt_o o JOIN [shuffle] sqlbkt_l l ON o.o_orderkey = l.l_orderkey"
    " GROUP BY o_orderpriority ORDER BY o_orderpriority"
)


def _run(eng, sql: str) -> tuple[float, list]:
    t0 = time.perf_counter()
    df = eng.sql(sql)
    rows = df.collect()
    return time.perf_counter() - t0, rows


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("sql_bucketed_ab")
    spark.sparkContext.setLogLevel("ERROR")
    eng = ImpalaEngine(spark, sf_dir=SF_DIR)

    t0 = time.perf_counter()
    eng.sql(
        "CREATE TABLE sqlbkt_o PARTITION BY HASH(o_orderkey) PARTITIONS 16"
        " AS SELECT o_orderkey, o_orderpriority FROM orders"
    )
    eng.sql(
        "CREATE TABLE sqlbkt_l PARTITION BY HASH(l_orderkey) PARTITIONS 16"
        " AS SELECT l_orderkey, l_quantity FROM lineitem"
    )
    build_sec = round(time.perf_counter() - t0, 2)
    print(f"# one-time bucketed CTAS build: {build_sec}s", file=sys.stderr)

    # plan assertions once, warm both arms
    dfb = eng.sql(BUCKETED)
    want = [tuple(r) for r in dfb.collect()]
    plan = dfb._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"Exchange hashpartitioning\((?:o_orderkey|l_orderkey)", plan
    ), plan[:800]
    dfp = eng.sql(PLAIN)
    got = [tuple(r) for r in dfp.collect()]
    assert got == want, "arms disagree on values"

    samples = {"plain": [], "bucketed": []}
    loads = []
    for rep in range(reps):
        loads.append([round(x, 2) for x in os.getloadavg()])
        for arm, sql in (("plain", PLAIN), ("bucketed", BUCKETED)):
            dt, rows = _run(eng, sql)
            samples[arm].append(round(dt, 3))
            print(f"# rep{rep} {arm}: {dt:.3f}s ({len(rows)} rows)", file=sys.stderr)

    eng.sql("DROP TABLE sqlbkt_o")
    eng.sql("DROP TABLE sqlbkt_l")

    med = {a: round(statistics.median(v), 3) for a, v in samples.items()}
    out = {
        "metric": "sql_surface_bucketed_join_ab",
        "sf_dir": SF_DIR,
        "reps": reps,
        "interleaved": True,
        "build_sec_one_time": build_sec,
        "samples": samples,
        "medians": med,
        "speedup_median": round(med["plain"] / med["bucketed"], 2)
        if med["bucketed"]
        else None,
        "loadavg_per_rep": loads,
        "plan_note": (
            "bucketed arm plan-asserted zero exchanges on the join key; "
            "both arms force the partitioned join via the Impala [SHUFFLE] "
            "hint so the comparison isolates the layout, not the join "
            "strategy"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
