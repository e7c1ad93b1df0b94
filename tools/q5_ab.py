"""Interleaved A/B: current q5 text vs the supplier-first rewrite at a
given fixture dir (default .bench_sf10). Arms alternate WITHIN each rep
(drift-canceling — the only trustworthy comparison on this box); result
identity is asserted before timing.

Usage: python tools/q5_ab.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_spark.parser import translate
from impala_spark.session import get_spark, register_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

OLD = """
    WITH j AS (
      SELECT n_name,
        CAST(ROUND(l_extendedprice * 10000) AS BIGINT)
          * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS dp8
      FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ), a AS (
      SELECT n_name,
        SUM(dp8 % 1000000) AS r0, SUM(dp8 DIV 1000000 % 1000000) AS r1,
        SUM(dp8 DIV 1000000000000) AS r2
      FROM j GROUP BY n_name
    )
    SELECT n_name,
           CAST(ROUND(((CAST(r2 AS DECIMAL(38,0)) * 1000000 + r1) * 1000000 + r0) / 100000000, 2) AS DOUBLE) AS revenue
    FROM a
    ORDER BY revenue DESC, n_name
"""

NEW = """
    WITH s_asia AS (
      SELECT s_suppkey, s_nationkey, n_name
      FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), j AS (
      SELECT /*+ BROADCAST(s_asia) */ n_name,
        CAST(ROUND(l_extendedprice * 10000) AS BIGINT)
          * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS dp8
      FROM lineitem
        JOIN s_asia   ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ), a AS (
      SELECT n_name,
        SUM(dp8 % 1000000) AS r0, SUM(dp8 DIV 1000000 % 1000000) AS r1,
        SUM(dp8 DIV 1000000000000) AS r2
      FROM j GROUP BY n_name
    )
    SELECT n_name,
           CAST(ROUND(((CAST(r2 AS DECIMAL(38,0)) * 1000000 + r1) * 1000000 + r0) / 100000000, 2) AS DOUBLE) AS revenue
    FROM a
    ORDER BY revenue DESC, n_name
"""


def main() -> None:
    spark = get_spark("q5_ab")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, SF_DIR)
    old_sql, new_sql = translate(OLD), translate(NEW)
    a, b = spark.sql(old_sql).collect(), spark.sql(new_sql).collect()
    assert a == b, f"RESULT MISMATCH\nold={a}\nnew={b}"
    print(f"results identical ({len(a)} rows)", flush=True)
    print("load", [round(x, 2) for x in os.getloadavg()], flush=True)
    times: dict[str, list[float]] = {"old": [], "new": []}
    for rep in range(REPS):
        for arm, sql in (("old", old_sql), ("new", new_sql)):
            df = spark.sql(sql)  # fresh plan each rep (no reuse)
            t0 = time.time()
            df.toArrow()
            dt = time.time() - t0
            times[arm].append(dt)
            print(f"rep {rep} {arm}: {dt:.2f}s", flush=True)
    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    print(f"medians: old {med['old']:.2f}s new {med['new']:.2f}s "
          f"({100 * (med['new'] / med['old'] - 1):+.0f}%)", flush=True)
    print("load", [round(x, 2) for x in os.getloadavg()], flush=True)


if __name__ == "__main__":
    main()
