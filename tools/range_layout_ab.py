"""Interleaved A/B at sf10: the SQL-surface RANGE-partitioned layout
(r12, CREATE TABLE ... PARTITION BY RANGE bound form -> range-clustered
parquet) vs the same band scan over the unclustered fixture parquet.

What the layout buys: every parquet row group in the clustered table
spans a narrow key interval, so a range predicate on the key skips most
row groups at SCAN time via footer min/max. The unclustered fixture has
the key scattered across every file (interleaved copies from the scale
generator), so the same pushed filter must still decode most row groups.

Methodology (repo convention): arms alternate per rep so box drift
cancels; one-time CTAS build cost disclosed, never mixed into per-query
samples; both arms return identical values (asserted).

Usage: python tools/range_layout_ab.py [reps]  (default 5)
Writes one JSON line; redirect to BENCH_sf10_range_r12.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_spark.engine import ImpalaEngine
from impala_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_sf10")

#: ~1% key band in the middle of the key space — the selective scan a
#: time-/id-ranged query runs all day at 100 TB
N_RANGES = 16


def _run(eng, sql: str) -> tuple[float, list]:
    t0 = time.perf_counter()
    df = eng.sql(sql)
    rows = df.collect()
    return time.perf_counter() - t0, rows


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("range_layout_ab")
    spark.sparkContext.setLogLevel("ERROR")
    eng = ImpalaEngine(spark, sf_dir=SF_DIR)

    max_key = spark.table("lineitem").agg({"l_orderkey": "max"}).collect()[0][0]
    step = max_key // N_RANGES + 1
    bounds = [i * step for i in range(1, N_RANGES)]
    parts = ["PARTITION VALUES < %d" % bounds[0]]
    parts += [
        "PARTITION %d <= VALUES < %d" % (a, b)
        for a, b in zip(bounds, bounds[1:])
    ]
    parts.append("PARTITION %d <= VALUES" % bounds[-1])

    t0 = time.perf_counter()
    eng.sql(
        "CREATE TABLE rnglay_l PARTITION BY RANGE (l_orderkey) (%s)"
        " AS SELECT l_orderkey, l_extendedprice, l_quantity FROM lineitem"
        % ", ".join(parts)
    )
    build_sec = round(time.perf_counter() - t0, 2)
    print(f"# one-time range-clustered CTAS build: {build_sec}s", file=sys.stderr)

    lo, hi = int(max_key * 0.50), int(max_key * 0.51)
    plain = (
        "SELECT COUNT(*) AS n,"
        " SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS s"
        f" FROM lineitem WHERE l_orderkey BETWEEN {lo} AND {hi}"
    )
    clustered = (
        "SELECT COUNT(*) AS n,"
        " SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS s"
        f" FROM rnglay_l WHERE l_orderkey BETWEEN {lo} AND {hi}"
    )

    want = [tuple(r) for r in eng.sql(clustered).collect()]
    got = [tuple(r) for r in eng.sql(plain).collect()]
    assert got == want, "arms disagree on values"
    dfc = eng.sql(clustered)
    plan = dfc._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(l_orderkey" in plan, plan[:800]

    samples = {"plain": [], "range_clustered": []}
    loads = []
    for rep in range(reps):
        loads.append([round(x, 2) for x in os.getloadavg()])
        for arm, sql in (("plain", plain), ("range_clustered", clustered)):
            dt, rows = _run(eng, sql)
            samples[arm].append(round(dt, 3))
            print(f"# rep{rep} {arm}: {dt:.3f}s", file=sys.stderr)

    eng.sql("DROP TABLE rnglay_l")

    med = {a: round(statistics.median(v), 3) for a, v in samples.items()}
    out = {
        "metric": "range_partitioned_band_scan_ab",
        "sf_dir": SF_DIR,
        "reps": reps,
        "interleaved": True,
        "n_ranges": N_RANGES,
        "band": [lo, hi],
        "build_sec_one_time": build_sec,
        "samples": samples,
        "medians": med,
        "speedup_median": round(med["plain"] / med["range_clustered"], 2)
        if med["range_clustered"]
        else None,
        "loadavg_per_rep": loads,
        "plan_note": (
            "identical pushed filter on both arms; the clustered arm's "
            "row groups span disjoint key slices so the parquet reader "
            "skips all but the band's slice via footer min/max"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
