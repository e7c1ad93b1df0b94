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

#: Range key for the A/B. NOT l_orderkey: the scale generator replicates
#: by key OFFSET, so the fixture's files are already near-clustered on
#: l_orderkey and footer min/max skips on the plain arm too (measured
#: 0.97x — no headroom). l_suppkey is uniformly scattered across every
#: file, which is exactly the case the layout exists for: cluster by a
#: key the ingest order does not give you.
RANGE_KEY = os.environ.get("SPARK_GRAFT_RANGE_KEY", "l_suppkey")

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

    max_key = spark.table("lineitem").agg({RANGE_KEY: "max"}).collect()[0][0]
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
        ("CREATE TABLE rnglay_l PARTITION BY RANGE (%s) (%%s)"
         " AS SELECT %s, l_extendedprice, l_quantity FROM lineitem"
         % (RANGE_KEY, RANGE_KEY))
        % ", ".join(parts)
    )
    build_sec = round(time.perf_counter() - t0, 2)
    print(f"# one-time range-clustered CTAS build: {build_sec}s", file=sys.stderr)

    lo, hi = int(max_key * 0.50), int(max_key * 0.51)
    plain = (
        "SELECT COUNT(*) AS n,"
        " SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS s"
        f" FROM lineitem WHERE {RANGE_KEY} BETWEEN {lo} AND {hi}"
    )
    clustered = (
        "SELECT COUNT(*) AS n,"
        " SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS s"
        f" FROM rnglay_l WHERE {RANGE_KEY} BETWEEN {lo} AND {hi}"
    )

    want = [tuple(r) for r in eng.sql(clustered).collect()]
    got = [tuple(r) for r in eng.sql(plain).collect()]
    assert got == want, "arms disagree on values"
    dfc = eng.sql(clustered)
    plan = dfc._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and ("GreaterThanOrEqual(%s" % RANGE_KEY) in plan, plan[:800]

    samples = {"plain": [], "range_clustered": []}
    loads = []
    for rep in range(reps):
        loads.append([round(x, 2) for x in os.getloadavg()])
        for arm, sql in (("plain", plain), ("range_clustered", clustered)):
            dt, rows = _run(eng, sql)
            samples[arm].append(round(dt, 3))
            print(f"# rep{rep} {arm}: {dt:.3f}s", file=sys.stderr)

    # footer inspection: the fraction of row groups whose [min,max] span
    # overlaps the band — what the parquet reader must decode. This is
    # the scale lever: wall-clock at sf10 single-box sits near the task
    # floor, but the decode fraction is what a 100 TB scan pays.
    import glob as _glob

    import pyarrow.parquet as _pq

    from impala_spark import ddl as _ddl

    def rg_fraction(path_glob: str, col: str) -> float:
        total = hit = 0
        for f in _glob.glob(path_glob):
            md = _pq.read_metadata(f)
            names = {md.schema.column(i).name: i
                     for i in range(len(md.schema))}
            ci = names[col]
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                total += 1
                if st is None or (st.min <= hi and st.max >= lo):
                    hit += 1
        return round(hit / max(total, 1), 4)

    frac = {
        "plain": rg_fraction(
            os.path.join(SF_DIR, "lineitem.parquet", "*.parquet")
            if os.path.isdir(os.path.join(SF_DIR, "lineitem.parquet"))
            else os.path.join(SF_DIR, "lineitem.parquet"), RANGE_KEY),
        "range_clustered": rg_fraction(
            os.path.join(_ddl.table_info("rnglay_l").path, "*.parquet"),
            RANGE_KEY),
    }
    eng.sql("DROP TABLE rnglay_l")

    med = {a: round(statistics.median(v), 3) for a, v in samples.items()}
    out = {
        "metric": "range_partitioned_band_scan_ab",
        "sf_dir": SF_DIR,
        "reps": reps,
        "interleaved": True,
        "n_ranges": N_RANGES,
        "range_key": RANGE_KEY,
        "band": [lo, hi],
        "build_sec_one_time": build_sec,
        "samples": samples,
        "medians": med,
        "speedup_median": round(med["plain"] / med["range_clustered"], 2)
        if med["range_clustered"]
        else None,
        "row_group_fraction_overlapping_band": frac,
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
