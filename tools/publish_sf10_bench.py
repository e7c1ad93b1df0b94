#!/usr/bin/env python
"""Assemble BENCH_sf10_r8.json from a bench.py run and a DuckDB
denominator run at /root/repo/.bench_sf10 (r7 verdict task #2: the sf10
claims must be a checked-in artifact, not prose).

Usage: python tools/publish_sf10_bench.py <spark_bench.json> <duckdb.json>
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    spark = json.load(open(sys.argv[1]))
    duck = json.load(open(sys.argv[2]))
    per_q = {}
    for q, s in spark["queries"].items():
        d = duck["queries"].get(q)
        per_q[q] = {
            "spark_sec": s,
            "duckdb_sec": d,
            "ratio": round(s / d, 2) if d else None,
        }
    total_s = sum(spark["queries"].values())
    total_d = sum(v for v in duck["queries"].values() if v)
    out = {
        "round": 8,
        "sf_dir": "/root/repo/.bench_sf10",
        "fixture": "60M-row lineitem, 32 files/table, regenerated via "
                   "tools/gen_sf1.py chained (sf0.1 -> sf1 -> sf10)",
        "posture": "32 MB scan splits (SPARK_GRAFT_MAX_PARTITION_BYTES "
                   "default), shuffle.partitions 32 (above the 64 MB "
                   "single-partition gate), AQE + runtime bloom filters "
                   "ON (0.96 GiB input is above the 512 MB small-query "
                   "gate)",
        "loadavg_before_spark": spark.get("loadavg_before_spark"),
        "contaminated": spark.get("contaminated"),
        "spark_total_sec": round(total_s, 3),
        "duckdb_total_sec": round(total_d, 3),
        "ratio_total": round(total_s / total_d, 2) if total_d else None,
        "queries": per_q,
        "methodology": spark.get("methodology"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
