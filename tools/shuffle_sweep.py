"""Shuffle-cost sweep for the fact-heavy TPC-H shapes at sf10 (r7 task:
q3 18.6x / q5 12x vs DuckDB on the judge's box — plans are right-shaped,
so the remaining levers are exchange width and scan parallelism).

Sweeps the two runtime-settable knobs that size the lineitem exchange:
  - spark.sql.shuffle.partitions   (exchange width; AQE coalesces DOWN
    from it, never up, so the initial value is the ceiling)
  - spark.sql.files.maxPartitionBytes (scan split size -> map-task count
    feeding the shuffle)

Usage: python tools/shuffle_sweep.py [sf_dir] [query ...]
Prints one JSON line per (query, partitions, maxPartitionBytes) with the
median of 3 fresh executions (plan cache cleared; same methodology as
bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_spark.queries import SPARK_QUERIES, _PLAN_CACHE
from impala_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf10"
QUERIES = sys.argv[2:] or ["tpch_q3_shipping_priority", "tpch_q5_local_supplier"]

PARTITIONS = [16, 32, 64, 128]
MPB = [128 * 1024 * 1024, 32 * 1024 * 1024]


def materialize(df) -> int:
    try:
        return df.toArrow().num_rows
    except Exception:
        return len(df.collect())


def main() -> None:
    spark = get_spark("shuffle_sweep")
    for name in QUERIES:  # warm: footers, JIT, codegen caches
        materialize(SPARK_QUERIES[name](spark, SF_DIR))
    for name in QUERIES:
        for parts in PARTITIONS:
            for mpb in MPB:
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
                times = []
                for _ in range(3):
                    _PLAN_CACHE.clear()
                    t0 = time.time()
                    materialize(SPARK_QUERIES[name](spark, SF_DIR))
                    times.append(round(time.time() - t0, 3))
                print(
                    json.dumps(
                        {
                            "query": name,
                            "shuffle_partitions": parts,
                            "max_partition_mb": mpb // (1024 * 1024),
                            "median": sorted(times)[1],
                            "times": times,
                        }
                    ),
                    flush=True,
                )
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))


if __name__ == "__main__":
    main()
