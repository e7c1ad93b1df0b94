#!/usr/bin/env python
"""Assemble a BENCH_sf<N>_r<R>.json artifact from one or more bench.py
runs and a DuckDB denominator run on the same fixture dir (r7 verdict
task #2: scaled-bench claims must be a checked-in artifact, not prose).

The posture string is DERIVED from session.py's live constants and the
fixture directory's actual size — r8's hand-written string claimed
AQE+bloom ON while the artifact itself said OFF (ADVICE r8: the 0.96 GiB
sf10 fixture is below the 2 GiB SMALL_QUERY_BYTES gate). The output
schema matches BENCH_sf10_r8.json ('spark_posture', 'runs',
'per_query_least_contention_sec', ...), so re-running the tool cannot
publish metadata that contradicts the artifact format.

Usage: python tools/publish_sf10_bench.py <sf_dir> <round> \
           <duckdb.json> <spark_bench.json> [<spark_bench.json> ...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_spark import session as S


def derive_posture(sf_dir: str) -> str:
    """The ACTUAL scale posture session.py applies to this fixture dir."""
    total = S._dir_total_bytes(sf_dir)
    small = total < S.SMALL_QUERY_BYTES
    gib = total / (1 << 30)
    gate_gib = S.SMALL_QUERY_BYTES / (1 << 30)
    mpb = int(
        os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", str(32 * 1024 * 1024)
        )
    ) // (1 << 20)
    return (
        f"{mpb} MB scan splits, shuffle.partitions "
        f"{S.DEFAULT_SHUFFLE_PARTITIONS} (input is above the 64 MB "
        f"single-partition relational gate), AQE + runtime bloom filters "
        + (
            f"OFF ({gib:.2f} GiB input is below the "
            f"{gate_gib:.0f} GiB SMALL_QUERY_BYTES small-query gate; "
            f"measured at sf10: bloom cost q5 +1.4s, AQE replan neutral "
            f"in a single JVM)"
            if small
            else f"ON ({gib:.2f} GiB input is above the "
            f"{gate_gib:.0f} GiB SMALL_QUERY_BYTES small-query gate)"
        )
    )


def main() -> None:
    if len(sys.argv) < 5:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sf_dir, rnd, duck_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    duck = json.load(open(duck_path))
    runs = []
    spark_runs = []
    for i, p in enumerate(sys.argv[4:], 1):
        r = json.load(open(p))
        spark_runs.append(r)
        runs.append(
            {
                "run": i,
                "total_sec": r.get("value"),
                "loadavg_before_spark": r.get("loadavg_before_spark"),
                "cpu_canary_sec": r.get("cpu_canary_sec"),
                "contaminated_flag": r.get("contaminated"),
                "attempts": r.get("attempts"),
            }
        )
    # per-query MIN across all runs' per-query medians: the least-
    # contention estimate on a noisy box (each run's median already
    # rejects single-burst samples; the cross-run min rejects whole
    # contaminated runs)
    names = list(spark_runs[0]["queries"].keys())
    least = {
        q: min(r["queries"][q] for r in spark_runs if q in r["queries"])
        for q in names
    }
    duck_q = duck["queries"]
    ratios = {
        q: round(least[q] / duck_q[q], 2)
        for q in names
        if duck_q.get(q)
    }
    total_s = round(sum(least.values()), 3)
    total_d = round(sum(duck_q[q] for q in names if duck_q.get(q)), 3)
    out = {
        "round": rnd,
        "sf_dir": sf_dir,
        "fixture": (
            "generated via tools/gen_sf1.py chained key-offset "
            "replication (see that tool's docstring); gitignored, "
            "reproducible"
        ),
        "spark_posture": derive_posture(sf_dir),
        "runs": runs,
        "per_query_least_contention_sec": least,
        "duckdb_denominator_sec": {q: duck_q.get(q) for q in names},
        "duckdb_total_sec": total_d,
        "ratios_least_contention": ratios,
        "ratio_total_least_contention": (
            round(total_s / total_d, 2) if total_d else None
        ),
        "methodology": spark_runs[0].get("methodology"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
