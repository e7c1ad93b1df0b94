#!/usr/bin/env python
"""Assemble BENCH_sf30_r9.json from one or more tools/crossover_ab.py
output files (r8 verdict task #1: the crossover claim must be a
checked-in interleaved-A/B artifact, not an extrapolation).

Every input run is disclosed verbatim (env indicators included); the
headline ratios come from the run whose suite ratio is the MEDIAN
across input runs (ties toward the faster end-of-run canary), never
from mixing runs. A fastest-canary rule was tried first and rejected:
the 180M-row join_fact_fact shuffle catches multi-minute steal bursts
the single-thread canary cannot see, so the canary-cleanest run can
still carry one 3x-outlier query; the median run is burst-robust and
still a SINGLE honest run.

Usage: python tools/publish_sf30_bench.py <round> <run.json> [more...]
           [--sf10 <sf10_run.json>]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.publish_sf10_bench import derive_posture


def _load(path: str) -> dict:
    """JSON load tolerant of leading non-JSON noise (the driver JVM can
    emit GC warnings on stdout ahead of the result line)."""
    raw = open(path).read()
    return json.loads(raw[raw.index("{"):])


def main() -> None:
    args = sys.argv[1:]
    sf10 = None
    if "--sf10" in args:
        i = args.index("--sf10")
        sf10 = _load(args[i + 1])
        del args[i:i + 2]
    rnd = int(args[0])
    runs = [_load(p) for p in args[1:]]
    by_ratio = sorted(
        runs,
        key=lambda r: (
            r["ratio_total"],
            max(r["env_start"]["cpu_canary_sec"],
                r["env_end"]["cpu_canary_sec"]),
        ),
    )
    best = by_ratio[(len(by_ratio) - 1) // 2]  # median run by suite ratio
    sf_dir = best["sf_dir"]
    out = {
        "round": rnd,
        "sf_dir": sf_dir,
        "fixture": (
            "180M-row lineitem / 3.0 GiB, 32 files/table, chained "
            "key-offset replication: tools/gen_sf1.py "
            "/root/repo/.bench_sf30 --src /root/repo/.bench_sf1 "
            "--copies 30 --skip-corpus; gitignored, reproducible"
        ),
        "spark_posture": derive_posture(sf_dir),
        "methodology": best["methodology"],
        "environment_note": (
            "this host's effective CPU speed swings ~2-3x with clean "
            "start indicators (single-thread canary 0.10-0.53 s across "
            "r9; idle reference 0.10-0.15 s) — the interleaved "
            "DuckDB-then-Spark per-query alternation cancels that drift "
            "out of the RATIOS; absolute seconds must be read against "
            "each run's canary"
        ),
        "headline": {
            "spark_total_sec": best["spark_total_sec"],
            "duckdb_total_sec": best["duckdb_total_sec"],
            "ratio_total": best["ratio_total"],
            "queries_within_2x": best["queries_within_2x"],
            "ratios": best["ratios"],
            "spark_median_sec": best["spark_median_sec"],
            "duckdb_median_sec": best["duckdb_median_sec"],
            "env_start": best["env_start"],
            "env_end": best["env_end"],
        },
        "all_runs": runs,
        "sf10_companion": sf10,
        "verdict_honest": (
            "the r5 'inside the 2x gate around sf30-100' extrapolation "
            "is FALSIFIED: at 3 GiB both engines are in their linear "
            "regime (DuckDB hits no memory wall on a 128 GiB box), so "
            "the suite ratio converges to the marginal-throughput "
            "constant, not to 1. The gate-passing scenarios are the "
            "repeated-statement daemon model (12x FASTER than DuckDB "
            "fresh at sf10, disclosed separately), the algorithmic wins "
            "(minhash-LSH 79x), and per-query analytic_ranking; the "
            "cold relational scans sit at a constant ~3-10x, dominated "
            "by scan decode + exchange machinery that distributes at "
            "cluster scale"
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
