"""Interleaved Spark/DuckDB A/B over the rel10 suite at a scaled fixture
dir — the crossover measurement (r8 verdict task #1: turn the
"inside the 2x gate at sf30-100" extrapolation into a checked-in fact).

Methodology: arms alternate WITHIN each rep (DuckDB then Spark, per
query, per rep) so slow external-tenant drift hits both engines equally
— the only trustworthy comparison on this box (BASELINE.md rounds 6-8).
Both sides materialize fully through their native Arrow client path;
Spark's prepared-plan cache is cleared before every timed execution (no
shuffle-stage reuse); per-(query, engine) medians over N reps.
Contamination indicators (loadavg, single-thread CPU canary) are
sampled before and after and always disclosed.

Usage: python tools/crossover_ab.py [sf_dir] [reps] [> out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from impala_spark.queries import ORACLE_SQL, SPARK_QUERIES, _PLAN_CACHE
from impala_spark.session import TABLES, get_spark, register_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf30"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

#: the 10 relational+streaming headline queries (BASELINE.md "rel10" —
#: corpus tables are not scaled past sf1, so the LLM ops stay out)
REL10 = [
    "pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "join_fact_fact",
    "join_three_way",
    "agg_count_distinct",
    "analytic_ranking",
    "subquery_not_in",
    "events_tumbling_window",
]


def _canary() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    return round(time.perf_counter() - t0, 3)


def _load() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return [-1.0, -1.0, -1.0]


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isdir(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    spark = get_spark("crossover_ab")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, SF_DIR)

    env0 = {"loadavg": _load(), "cpu_canary_sec": _canary()}
    print(f"# start {env0}", file=sys.stderr, flush=True)

    # warm both engines once (parquet footers, JIT, codegen caches —
    # both sides amortize these in any long-lived service)
    for name in REL10:
        con.execute(ORACLE_SQL[name]).arrow()
        _PLAN_CACHE.clear()
        SPARK_QUERIES[name](spark, SF_DIR).toArrow()
        print(f"# warmed {name}", file=sys.stderr, flush=True)

    duck_t: dict[str, list[float]] = {n: [] for n in REL10}
    spark_t: dict[str, list[float]] = {n: [] for n in REL10}
    for rep in range(REPS):
        for name in REL10:
            t0 = time.time()
            con.execute(ORACLE_SQL[name]).arrow()
            duck_t[name].append(time.time() - t0)
            _PLAN_CACHE.clear()  # fresh plan + fresh shuffles
            t0 = time.time()
            SPARK_QUERIES[name](spark, SF_DIR).toArrow()
            spark_t[name].append(time.time() - t0)
            print(
                f"# rep {rep} {name}: duck {duck_t[name][-1]:.2f}s "
                f"spark {spark_t[name][-1]:.2f}s",
                file=sys.stderr, flush=True,
            )

    env1 = {"loadavg": _load(), "cpu_canary_sec": _canary()}
    med = lambda v: round(sorted(v)[len(v) // 2], 3)  # noqa: E731
    duck_med = {n: med(v) for n, v in duck_t.items()}
    spark_med = {n: med(v) for n, v in spark_t.items()}
    ratios = {
        n: round(spark_med[n] / duck_med[n], 2) if duck_med[n] else None
        for n in REL10
    }
    out = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "env_start": env0,
        "env_end": env1,
        "duckdb_median_sec": duck_med,
        "spark_median_sec": spark_med,
        "ratios": ratios,
        "duckdb_total_sec": round(sum(duck_med.values()), 3),
        "spark_total_sec": round(sum(spark_med.values()), 3),
        "ratio_total": round(
            sum(spark_med.values()) / sum(duck_med.values()), 2
        ),
        "queries_within_2x": sum(
            1 for r in ratios.values() if r is not None and r <= 2.0
        ),
        "all_samples": {
            "duckdb": {n: [round(x, 3) for x in v] for n, v in duck_t.items()},
            "spark": {n: [round(x, 3) for x in v] for n, v in spark_t.items()},
        },
        "methodology": (
            "interleaved A/B: per rep, per query, DuckDB oracle then Spark "
            "(drift-canceling); both via native Arrow materialization; "
            "Spark plan cache cleared per execution (fresh plans+shuffles); "
            "medians over reps; warm pass first on both engines"
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
