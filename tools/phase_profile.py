#!/usr/bin/env python
"""Phase decomposition of the per-query fixed floor (r7 verdict task #1).

Splits one fresh query execution into the phases the reference planner
would call parse/analyze/plan/schedule/execute:

  build      Python DataFrame construction: py4j round-trips + Spark's
             eager per-transformation analysis (PySpark analyzes every
             new logical plan to serve .schema)
  analysis   Catalyst analyzer fixed point (QueryPlanningTracker)
  optimization  Catalyst optimizer fixed point
  planning   physical strategy selection (SparkPlanner)
  execute    everything after planning: whole-stage codegen (Janino),
             broadcast builds, stage scheduling, task run, Arrow
             materialization back to the driver
  collect    total wall time of the execute step (= toArrow)

The tracker phases are JVM-side measurements (ms); build/collect are
wall-clock around the py4j calls. Every pass clears the plan cache so
pass 1 vs pass 2+ separates first-plan costs (codegen compile, file
footer reads) from the steady-state floor.

Usage: python tools/phase_profile.py [sf_dir] [query ...]
Default: pricing_summary tpch_q3_shipping_priority at sf0.1.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(spark, name: str, sf_dir: str, passes: int = 3) -> list[dict]:
    from impala_spark import queries as Q

    out = []
    fn = Q.SPARK_QUERIES[name]
    for p in range(passes):
        Q._PLAN_CACHE.clear()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        try:
            tbl = df.toArrow()
            nrows = tbl.num_rows
        except Exception:
            nrows = len(df.collect())
        t_collect = time.perf_counter() - t0

        qe = df._jdf.queryExecution()
        phases = {}
        try:
            it = qe.tracker().phases().iterator()
            while it.hasNext():
                kv = it.next()
                ph = kv._2()
                phases[str(kv._1())] = (ph.endTimeMs() - ph.startTimeMs()) / 1e3
        except Exception as e:  # tracker API drift: report, don't die
            phases["tracker_error"] = str(e)[:80]

        jvm_planned = sum(
            v for k, v in phases.items() if isinstance(v, float)
        )
        out.append(
            {
                "query": name,
                "pass": p,
                "rows": nrows,
                "build_s": round(t_build, 4),
                "collect_s": round(t_collect, 4),
                "phases_s": {k: round(v, 4) if isinstance(v, float) else v
                             for k, v in phases.items()},
                "execute_s": round(t_collect - 0.0, 4),
                "total_s": round(t_build + t_collect, 4),
                "jvm_plan_phases_s": round(jvm_planned, 4),
            }
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or ["pricing_summary", "tpch_q3_shipping_priority"]

    from impala_spark.session import get_spark, register_tables

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, sf_dir)

    # one throwaway execution to absorb one-time JVM costs (first Arrow
    # conversion path init, parquet footer cache) that are not per-query
    from impala_spark import queries as Q

    Q.SPARK_QUERIES[names[0]](spark, sf_dir).toArrow()

    results = []
    for n in names:
        results.extend(profile(spark, n, sf_dir))
    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
