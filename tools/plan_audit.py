"""Plan-quality audit: physical-plan properties for every registered
query (default: the tpcds corpus — the reference's tpcds-all is a PLAN
golden suite, T/planner/PlannerTest.java:218-223, so the Spark analog
of "golden plans" is a per-query property audit rather than text pins).

    python tools/plan_audit.py [sf_dir] [name ...]

Emits one JSON line per query with the properties that matter at scale:
  * exchanges      — shuffle count (each is a full network pass)
  * broadcasts     — BroadcastExchange count (dims should land here)
  * cartesian      — CartesianProduct/BroadcastNestedLoopJoin presence
  * sort_merge / hash_join — join strategy mix
  * codegen_spans  — WholeStageCodegen regions (wider = more fused)
  * scans / pushed — FileScan count and whether any PushedFilters made
                     it to the parquet reader

and a trailing summary line. Non-zero exit if any audited plan contains
a cartesian product (the same gate tests/test_tpch_shapes.py pins).
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def audit_plan(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        # a true cartesian is the scale hazard; BroadcastNestedLoopJoin
        # is reported separately because joining one-row scalar
        # aggregates (tpcds q28/q88/q90 brackets) legitimately plans as
        # BNLJ — each side is a single row, so it's broadcast-cheap
        "cartesian": "CartesianProduct" in plan,
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "hash_joins": plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin"),
        # the tree spelling is "*(n) Node" (the formatted explain spells
        # it WholeStageCodegen (n)); count distinct fused regions
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": plan.count("FileScan parquet"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    names: list[str] = []
    for a in sys.argv[1:]:
        if os.path.isdir(a):
            sf_dir = a
        else:
            names.append(a)

    from impala_spark.queries import SPARK_QUERIES
    from impala_spark.session import get_spark

    if not names:
        names = sorted(n for n in SPARK_QUERIES if n.startswith("tpcds_"))

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    bad: list[str] = []
    totals = {"exchanges": 0, "broadcasts": 0, "cartesian": 0}
    for name in names:
        df = SPARK_QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        props = audit_plan(plan)
        print(json.dumps({"query": name, **props}), flush=True)
        totals["exchanges"] += props["exchanges"]
        totals["broadcasts"] += props["broadcasts"]
        if props["cartesian"]:
            totals["cartesian"] += 1
            bad.append(name)
    print(json.dumps({"summary": True, "queries": len(names), **totals,
                      "cartesian_queries": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
