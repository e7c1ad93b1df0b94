"""Capture explain("formatted") for registry queries into plans/<tag>/.

Usage: python tools/capture_plans.py <outdir> <suffix> [sf_dir] [name ...]
e.g.   python tools/capture_plans.py plans/r12 after /root/testdata/sf0.1 \
           join_fact_fact llm_minhash_lsh
Default names: the bench HEADLINE suite.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from bench import HEADLINE
    from impala_spark.queries import SPARK_QUERIES

    names = sys.argv[4:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = SPARK_QUERIES[name](spark, sf_dir)
        # Public API only (ADVICE r12): df.explain prints from Python, so
        # redirecting stdout captures the exact formatted plan without
        # touching _jdf/_jvm internals.
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} exchange mentions)",
              flush=True)


if __name__ == "__main__":
    main()
