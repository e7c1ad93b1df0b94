"""Measure the DuckDB-oracle denominator for the bench headline suite.

The reference publishes no numbers (BASELINE.md), so the operative perf
gate is "within 2x of the DuckDB oracle at the same scale factor". This
tool produces that denominator reproducibly: it runs each headline
query's oracle SQL on DuckDB at $SPARK_GRAFT_SF_DIR (default sf0.1),
warm (one untimed pass then one timed pass — the same methodology as
bench.py), and prints one JSON line.

Usage: python tools/baseline_duckdb.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE, SF_DIR
from impala_spark.queries import ORACLE_SQL
from impala_spark.session import TABLES


def _mat(con, sql) -> None:
    """Full materialization via DuckDB's native Arrow path (the symmetric
    counterpart of bench.py's DataFrame.toArrow); fetchall fallback."""
    try:
        con.execute(sql).arrow()
    except Exception:
        con.execute(sql).fetchall()


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isdir(path):  # multi-file layout (tools/gen_sf1.py)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        sql = ORACLE_SQL.get(name)
        if sql is None:
            per_query[name] = None
            continue
        _mat(con, sql)  # warm
        times = []
        for _ in range(3):
            t0 = time.time()
            _mat(con, sql)
            times.append(time.time() - t0)
            if times[-1] > 10:  # pathological oracle (minhash all-pairs)
                break
        dt = round(sorted(times)[len(times) // 2], 3)  # median, same as bench.py
        per_query[name] = dt
        total += dt
        print(f"# {name}: {dt}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "methodology": "warm, full .arrow() materialization (fetchall fallback), median of 3 timed passes per query",
            }
        )
    )


if __name__ == "__main__":
    main()
