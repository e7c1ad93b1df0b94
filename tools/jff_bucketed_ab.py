"""join_fact_fact over a bucketed-by-orderkey layout at sf30 — r9 verdict
task #3. The reference's partition-compatible join
(P/DistributedPlanner.java:554-620) skips BOTH exchanges when the inputs
are already hash-partitioned on the join key; Spark's equivalent is a
bucketed table layout (the one-time cost any 100 TB pipeline pays), and
the post-join two-level aggregate then rides the bucket partitioning —
the whole query runs with ZERO fact exchanges and (bucket-sorted) zero
sort stages.

Arms per rep, interleaved (drift-canceling, memory: bench-box tenants):
  duck           — the jff oracle on raw sf30 parquet (DuckDB, Arrow out)
  spark_bucketed — merge join of the two bucketed tables + riding agg
  spark_raw      — the registry join_fact_fact (fresh plan per rep)

One-time layout build is cached by table existence; pass --rebuild to
force. Results are asserted identical across all three arms.

Usage: python tools/jff_bucketed_ab.py [sf_dir] [reps] [> out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F

from impala_spark import operators as ops
from impala_spark.queries import ORACLE_SQL, SPARK_QUERIES, _PLAN_CACHE
from impala_spark.session import get_spark, register_tables, table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf30"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
BUCKETS = 32


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


def build_layout(spark, rebuild: bool = False) -> tuple:
    """One-time bucketed layout: full orders + lineitem bucketed AND
    bucket-sorted by order key. A fresh process re-ATTACHES an existing
    on-disk layout (CREATE TABLE ... CLUSTERED BY ... LOCATION restores
    the bucket spec without rewriting — the in-memory catalog is what
    forgot, not the filesystem; a persistent metastore wouldn't even
    need this)."""
    names = ("bucketed_db.orders_sf30_bkt", "bucketed_db.lineitem_sf30_bkt")
    if not rebuild:
        try:
            o, li = (spark.table(n) for n in names)
            if o.count() > 0 and li.count() > 0:
                print("# layout exists, reusing", file=sys.stderr, flush=True)
                return spark.table(names[0]), spark.table(names[1])
        except Exception:
            pass
        try:
            from impala_spark.ddl import WAREHOUSE

            db_loc = os.path.join(WAREHOUSE, "bucketed_db")
            spark.sql(
                f"CREATE DATABASE IF NOT EXISTS bucketed_db LOCATION '{db_loc}'"
            )
            keys = {"orders_sf30_bkt": "o_orderkey",
                    "lineitem_sf30_bkt": "l_orderkey"}
            out = []
            for n in names:
                short = n.split(".", 1)[1]
                loc = os.path.join(db_loc, short)
                if not os.path.isdir(loc):
                    raise FileNotFoundError(loc)
                inferred = spark.read.parquet(loc).schema
                cols = ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}"
                    for f in inferred.fields
                )
                k = keys[short]
                spark.sql(
                    f"CREATE TABLE {n} ({cols}) USING parquet"
                    f" CLUSTERED BY (`{k}`) SORTED BY (`{k}`)"
                    f" INTO {BUCKETS} BUCKETS LOCATION '{loc}'"
                )
                out.append(spark.table(n))
            print("# layout re-attached from disk (no rebuild)",
                  file=sys.stderr, flush=True)
            return tuple(out)
        except Exception:
            pass  # no on-disk layout yet: build below
    t0 = time.time()
    o = ops.write_bucketed(
        table(spark, SF_DIR, "orders"), names[0], ["o_orderkey"],
        buckets=BUCKETS,
    )
    li = ops.write_bucketed(
        table(spark, SF_DIR, "lineitem"), names[1], ["l_orderkey"],
        buckets=BUCKETS,
    )
    print(
        f"# layout build {round(time.time() - t0, 1)}s "
        f"(one-time, amortized across every orderkey join)",
        file=sys.stderr, flush=True,
    )
    return o, li


def bucketed_jff(spark):
    """join_fact_fact semantics over the bucketed layout. The merge hint
    keeps the colocated strategy (a broadcast would hide it); the
    (priority, orderkey) aggregate rides HashPartitioning(orderkey)."""
    o = spark.table("bucketed_db.orders_sf30_bkt").where(
        F.col("o_orderstatus") == "O"
    ).select("o_orderkey", "o_orderpriority")
    li = spark.table("bucketed_db.lineitem_sf30_bkt").select(
        "l_orderkey", "l_extendedprice"
    )
    j = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    pa = j.groupBy("o_orderpriority", "o_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("ps")
    )
    return (
        pa.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("ps").cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        path = os.path.join(SF_DIR, f"{t}.parquet")
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    spark = get_spark("jff_bucketed_ab")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, SF_DIR)
    build_layout(spark, rebuild)

    env0 = {"loadavg": _load(), "cpu_canary_sec": _canary()}
    print(f"# start {env0}", file=sys.stderr, flush=True)

    # plan audit: the bucketed arm must have ZERO exchanges below the
    # final 5-row aggregate and zero sort stages (bucket-sorted scans)
    bdf = bucketed_jff(spark)
    plan = bdf._jdf.queryExecution().executedPlan().toString()
    fact_exchanges = plan.count("Exchange hashpartitioning(l_orderkey") + \
        plan.count("Exchange hashpartitioning(o_orderkey")
    print(f"# bucketed-arm fact exchanges: {fact_exchanges}",
          file=sys.stderr, flush=True)
    assert fact_exchanges == 0, plan[:2000]

    # results identical across the three arms (one unmeasured pass)
    duck_rows = sorted(map(tuple, con.execute(
        ORACLE_SQL["join_fact_fact"]).fetchall()), key=str)
    buck_rows = sorted(
        tuple(
            round(v, 2) if isinstance(v, float) else v for v in r
        ) for r in bdf.collect()
    )
    duck_rows = sorted(
        tuple(
            round(float(v), 2) if isinstance(v, (int, float)) and not
            isinstance(v, bool) and i == 2 else v
            for i, v in enumerate(r)
        ) for r in duck_rows
    )
    assert [r[0] for r in duck_rows] == [r[0] for r in buck_rows]
    assert all(
        abs(a[2] - b[2]) < 0.5 and a[1] == b[1]
        for a, b in zip(duck_rows, buck_rows)
    ), (duck_rows, buck_rows)
    print("# results identical", file=sys.stderr, flush=True)

    arms = {"duck": [], "spark_bucketed": [], "spark_raw": []}
    for rep in range(REPS):
        t0 = time.time()
        con.execute(ORACLE_SQL["join_fact_fact"]).arrow()
        arms["duck"].append(time.time() - t0)
        t0 = time.time()
        bucketed_jff(spark).toArrow()
        arms["spark_bucketed"].append(time.time() - t0)
        _PLAN_CACHE.clear()
        t0 = time.time()
        SPARK_QUERIES["join_fact_fact"](spark, SF_DIR).toArrow()
        arms["spark_raw"].append(time.time() - t0)
        print(
            f"# rep {rep}: duck {arms['duck'][-1]:.2f}s  "
            f"bucketed {arms['spark_bucketed'][-1]:.2f}s  "
            f"raw {arms['spark_raw'][-1]:.2f}s  load {_load()[0]}",
            file=sys.stderr, flush=True,
        )

    env1 = {"loadavg": _load(), "cpu_canary_sec": _canary()}
    med = lambda v: round(sorted(v)[len(v) // 2], 3)  # noqa: E731
    out = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "buckets": BUCKETS,
        "env_start": env0,
        "env_end": env1,
        "median_sec": {k: med(v) for k, v in arms.items()},
        "ratio_bucketed_vs_duck": round(
            med(arms["spark_bucketed"]) / med(arms["duck"]), 2
        ),
        "ratio_raw_vs_duck": round(
            med(arms["spark_raw"]) / med(arms["duck"]), 2
        ),
        "all_samples": {k: [round(x, 3) for x in v] for k, v in arms.items()},
        "fact_exchanges_bucketed": fact_exchanges,
        "methodology": (
            "interleaved per rep (duck, bucketed, raw); Arrow "
            "materialization; registry arm's plan cache cleared per rep; "
            "bucketed layout built once (cost disclosed in stderr); "
            "medians over reps"
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
