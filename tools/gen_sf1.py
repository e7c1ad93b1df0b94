"""Generate a 10x-scaled 'sf1.0' bench dataset from the driver's sf0.1
fixtures by key-offset replication (copy i shifts every PK/FK by
i * max_key_of_table), preserving referential integrity. region/nation
are dimension-fixed, as in TPC-H. Bench-only data (gitignored); the
driver's sf0.1 remains the correctness/bench-gate input.

Usage: python tools/gen_sf1.py [outdir]  (default /root/repo/.bench_sf1)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf1"
COPIES = 10
# offsets chosen as the table's row count at sf0.1 (keys are 1..N)
C, S, P, O, E = 15_000, 1_000, 20_000, 150_000, 100_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"):
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

def gen(name: str, select: str, files: int = 32) -> None:
    """Write the scaled table as `files` parquet part-files under a
    <name>.parquet/ directory — the layout a 32-task distributed writer
    produces. A single monolithic file caps Spark's scan parallelism at
    ceil(bytes / maxPartitionBytes) tasks (the 140 MB sf1.0 lineitem got
    2), which benchmarks the data layout, not the engine."""
    import shutil

    tbl = con.sql(select).arrow()
    n = tbl.num_rows
    if n < files * 1000:
        files = 1
    dest = f"{OUT}/{name}.parquet"
    shutil.rmtree(dest, ignore_errors=True)
    if os.path.isfile(dest):
        os.remove(dest)
    os.makedirs(dest, exist_ok=True)
    import pyarrow.parquet as pq

    step = (n + files - 1) // files
    for b in range(files):
        sl = tbl.slice(b * step, step)
        if sl.num_rows:
            pq.write_table(sl, f"{dest}/part-{b:05d}.parquet")
    print(f"{name}: {n} rows in {files} file(s)", flush=True)

R = f"range({COPIES}) t(i)"
gen("region", "SELECT * FROM region")
gen("nation", "SELECT * FROM nation")
gen("customer", f"""SELECT c_custkey + i*{C} AS c_custkey, c_name, c_nationkey,
        c_acctbal, c_mktsegment FROM customer, {R}""")
gen("supplier", f"""SELECT s_suppkey + i*{S} AS s_suppkey, s_name, s_nationkey,
        s_acctbal FROM supplier, {R}""")
gen("part", f"""SELECT p_partkey + i*{P} AS p_partkey, p_name, p_brand, p_type,
        p_size, p_retailprice FROM part, {R}""")
gen("orders", f"""SELECT o_orderkey + i*{O} AS o_orderkey, o_custkey + i*{C} AS o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders, {R}""")
gen("lineitem", f"""SELECT l_orderkey + i*{O} AS l_orderkey, l_partkey + i*{P} AS l_partkey,
        l_suppkey + i*{S} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM lineitem, {R}""")
gen("events", f"""SELECT event_id + i*{E} AS event_id, ts, user_id + i*1500 AS user_id,
        event_type, value, props FROM events, {R}""")
