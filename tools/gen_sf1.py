"""Generate a 10x-scaled 'sf1.0' bench dataset from the driver's sf0.1
fixtures by key-offset replication (copy i shifts every PK/FK by
i * max_key_of_table), preserving referential integrity. region/nation
are dimension-fixed, as in TPC-H. Bench-only data (gitignored); the
driver's sf0.1 remains the correctness/bench-gate input.

Usage: python tools/gen_sf1.py [outdir] [--src DIR] [--copies N]
       [--skip-corpus]
Defaults replicate the driver's sf0.1 10x into /root/repo/.bench_sf1.
The sf10 crossover fixtures (BASELINE.md bench curve) chain it:
  python tools/gen_sf1.py /root/repo/.bench_sf10 --src /root/repo/.bench_sf1 \
      --copies 10 --skip-corpus
Key offsets are computed from the SOURCE's max keys, so chained scale-ups
keep referential integrity at every level.
"""
import os
import sys

import duckdb

args = [a for a in sys.argv[1:]]
def _flag(name, default=None):
    if name in args:
        i = args.index(name)
        v = args[i + 1]
        del args[i:i + 2]
        return v
    return default

SRC = _flag("--src", "/root/testdata/sf0.1")
COPIES = int(_flag("--copies", "10"))
SKIP_CORPUS = "--skip-corpus" in args
if SKIP_CORPUS:
    args.remove("--skip-corpus")
OUT = args[0] if args else "/root/repo/.bench_sf1"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"):
    p = f"{SRC}/{t}.parquet"
    src_glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src_glob}')")

# key offsets = the source's max key per table (keys are 1..N dense)
C = con.sql("SELECT max(c_custkey) FROM customer").fetchone()[0]
S = con.sql("SELECT max(s_suppkey) FROM supplier").fetchone()[0]
P = con.sql("SELECT max(p_partkey) FROM part").fetchone()[0]
O = con.sql("SELECT max(o_orderkey) FROM orders").fetchone()[0]
E = con.sql("SELECT max(event_id) FROM events").fetchone()[0]
U = con.sql("SELECT max(user_id) FROM events").fetchone()[0] + 1

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
gen("events", f"""SELECT event_id + i*{E} AS event_id, ts, user_id + i*{U} AS user_id,
        event_type, value, props FROM events, {R}""")


# --- corpus tables (round 4): honest 10x scaling -------------------------
# Replication would quadratically inflate duplicate-pair counts (10
# identical copies of a near-dup group = 45x the pairs). Instead:
# - documents: copy i interleaves a copy-unique token between words
#   (regexp '\s+' -> ' cI '), so EVERY word shingle of copy i contains
#   cI: within-copy near-dup structure is preserved EXACTLY (all docs of
#   a copy get the same transform) while cross-copy Jaccard is 0 -> the
#   dup-pair count scales linearly, unbiased. Copy 0 keeps the original.
# - embeddings: copy i applies a seeded SIGNED PERMUTATION of the
#   dimensions (an orthogonal transform): norms and within-copy cosines
#   are exactly preserved, cross-copy cosines become incoherent noise.
if SKIP_CORPUS:
    print("corpus tables skipped (--skip-corpus)", flush=True)
    sys.exit(0)

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import shutil

D = con.sql("SELECT max(doc_id) FROM documents").fetchone()[0] + 1
_WS = "\\s+"
_doc_parts = []
for i in range(COPIES):
    text_expr = "text" if i == 0 else (
        "regexp_replace(text, '" + _WS + "', ' c" + str(i) + " ', 'g')"
    )
    _doc_parts.append(
        f"""SELECT doc_id + {i * D} AS doc_id, {text_expr} AS text,
        lang, source, n_chars FROM documents"""
    )
gen("documents", " UNION ALL ".join(_doc_parts))

emb = pq.read_table(f"{SRC}/embeddings.parquet")
vec_ids = emb.column("vec_id").to_numpy()
labels = emb.column("label").to_numpy()
vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
n, dim = vecs.shape
rng = np.random.default_rng(42)
parts = []
for i in range(COPIES):
    if i == 0:
        v = vecs
    else:
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        v = vecs[:, perm] * signs
    parts.append(
        pa.table(
            {
                "vec_id": pa.array(vec_ids + i * n, type=pa.int64()),
                "embedding": pa.array(v.tolist(), type=pa.list_(pa.float32())),
                "label": pa.array(labels, type=pa.int32()),
            }
        )
    )
emb_all = pa.concat_tables(parts)
dest = f"{OUT}/embeddings.parquet"
shutil.rmtree(dest, ignore_errors=True)
os.makedirs(dest, exist_ok=True)
step = (emb_all.num_rows + 31) // 32
for b in range(32):
    sl = emb_all.slice(b * step, step)
    if sl.num_rows:
        pq.write_table(sl, f"{dest}/part-{b:05d}.parquet")
print(f"embeddings: {emb_all.num_rows} rows in 32 file(s)", flush=True)
