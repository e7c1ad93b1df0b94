"""Measure the r13 triangle-salted hot-bucket handling of
minhash_lsh_pairs_exact against the plain candidate join on a corpus
with genuinely hot band buckets (r12 VERDICT task #1 'Done' criterion).

Corpus: C near-identical clusters of M docs each plus singletons. Every
cluster member agrees on (nearly) all bands, so each cluster makes
`bands` hot band_hash keys of size ~M — the plain self-join computes
each bucket's C(M,2) candidate pairs in ONE reduce task (a single
enormous key; AQE skew splitting cannot divide it), while the salted
route spreads the identical pair set over s(s+1)/2 cells per bucket.

Regime note (honesty): both arms run with autoBroadcastJoinThreshold
-1. At probe sizes Spark would broadcast the banded side, and a
broadcast join has NO reduce-key concentration — the hazard this probe
measures only exists in the shuffle-join regime every real >10 MB
corpus is in. Disabling broadcast for both arms pins that regime; the
arms differ ONLY in the skew gate confs.

Arms alternate within each rep; results asserted identical via count +
order-insensitive checksums (a full 2M-pair collect would measure the
driver, not the engine). Writes MINHASH_SKEW_PROBE_r13.json.

Usage: python tools/minhash_skew_probe.py [n_clusters] [cluster_size]
       [n_singletons] [reps]
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from impala_spark import llm_ops
from impala_spark.session import get_spark


def checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a_id") * 3 + F.col("b_id")).alias("ids"),
        F.sum(F.round(F.col("jaccard") * 1e6).cast("bigint")).alias("jac"),
    ).first()
    return (r.n, r.ids, r.jac)


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cluster_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    n_singletons = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    spark = get_spark("minhash_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    random.seed(1313)
    vocab = [f"tok{i}" for i in range(5000)]
    rows = []
    did = 0
    for _c in range(n_clusters):
        base = " ".join(random.choices(vocab, k=80))
        for m in range(cluster_size):
            rows.append((did, base + f" var{m % 9}"))
            did += 1
    for _ in range(n_singletons):
        rows.append((did, " ".join(random.choices(vocab, k=50)) + f" s{did}"))
        did += 1
    df = (
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .repartition(32)
        .persist()
    )
    n_docs = df.count()
    print(f"# corpus: {n_docs} docs, {n_clusters} x {cluster_size} clusters",
          file=sys.stderr, flush=True)

    PLAIN = {"spark.graft.minhash.skewProbeMinBytes": str(1 << 60)}
    SALTED = {
        "spark.graft.minhash.skewProbeMinBytes": "0",
        "spark.graft.minhash.hotBucketThreshold": "1024",
        "spark.graft.minhash.saltFactor": "8",
    }

    def build(confs):
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            return llm_ops.minhash_lsh_pairs_exact(df, threshold=0.5)
        finally:
            for k in confs:
                spark.conf.unset(k)

    def run(confs) -> float:
        t0 = time.perf_counter()
        build(confs).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    cs_plain = checksum(build(PLAIN))
    cs_salted = checksum(build(SALTED))
    assert cs_plain == cs_salted, f"pair sets differ: {cs_plain} vs {cs_salted}"
    print(f"# identical checksums: {cs_plain}", file=sys.stderr, flush=True)

    t_plain, t_salted = [], []
    for rep in range(reps):
        t_plain.append(run(PLAIN))
        t_salted.append(run(SALTED))
        print(
            f"# rep {rep}: plain {t_plain[-1]:.2f}s salted {t_salted[-1]:.2f}s",
            file=sys.stderr, flush=True,
        )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out = {
        "probe": "minhash_skew_r13",
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "cluster_size": cluster_size,
        "pairs": cs_plain[0],
        "plain_sec": [round(t, 2) for t in t_plain],
        "salted_sec": [round(t, 2) for t in t_salted],
        "plain_median": round(med(t_plain), 2),
        "salted_median": round(med(t_salted), 2),
        "salted_wins": sum(1 for a, b in zip(t_plain, t_salted) if b < a),
        "reps": reps,
        "checksums_identical": True,
        "regime": "autoBroadcastJoinThreshold=-1 both arms (shuffle-join "
                  "regime; broadcast joins have no reduce-key concentration)",
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "MINHASH_SKEW_PROBE_r13.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
