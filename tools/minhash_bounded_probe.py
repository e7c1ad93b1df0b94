"""Measure the bounded minhash pair contract against the exact one on a
skewed corpus (r12, VERDICT r11 #5 'Done' criterion).

Builds a synthetic corpus with heavy near-duplication — C clusters of M
near-identical docs each plus unrelated singletons — and measures pair
counts and wall time for minhash_lsh_pairs_exact (the quadratic
all-qualifying-pairs contract, measured ~25M pairs at 500k docs in r11)
vs minhash_lsh_pairs_bounded (star+chain per band bucket, linear).

Also verifies the contract on the measured corpus: bounded ⊆ exact and
identical connected components via dedup_clusters.

Writes MINHASH_BOUNDED_PROBE_r13.json at the repo root.
"""

import json
import random
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from impala_spark import llm_ops  # noqa: E402
from impala_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    cluster_size = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_singletons = int(sys.argv[3]) if len(sys.argv) > 3 else 190_000

    spark = get_spark("minhash_bounded_probe")
    spark.sparkContext.setLogLevel("ERROR")
    random.seed(1234)
    vocab = [f"tok{i}" for i in range(5000)]
    rows = []
    did = 0
    for c in range(n_clusters):
        base = " ".join(random.choices(vocab, k=80))
        for m in range(cluster_size):
            rows.append((did, base + f" var{m % 9}"))
            did += 1
    for _ in range(n_singletons):
        rows.append((did, " ".join(random.choices(vocab, k=50)) + f" s{did}"))
        did += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string") \
        .repartition(32).persist()
    n_docs = df.count()

    t0 = time.time()
    bounded = llm_ops.minhash_lsh_pairs_bounded(
        df, threshold=0.5, neighbors_per_doc=2
    ).persist()
    n_bounded = bounded.count()
    t_bounded = round(time.time() - t0, 2)

    t0 = time.time()
    exact = llm_ops.minhash_lsh_pairs_exact(df, threshold=0.5).persist()
    n_exact = exact.count()
    t_exact = round(time.time() - t0, 2)

    # contract checks on the measured corpus
    subset_violations = bounded.join(
        exact.select("a_id", "b_id"), ["a_id", "b_id"], "left_anti"
    ).count()
    b_cl = llm_ops.dedup_clusters(bounded)
    e_cl = llm_ops.dedup_clusters(exact)
    comp_mismatch = (
        b_cl.join(e_cl.withColumnRenamed("cluster_id", "e_cid"), "id")
        .filter(F.col("cluster_id") != F.col("e_cid"))
        .count()
    ) + abs(b_cl.count() - e_cl.count())

    out = {
        "probe": "minhash_bounded_r12",
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "cluster_size": cluster_size,
        "exact_pairs": n_exact,
        "exact_sec": t_exact,
        "bounded_pairs": n_bounded,
        "bounded_sec": t_bounded,
        "bound_per_doc": 16,  # bands(8) * neighbors_per_doc(2)
        "bounded_within_bound": n_bounded <= 16 * n_docs,
        "subset_violations": subset_violations,
        "component_mismatches": comp_mismatch,
        "pair_reduction": round(n_exact / max(n_bounded, 1), 1),
    }
    with open("MINHASH_BOUNDED_PROBE_r13.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
