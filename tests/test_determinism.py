"""Partition-count invariance: results must be IDENTICAL under different
shuffle parallelism — the property that makes re-executions, retries,
and backfills exactly-once-equivalent at cluster scale. Catches
order-dependent float accumulation and nondeterministic tie-breaks
(the r4 sf1.0 sweep found exactly such a bug in agg_stddev_variance)."""

import pytest

from impala_spark.queries import SPARK_QUERIES, _PLAN_CACHE

QUERIES = [
    "pricing_summary",          # decimal aggregation
    "agg_stddev_variance",      # float agg (9-sig-digit contract)
    "tpch_q3_shipping_priority",  # join + topn tie-break
    "llm_dedup_exact",          # hash shuffle
    "llm_minhash_lsh",          # multi-stage LSH pipeline
    "analytic_ranking",         # window functions
    "events_retention",         # self-join
    "llm_semantic_dedup",       # cluster join + pairwise cosine verdicts
    "llm_dsir_weights",         # broadcast distributions + float log-ratio
    "llm_cluster_topics",       # windowed top-k with total-order tie-break
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_partitioning(spark, sf_dir, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for parts in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            _PLAN_CACHE.clear()  # force a fresh plan under the new setting
            df = SPARK_QUERIES[name](spark, sf_dir)
            results.append(sorted(map(tuple, df.collect())))
        assert results[0] == results[1], f"{name} varies with partition count"
        assert len(results[0]) > 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        _PLAN_CACHE.clear()
