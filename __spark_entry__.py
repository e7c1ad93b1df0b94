"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The engine lives in impala_spark/ (see SURVEY.md §7); this module is a
thin adapter over impala_spark.queries' registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from impala_spark.queries import ORACLE_SQL, SPARK_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return SPARK_QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def _verified_order(names: list[str]) -> list[str]:
    """Order queries so never-yet-verified ones come first.

    The driver's correctness gate checks a bounded prefix of this dict
    (50 entries in rounds 1-2). Entries that already have a full pass
    (rows+schema+hash) in any CORRECTNESS_r*.json move to the back, so
    each round's window reaches queries that still need a driver
    verdict; regressions in the long-green head remain covered by the
    pytest suite. Registration order breaks ties, so the rotation is
    deterministic.
    """
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    passed: set[str] = set()
    #: round index of each query's MOST RECENT full pass — verified
    #: entries re-enter the window stalest-first, so once the unverified
    #: backlog is below the window size the spare slots automatically
    #: re-confirm the oldest greens (the r4 verdict's sentinel rotation,
    #: generalized to a full least-recently-verified cycle)
    last_green: dict[str, int] = {}
    for rnd, path in enumerate(
        sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    ):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                passed.add(name)
                last_green[name] = rnd
    # Round-5 priorities (r4 verdict task #1): the registry is FROZEN at
    # 215 queries; the 50-slot window takes 50 of the 67 never-driver-
    # checked entries, ordered per the verdict: the 8-op curation family,
    # all 17 unchecked TPC-DS shapes, the 7 events additions, the 14
    # boost-tail rows (incl. scan_partition_keys_metadata_only — verdict
    # task #6), and 4 more high-value r4 additions. The 17 deferred
    # entries are single-op LLM text filters (llm_bm25_scoring,
    # llm_decontaminate, llm_perplexity_filter, llm_chunk_documents,
    # llm_repetition_ratio, llm_stratified_sample, llm_incremental_dedup,
    # llm_corpus_report, llm_pii_redaction, llm_substring_dedup,
    # llm_ngram_novelty, llm_embedding_dim_stats, llm_length_filter,
    # llm_source_overlap, llm_top_terms, llm_frame_sampling,
    # meta_skew_report) — ALL 215 registered queries were locally
    # oracle-verified in ONE session at sf0.01 at round-5 close
    # (tools/check.py: 215 ok, 0 FAILED), and 16 of the 17 also at the 10x 32-file
    # scale (llm_incremental_dedup excluded there: its shared-shingle
    # candidate oracle is pair-quadratic in the corpus — the documented
    # 10x-exclusion class); they queue for round 6, after which the
    # backlog (17) is far below the window and 5 sentinel re-checks per
    # family rotate in (verdict task #7 — deferred this round because 67
    # unverified > 50 slots; sentinels would have pushed the backlog past
    # the verdict's <=19 target).
    boost = [
        # LLM curation family (verdict priority #1)
        "llm_semantic_dedup", "llm_dsir_weights", "llm_curation_pipeline",
        "llm_gopher_filter", "llm_block_dedup", "llm_token_budget",
        "llm_ann_index_persisted", "llm_cluster_topics",
        # all 17 never-checked TPC-DS shapes (suite of 22 complete)
        "tpcds_q1_shape", "tpcds_q6_shape", "tpcds_q7_shape",
        "tpcds_q15_shape", "tpcds_q19_shape", "tpcds_q23_shape",
        "tpcds_q33_shape", "tpcds_q45_shape", "tpcds_q51_shape",
        "tpcds_q55_shape", "tpcds_q59_shape", "tpcds_q65_shape",
        "tpcds_q68_shape", "tpcds_q79_shape", "tpcds_q88_shape",
        "tpcds_q96_shape", "tpcds_q98_shape",
        # events analytics additions (streaming surface, SURVEY §2 row 63)
        "events_streaming_upsert", "events_stream_outer_join",
        "events_gap_fill", "events_retention", "events_funnel",
        "events_anomaly", "events_two_level_rollup",
        # r4 boost-tail (scalar builtin families, DDL/meta surfaces,
        # the metadata-only scan — P/SingleNodePlanner.java:603-606)
        "expr_math_funcs", "expr_conditional", "expr_misc_builtins",
        "expr_bit_xor_not_factorial", "agg_ndv_incremental",
        "ddl_insert_append", "ddl_create_view_database",
        "ddl_create_table_like", "ddl_alter_table", "ddl_sql_lifecycle",
        "meta_show_partitions_files", "meta_show_stats",
        "join_implicit_comma", "scan_partition_keys_metadata_only",
        # remaining high-value r4 additions
        "ddl_create_table_cols", "ddl_view_lifecycle",
        "agg_exact_percentiles", "expr_json_url_funcs",
        # --- window boundary (50): the 17 LLM text filters above queue
        # for round 6 in registration order ---
    ]
    rank = {n: i for i, n in enumerate(boost)}
    unverified = [n for n in names if n not in passed]
    unverified.sort(key=lambda n: (rank.get(n, len(rank)),))  # stable
    verified = [n for n in names if n in passed]
    verified.sort(key=lambda n: last_green.get(n, 0))  # stalest first
    return unverified + verified


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    order = _verified_order(list(SPARK_QUERIES))
    return {n: SPARK_QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (keys without an entry are
    non-SQL-expressible ops checked rows-only by the driver)."""
    return dict(ORACLE_SQL)
