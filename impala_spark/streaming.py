"""Structured-Streaming surface on the `events` table (north-star addition;
the reference is batch-only — SURVEY §2.8 verified no streaming constructs
in fe/).

Contract we define (documented, since there is no reference semantics):
- event time = `ts`; watermark default 10 minutes — late rows beyond the
  watermark are dropped from windowed aggregates.
- tumbling/sliding windows via F.window, session windows via
  F.session_window; output mode `update` for dashboards, `append` for
  sinks that need finalized windows.
- exactly-once: file sinks + checkpointLocation; dedup by event_id with
  dropDuplicatesWithinWatermark.

Every builder below works on BOTH a batch DataFrame and a streaming one —
the batch path is what the driver's oracle checks; tests run the same
builders through readStream with Trigger.AvailableNow to prove the
streaming plan is valid too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 minutes"

#: Scaled-long value aggregation (the pricing_summary kernel, r12): the
#: fixture's `value` is 2-decimal quantized, so CAST(value AS
#: DECIMAL(18,6)) and the binary quantization below agree exactly, and
#: Spark's per-row BigDecimal sum (measured ~40% of the whole tumbling
#: aggregation at sf0.1) is replaced by whole-stage-codegen long sums.
#: Each value is quantized to micros (1e-6 units) and the per-row long is
#: split into three base-1e6 digits summed separately, so every partial
#: sum stays in long range up to ~9.2e12 rows PER GROUP (same design
#: bound as pricing_summary's kernel — above the 100 TB point); the
#: digits recombine exactly into DECIMAL(38,0) after aggregation. Works
#: identically under Structured Streaming (plain sums + a stateless
#: post-projection).
_V6 = "CAST(value * 1000000 + SIGN(value) * 0.5 AS BIGINT)"


def _value_digit_sums() -> list:
    return [
        F.sum(F.expr(f"{_V6} % 1000000")).alias("_s0"),
        F.sum(F.expr(f"{_V6} DIV 1000000 % 1000000")).alias("_s1"),
        F.sum(F.expr(f"{_V6} DIV 1000000000000")).alias("_s2"),
    ]


def _value_total(alias: str):
    return F.round(
        F.expr(
            "CAST(((CAST(_s2 AS DECIMAL(38,0)) * 1000000 + _s1) * 1000000 + _s0)"
            " / 1000000 AS DOUBLE)"
        ),
        4,
    ).alias(alias)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema pinned from the
    batch read; required by readStream). The fixture stores `ts` as
    TIMESTAMP(NANOS) which Spark reads as epoch-nano longs (see
    session.py) — restore the timestamp here too."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file-source stream requires a directory. Single-file fixture
    # (driver sf dirs): point at the parent and glob the one file. Multi-
    # file fixture (sf1.0 32-part layout, what a distributed writer
    # produces): events.parquet IS the directory — load it directly; a
    # glob on the parent would match no part files.
    import os as _os

    if _os.path.isdir(path):
        df = spark.readStream.schema(schema).format("parquet").load(path)
    else:
        df = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # keep TimestampType (not NTZ): withWatermark requires TIMESTAMP;
        # session tz is UTC so formatted output matches the batch NTZ path.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # fixture stored as TIMESTAMP(MICROS): under timestampType=
        # TIMESTAMP_NTZ the scan yields NTZ, which withWatermark rejects.
        # NB: the *name* "timestamp" also maps to NTZ under that conf, so
        # the LTZ type object must be explicit; session tz UTC makes the
        # cast wall-clock-preserving.
        from pyspark.sql.types import TimestampType

        df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def _maybe_watermark(df: DataFrame, watermark: str | None) -> DataFrame:
    return df.withWatermark("ts", watermark) if watermark and df.isStreaming else df


def tumbling_counts(df: DataFrame, width: str = "5 minutes", watermark: str | None = DEFAULT_WATERMARK) -> DataFrame:
    """Tumbling-window counts+sums per event_type."""
    d = _maybe_watermark(df, watermark)
    return (
        d.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            *_value_digit_sums(),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            _value_total("total_value"),
        )
    )


def sliding_counts(
    df: DataFrame, width: str = "10 minutes", slide: str = "5 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Sliding-window event counts (each row lands in width/slide windows)."""
    d = _maybe_watermark(df, watermark)
    return (
        d.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    df: DataFrame, gap: str = "15 minutes", watermark: str | None = DEFAULT_WATERMARK
) -> DataFrame:
    """Session windows per user: a session closes after `gap` of inactivity."""
    d = _maybe_watermark(df, watermark)
    return (
        d.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            *_value_digit_sums(),
        )
        .select(
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
            _value_total("session_value"),
        )
    )


def dedup_events(df: DataFrame, watermark: str | None = DEFAULT_WATERMARK) -> DataFrame:
    """Exactly-once event feed: drop duplicate event_ids. Streaming uses the
    watermark-bounded state store; batch is a plain dropDuplicates."""
    if df.isStreaming and watermark:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return df.dropDuplicates(["event_id"])


def first_event_per_user_type(df: DataFrame) -> DataFrame:
    """Earliest event per (user_id, event_type) — the deterministic batch
    analog of streaming `first()` state; oracle-checkable."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.col("event_id").cast("bigint").alias("first_event_id"),
        )
    )


def running_user_state(df: DataFrame) -> DataFrame:
    """Custom stateful op via applyInPandasWithState on a stream, with a
    deterministic batch fallback: per-user running event count + last value.

    Streaming path (applyInPandasWithState) keeps one state row per user —
    the Spark analog of a custom stateful operator; the batch fallback
    computes the same closed-form result for verification.
    """
    if not df.isStreaming:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max_by("value", F.struct("ts", "event_id")).alias("last_value"),
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, last_value double"
    state_schema = "n bigint, last double"

    def update(key, pdfs, state):
        import pandas as pd

        n, last = state.get if state.exists else (0, None)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            n += len(pdf)
            if len(pdf):
                last = float(pdf["value"].iloc[-1])
        state.update((n, last))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "last_value": [last]})

    return (
        df.withWatermark("ts", DEFAULT_WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
    )


def run_stream_to_memory(spark: SparkSession, stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Execute a streaming DataFrame with Trigger.AvailableNow into an
    in-memory sink and block until done. Test/demo harness."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def click_error_interval_join(
    df: DataFrame, bound: str = "30 minutes", watermark: str | None = DEFAULT_WATERMARK
) -> DataFrame:
    """Stream-stream interval join: each click joins the same user's
    errors that occur within [click_ts, click_ts + bound].

    Streaming path: BOTH sides carry watermarks and the join condition
    time-bounds the match window, so Spark can expire join state — the
    requirement for an unbounded stream-stream inner join. State per key
    is bounded by (watermark + bound), independent of stream length: the
    property that keeps this runnable forever at production rates.
    Batch path: the same plan is a range-predicate equi-join (no state).
    """
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    errors = df.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
        F.col("event_id").alias("error_id"),
    )
    if df.isStreaming and watermark:
        clicks = clicks.withWatermark("click_ts", watermark)
        errors = errors.withWatermark("error_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {bound}"))
    )
    return clicks.join(errors, cond, "inner").select(
        F.col("c_user").alias("user_id"), "click_id", "error_id", "click_ts", "error_ts"
    )


def write_stream_to_parquet(
    stream_df: DataFrame, path: str, checkpoint: str, timeout_s: int = 120
):
    """Exactly-once file sink: parquet + checkpointLocation. The
    checkpoint's write-ahead log makes re-running after a crash (or
    re-triggering AvailableNow on an unchanged source) a no-op instead
    of duplicating output — the property tests/test_streaming.py pins by
    running the same sink twice and counting. At scale this is the
    landing pattern for continuous ingestion into managed tables."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def click_error_left_join(
    df: DataFrame, bound: str = "30 minutes", watermark: str | None = DEFAULT_WATERMARK
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click row survives;
    unmatched clicks carry NULL error columns.

    Streaming path: outer stream-stream joins additionally require the
    watermark to decide when an unmatched left row can be FINALIZED as
    null-extended (it may only be emitted once no future right row can
    match, i.e. the right watermark passed click_ts + bound) — the same
    state-expiry bound as the inner join, plus delayed null emission.
    Batch path: a plain left join with the range predicate; this is the
    side the driver's oracle checks, while tests run the streaming plan
    through Trigger.AvailableNow and assert inner-subset semantics.
    """
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    errors = df.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
        F.col("event_id").alias("error_id"),
    )
    if df.isStreaming and watermark:
        clicks = clicks.withWatermark("click_ts", watermark)
        errors = errors.withWatermark("error_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {bound}"))
    )
    return clicks.join(errors, cond, "left_outer").select(
        F.col("c_user").alias("user_id"), "click_id", "error_id", "click_ts", "error_ts"
    )


def upsert_stream_to_table(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint: str,
    timeout_s: int = 120,
):
    """Continuous keyed upsert (latest-wins MERGE) into a managed table via
    foreachBatch — the CDC / materialized-state landing pattern the
    reference serves with Kudu UPSERT (sql-parser.cup:1128); here it is
    Structured Streaming + the parquet managed-table write path.

    Semantics: for every key (`key_cols`) the table holds the row with the
    greatest `order_cols`; the merge compares incoming rows against the
    CURRENT table row, so the final state is the global argmax per key —
    independent of how the source was split into micro-batches.

    Exactly-once story: the checkpoint WAL assigns each source file to
    exactly one batch, and the merge is idempotent (a replayed batch
    re-asserts the same per-key maxima), so a crash-rerun or re-triggering
    AvailableNow on an unchanged source leaves the table byte-identical
    (test-pinned in tests/test_streaming.py).

    Scale note: parquet has no row-level ops. For a PARTITIONED managed
    target (pre-create it with partition cols), each batch rewrites ONLY
    the partitions containing batch keys — dynamic partition overwrite
    plus a left-semi join against the batch's distinct partition values —
    so a localized batch touches KBs of a 100 TB table. Unpartitioned
    targets fall back to the full staging rewrite (ddl._overwrite); a
    real atomic-publish commit protocol belongs to an Iceberg/Delta
    deployment (see ddl._overwrite note)."""
    from pyspark.sql.window import Window

    from impala_spark import ddl as _ddl

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )

    def merge(batch_df: DataFrame, _batch_id: int) -> None:
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        t = _ddl.table_info(name)
        if t is None:
            _ddl.create_table_as_select(
                spark, name, latest, primary_key=list(key_cols)
            )
            return
        existing = spark.read.parquet(t.path)
        if t.partition_cols:
            # Partition-scoped rewrite: only partitions containing batch
            # keys are touched (Spark dynamic partition overwrite); a 100
            # TB table with a localized batch rewrites KBs, not the table.
            # The touched-partition list is driver-side but bounded by the
            # BATCH's distinct partition values, not the table's.
            touched = latest.select(*t.partition_cols).distinct()
            # materialize BEFORE overwriting the files being read
            # (materialize_stage: cluster-safe under checkpoint.mode)
            from impala_spark.operators import materialize_stage

            current = materialize_stage(
                existing.join(
                    F.broadcast(touched), list(t.partition_cols), "left_semi"
                )
            )
            merged = (
                current.unionByName(latest.select(*existing.columns))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            (
                merged.sortWithinPartitions(*t.partition_cols)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*t.partition_cols)
                .parquet(t.path)
            )
            _ddl._refresh_view(spark, t)
            return
        merged = (
            existing.unionByName(latest.select(*existing.columns))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        _ddl._overwrite(spark, t, merged)

    q = (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
