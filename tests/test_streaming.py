"""Structured-Streaming surface tests: every builder must run as a REAL
stream (Trigger.AvailableNow) and agree with its batch execution."""

import pytest
from pyspark.sql import functions as F

from impala_spark import streaming as stm
from impala_spark.session import table


def batch_events(spark, sf_dir):
    return table(spark, sf_dir, "events")


def test_stream_reader_is_streaming(spark, sf_dir):
    s = stm.read_events_stream(spark, sf_dir)
    assert s.isStreaming
    assert dict(s.dtypes)["ts"].startswith("timestamp")


def test_tumbling_stream_matches_batch(spark, sf_dir):
    batch = stm.tumbling_counts(batch_events(spark, sf_dir))
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch.collect()
    }
    stream = stm.tumbling_counts(stm.read_events_stream(spark, sf_dir))
    got_df = stm.run_stream_to_memory(spark, stream, "t_tumble")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value) for r in got_df.collect()
    }
    assert got == expected


def test_sliding_stream_runs(spark, sf_dir):
    stream = stm.sliding_counts(stm.read_events_stream(spark, sf_dir))
    out = stm.run_stream_to_memory(spark, stream, "t_slide")
    batch_n = stm.sliding_counts(batch_events(spark, sf_dir)).count()
    assert out.count() == batch_n


def test_session_window_stream_runs(spark, sf_dir):
    stream = stm.session_windows(stm.read_events_stream(spark, sf_dir))
    out = stm.run_stream_to_memory(spark, stream, "t_sess")
    assert out.count() > 0
    r = out.first()
    assert r.session_start <= r.session_end


def test_dedup_stream(spark, sf_dir):
    stream = stm.dedup_events(stm.read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup").count()
    expected = batch_events(spark, sf_dir).select("event_id").distinct().count()
    assert got == expected


def test_user_state_stream_matches_batch(spark, sf_dir):
    batch = stm.running_user_state(batch_events(spark, sf_dir))
    expected = {r.user_id: (r.n_events, round(r.last_value, 6)) for r in batch.collect()}
    stream = stm.running_user_state(stm.read_events_stream(spark, sf_dir))
    out = stm.run_stream_to_memory(spark, stream, "t_state", output_mode="update")
    got = {r.user_id: (r.n_events, round(r.last_value, 6)) for r in out.collect()}
    assert got == expected


def test_watermark_present_in_stream_plan(spark, sf_dir):
    s = stm.tumbling_counts(stm.read_events_stream(spark, sf_dir))
    assert "EventTimeWatermark" in s._jdf.queryExecution().logical().toString()


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    batch_pairs = stm.click_error_interval_join(batch_events(spark, sf_dir))
    expected = {(r.click_id, r.error_id) for r in batch_pairs.collect()}
    stream = stm.click_error_interval_join(stm.read_events_stream(spark, sf_dir))
    got_df = stm.run_stream_to_memory(spark, stream, "t_ssjoin", output_mode="append")
    got = {(r.click_id, r.error_id) for r in got_df.collect()}
    assert got == expected
    assert len(got) > 0


def test_file_sink_exactly_once_on_rerun(spark, sf_dir, tmp_path):
    """Re-triggering the same sink over an unchanged source must be a
    no-op (checkpoint WAL), not an append of duplicates."""
    out = str(tmp_path / "events_out")
    ckpt = str(tmp_path / "ckpt")
    s1 = stm.dedup_events(stm.read_events_stream(spark, sf_dir))
    stm.write_stream_to_parquet(s1, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == stm.dedup_events(batch_events(spark, sf_dir)).count()
    # second run, same checkpoint, unchanged source -> no new rows
    s2 = stm.dedup_events(stm.read_events_stream(spark, sf_dir))
    stm.write_stream_to_parquet(s2, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1


def test_stream_stream_left_outer_join(spark, sf_dir):
    """LEFT OUTER stream-stream interval join: the matched subset must
    equal the inner join exactly; unmatched clicks appear null-extended.
    (With AvailableNow the final watermark finalizes all state, so the
    streamed result matches the batch left join in full.)"""
    batch = stm.click_error_left_join(batch_events(spark, sf_dir))
    expected_matched = {
        (r.click_id, r.error_id) for r in batch.collect() if r.error_id is not None
    }
    expected_total = batch.count()
    assert expected_total > len(expected_matched) > 0  # both kinds present

    stream = stm.click_error_left_join(stm.read_events_stream(spark, sf_dir))
    got_df = stm.run_stream_to_memory(spark, stream, "t_ssljoin", output_mode="append")
    got = got_df.collect()
    got_matched = {(r.click_id, r.error_id) for r in got if r.error_id is not None}
    assert got_matched == expected_matched
    # every batch row is eventually emitted; null finalization may lag the
    # last watermark update, so streamed rows are a superset of matched
    # and a subset of the batch total
    assert len(got_matched) <= len(got) <= expected_total


def test_gap_fill_densifies_buckets(spark, sf_dir):
    """Gap-filled series must cover EVERY 5-min bucket in the span for
    every event_type, zero-filled where no events landed, and agree with
    the sparse aggregation where events exist."""
    from impala_spark.queries import SPARK_QUERIES

    dense = SPARK_QUERIES["events_gap_fill"](spark, sf_dir)
    rows = dense.collect()
    types = {r.event_type for r in rows}
    buckets = sorted({r.window_start for r in rows})
    assert len(rows) == len(types) * len(buckets)  # full cross coverage
    assert any(r.n_events == 0 for r in rows) or len(buckets) == 1  # zero-fill visible
    total_dense = sum(r.n_events for r in rows)
    from impala_spark.session import table as tbl

    assert total_dense == tbl(spark, sf_dir, "events").count()  # conservation


def test_upsert_stream_latest_wins_and_idempotent(spark, sf_dir, tmp_path):
    """Keyed streaming upsert: final table = global argmax per key; a
    rerun over the unchanged source (same checkpoint) is a no-op."""
    from impala_spark import ddl

    name = "t_user_latest"
    ddl.drop_table(spark, name)
    ckpt = str(tmp_path / "ckpt_upsert")
    cols = ["event_id", "ts", "user_id", "value"]
    s1 = stm.read_events_stream(spark, sf_dir).select(*cols)
    stm.upsert_stream_to_table(
        spark, s1, name, ["user_id"], ["ts", "event_id"], ckpt
    )
    got = {r.user_id: (r.event_id, r.value) for r in spark.table(name).collect()}
    # batch truth: argmax (ts, event_id) per user
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    truth = {
        r.user_id: (r.event_id, r.value)
        for r in batch_events(spark, sf_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .collect()
    }
    assert got == truth and len(got) > 0
    # rerun with the same checkpoint: WAL marks the source consumed -> no-op
    s2 = stm.read_events_stream(spark, sf_dir).select(*cols)
    stm.upsert_stream_to_table(
        spark, s2, name, ["user_id"], ["ts", "event_id"], ckpt
    )
    got2 = {r.user_id: (r.event_id, r.value) for r in spark.table(name).collect()}
    assert got2 == got
    ddl.drop_table(spark, name)


def test_upsert_stream_partition_scoped_rewrite(spark, sf_dir, tmp_path):
    """Partitioned upsert target: only partitions containing batch keys
    are rewritten; rows in untouched partitions survive byte-for-byte."""
    import os

    from impala_spark import ddl

    name = "t_sharded_latest"
    ddl.drop_table(spark, name)
    # pre-create the partitioned state table with a sentinel row in a
    # shard the stream never touches (user_id = -1 -> shard 9)
    sentinel = spark.createDataFrame(
        [(-1, None, -1.0, 9)], "user_id long, ts timestamp, value double, shard int"
    )
    ddl.create_table_as_select(
        spark, name, sentinel, partition_cols=["shard"], primary_key=["user_id"]
    )
    t = ddl.table_info(name)
    sentinel_dir = os.path.join(t.path, "shard=9")
    before = sorted(os.listdir(sentinel_dir))
    ckpt = str(tmp_path / "ckpt_shard")
    s1 = (
        stm.read_events_stream(spark, sf_dir)
        .select("user_id", "ts", "value")
        .withColumn("shard", (F.col("user_id") % 4).cast("int"))
        .select("user_id", "ts", "value", "shard")
    )
    stm.upsert_stream_to_table(spark, s1, name, ["user_id"], ["ts"], ckpt)
    final = spark.table(name)
    # sentinel row in the untouched partition survives, files untouched
    assert final.filter("user_id = -1").count() == 1
    assert sorted(os.listdir(sentinel_dir)) == before
    # streamed users hold their argmax-ts value
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    truth = (
        batch_events(spark, sf_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .count()
    )
    assert final.filter("user_id >= 0").count() == truth
    ddl.drop_table(spark, name)


def test_digit_split_value_sum_matches_decimal(spark, sf_dir):
    """The scaled-long digit-split kernel in tumbling_counts/session_windows
    (r12) must reproduce the decimal(18,6) sum exactly — including negative,
    zero, and large values and multi-digit carries across the base-1e6
    split."""
    rows = [
        (1, "a", -123.45),
        (2, "a", 0.0),
        (3, "a", 99999999.99),       # exercises the 2nd/3rd digit
        (4, "a", 0.01),
        (5, "b", -0.01),
        (6, "b", 1e7),
        (7, "b", 123456.78),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double").withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    got = {
        r.event_type: r.total_value
        for r in stm.tumbling_counts(df, watermark=None).collect()
    }
    exp = {
        r.event_type: r.total_value
        for r in df.groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_value")
        )
        .collect()
    }
    assert got == exp
