"""Streaming monitor ops: watermarked tumbling-window counts and the
applyInPandasWithState cross-batch first-seen dedup."""

import datetime as dt
import time

import pytest

from pyspark.sql import functions as F

from whoosh_spark.streaming.monitor import first_seen, windowed_turn_counts


def test_windowed_counts_batch_hand_case(spark):
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        ("user", base + dt.timedelta(hours=1)),
        ("user", base + dt.timedelta(hours=5, minutes=59)),
        ("assistant", base + dt.timedelta(hours=6)),       # next 6h bucket
        ("user", base + dt.timedelta(hours=23, minutes=59)),
    ]
    turns = spark.createDataFrame(rows, "role string, ts timestamp")
    out = {(r.win_start, r.role): (r.win_end, r.n_turns)
           for r in windowed_turn_counts(turns, "6 hours").collect()}
    assert out[(base, "user")] == (base + dt.timedelta(hours=6), 2)
    assert out[(base + dt.timedelta(hours=6), "assistant")][1] == 1
    assert out[(base + dt.timedelta(hours=18), "user")][1] == 1
    assert len(out) == 3


def test_windowed_counts_streaming_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    turns = spark.range(200).select(
        F.when(F.col("id") % 3 == 0, "assistant").otherwise("user").alias("role"),
        (F.lit(dt.datetime(2024, 3, 1)) + F.make_interval(mins=F.col("id") * 37)
         ).alias("ts"),
    )
    turns.write.parquet(src)
    stream = spark.readStream.schema("role string, ts timestamp").parquet(src)
    q = (windowed_turn_counts(stream, "6 hours", watermark="30 minutes")
         .writeStream.format("memory").queryName("wincounts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("wincounts").collect()))
    want = sorted(map(tuple, windowed_turn_counts(turns, "6 hours").collect()))
    assert got == want and len(got) > 4


def test_first_seen_batch_mode(spark):
    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "bbb")],
        "doc_id long, text string")
    out = {r.doc_id for r in first_seen(docs).collect()}
    assert out == {1, 2, 4}


def test_first_seen_stateful_across_restarts(spark, tmp_path):
    """Two availableNow runs over one checkpoint: the second run restores
    the state store, so batch-2 repeats of batch-1 content are suppressed
    even though the rows were never co-resident in memory."""
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    emitted: list = []

    def run_once():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .parquet(str(src)))
        q = (first_seen(stream)
             .writeStream.foreachBatch(
                 lambda df, bid: emitted.extend(r.doc_id for r in df.collect()))
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string")
    b1.coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    assert set(emitted) == {1, 2}

    time.sleep(1.1)  # distinct file mtime for the source log
    b2 = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "beta"), (13, "delta")],
        "doc_id long, text string")
    b2.coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    # alpha/beta recur with NEW ids -> suppressed by the RESTORED state
    assert set(emitted) == {1, 2, 11, 13}


def test_session_window_hand_case(spark):
    from whoosh_spark.streaming.monitor import session_window_stats

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        ("a", base),                                  # s1
        ("a", base + dt.timedelta(minutes=29)),       # merges (< 30m gap)
        ("a", base + dt.timedelta(minutes=59)),       # exactly 30m: still merges
        ("a", base + dt.timedelta(minutes=95)),       # 36m silence: NEW session
        ("b", base),                                  # separate key
    ]
    turns = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    out = sorted(
        (r.conv_id, r.sess_start, r.sess_end, r.n_turns)
        for r in session_window_stats(turns, "30 minutes").collect()
    )
    m = dt.timedelta(minutes=1)
    assert out == [
        ("a", base, base + 89 * m, 3),               # end = last event + gap
        ("a", base + 95 * m, base + 125 * m, 1),
        ("b", base, base + 30 * m, 1),
    ]


def test_session_window_streaming_equals_batch(spark, tmp_path):
    from whoosh_spark.streaming.monitor import session_window_stats

    src = str(tmp_path / "swsrc")
    turns = spark.range(300).select(
        F.concat(F.lit("c"), (F.col("id") % 7).cast("string")).alias("conv_id"),
        (F.lit(dt.datetime(2024, 3, 1))
         + F.make_interval(mins=F.pmod(F.xxhash64("id"), F.lit(50)) * F.col("id"))
         ).alias("ts"),
    )
    turns.write.parquet(src)
    stream = spark.readStream.schema("conv_id string, ts timestamp").parquet(src)
    q = (session_window_stats(stream, "45 minutes", watermark="1 minute")
         .writeStream.format("memory").queryName("swstats")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("swstats").collect()))
    want = sorted(map(tuple, session_window_stats(turns, "45 minutes").collect()))
    assert got == want and len(got) > 10
