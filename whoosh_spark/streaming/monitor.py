"""Streaming-native corpus operators: watermarked tumbling-window ingest
stats and cross-batch stateful exact dedup.

The reference has no streaming surface at all (SURVEY §2: nearest analog
is BufferedWriter's periodic commits, covered by
``streaming.incremental``); these are the Spark-first extensions a live
transcript firehose needs in front of the indexer — Structured Streaming
``readStream -> transform -> writeStream`` with watermarks for late
turns, and ``applyInPandasWithState`` for the one curation op that is
irreducibly stateful across micro-batches (first-seen dedup).

Both operators run IDENTICALLY on batch frames: ``windowed_turn_counts``
builds the same tumbling-window plan either way (watermark only attaches
to a streaming frame), which is how the driver's DuckDB oracle pins the
window arithmetic (`time_bucket` aligns with Spark's epoch-aligned
windows for durations that divide 24 h); ``first_seen`` degrades to a
plain min-per-key in batch mode.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_counts(turns: DataFrame, window_dur: str = "6 hours",
                         by: str = "role", ts_col: str = "ts",
                         watermark: str | None = "10 minutes") -> DataFrame:
    """Tumbling-window counts per ``by`` group: (win_start, win_end, <by>,
    n_turns) — the ingest-rate panel over a transcript stream.

    On a streaming frame the watermark bounds state: windows older than
    (max event time - watermark) finalize and evict, so state is
    O(groups x windows-in-flight), independent of stream length. On a
    batch frame the exact same expression tree runs without watermark —
    one shuffle, map-side partial counts. Spark's tumbling windows are
    epoch-aligned, so for durations dividing 24 h the buckets equal
    DuckDB's ``time_bucket`` — the driver entry pins that equivalence.
    """
    df = turns
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_dur).alias("_w"), F.col(by))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("_w.start").alias("win_start"),
            F.col("_w.end").alias("win_end"),
            by,
            "n_turns",
        )
    )


def session_window_stats(turns: DataFrame, gap: str = "30 minutes",
                         key: str = "conv_id", ts_col: str = "ts",
                         watermark: str | None = "10 minutes") -> DataFrame:
    """Event-time session windows per ``key`` via Spark's NATIVE
    ``session_window``: (<key>, sess_start, sess_end, n_turns) — the
    streaming twin of ``conversations.sessionize`` (which orders by
    turn_idx and labels turns; this one orders by event time and emits
    closed sessions, the shape a live-traffic dashboard consumes).

    Semantics (pinned in tests): each event extends its session to
    ``event + gap``; consecutive events merge iff their distance is
    <= ``gap`` (a new session needs a STRICTLY larger silence — the same
    convention as ``conversations.sessionize``), and
    ``sess_end = last event + gap``. On a
    streaming frame the watermark finalizes a session once event time
    passes its end, bounding state to open sessions per key; on a batch
    frame the identical expression tree runs as one shuffle + merge.
    """
    df = turns
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("_sw"), F.col(key))
        .agg(F.count("*").alias("n_turns"))
        .select(
            key,
            F.col("_sw.start").alias("sess_start"),
            F.col("_sw.end").alias("sess_end"),
            "n_turns",
        )
    )


FIRST_SEEN_SCHEMA = "h string, doc_id long"
_STATE_SCHEMA = "seen byte"


def _first_seen_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: Any) -> Iterator[pd.DataFrame]:
    """Per content-hash group: emit the minimum-doc_id row the FIRST time
    the hash is ever seen; afterwards the state marker suppresses every
    recurrence in every later micro-batch."""
    if state.exists:
        return
    best: int | None = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
    if best is None:
        return
    state.update((1,))
    yield pd.DataFrame({"h": [key[0]], "doc_id": [best]})


def first_seen(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Cross-batch exact dedup for a stream: (h, doc_id) of the first doc
    carrying each content hash; recurrences in the same OR any later
    micro-batch are dropped.

    Streaming frame: ``applyInPandasWithState`` keyed by md5(text) — the
    state store holds one marker byte per distinct hash (the md5 key
    itself is the state row key), checkpointed with the query, so a
    restart resumes with the full seen-set. State grows with DISTINCT
    content only, and partitions by hash across executors.

    Batch frame: same contract via a plain min-per-key groupBy (no state
    needed when all data is visible at once) — lets the identical call
    site run in backfill and live modes.
    """
    keyed = docs.select(
        F.md5(F.col(text_col)).alias("h"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    if not docs.isStreaming:
        return keyed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    return keyed.groupBy("h").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
