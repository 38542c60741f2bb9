"""Sequence packing: lay a corpus out into fixed-capacity training context
windows (the concat-and-chunk shape every LLM pre-training pipeline runs
between curation and tokenization).

Docs are ordered by a deterministic md5 shuffle key (same contract as
``pipeline.sampling`` — reproducible under any partitioning or cluster
size), token counts are prefix-summed GLOBALLY, and each doc's window
assignment is pure arithmetic on its global begin offset:
``seq_id = floor(begin_offset / capacity)``.  A doc longer than the
remaining room straddles into the next window(s) — concat-and-chunk
semantics, where the tokenizer later splits at exact window boundaries —
so ``end_seq_id`` reports the last window the doc touches.

Scale shape: a naive ``Window.orderBy(key)`` global cumsum collapses the
corpus onto ONE partition.  This implementation is the classic two-phase
distributed prefix sum instead: range-partition by the shuffle key, local
cumsum per partition (window PARTITIONED by pid — embarrassingly
parallel), plus a per-partition totals frame (one row per partition,
bounded by the partition count, not the corpus) whose own tiny cumsum is
broadcast-joined back as each partition's base offset.  The only
single-partition window in the plan runs over those P total rows.
``localCheckpoint`` pins the range-partitioned layout so the two phases
see identical partition ids; the RESULT is independent of where the
range boundaries fall, because (partition offset + local offset) is the
exact global prefix sum in key order either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, capacity: int,
                   token_col: str = "n_tokens", id_col: str = "doc_id",
                   salt: str = "pack", partitions: int | None = None,
                   eager: bool = True) -> DataFrame:
    """Assign every doc its packed position: (doc_id, n_tokens,
    begin_offset, seq_id, seq_offset, end_seq_id).

    ``begin_offset`` = total tokens of all docs before it in md5 order;
    ``seq_id`` = begin_offset // capacity; ``seq_offset`` = begin_offset %
    capacity; ``end_seq_id`` = the last window the doc occupies (equals
    seq_id unless the doc straddles a boundary; zero-token docs stay in
    their begin window).  Deterministic for a given (corpus, capacity,
    salt) regardless of partitioning.

    ``docs`` must carry ``token_col`` (compose with
    :func:`whoosh_spark.pipeline.textstats.token_counts`).  ``eager=False``
    skips the localCheckpoint for single-action pipelines where recompute
    is acceptable.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    spark = docs.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism
    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    base = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(token_col).cast("long").alias("n_tokens"),
            key.alias("_k"),
        )
        .repartitionByRange(n_part, "_k", "doc_id")
        .sortWithinPartitions("_k", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    if eager:
        base = base.localCheckpoint()  # pin pid assignment across the 2 phases
    totals = base.groupBy("_pid").agg(F.sum("n_tokens").alias("_tot"))
    w_tot = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_tot), F.lit(0)).alias("_poff")
    )
    w_loc = (Window.partitionBy("_pid").orderBy("_k", "doc_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    begin = F.col("_poff") + F.coalesce(F.sum("n_tokens").over(w_loc), F.lit(0))
    out = (
        base.join(F.broadcast(offs), "_pid")
        .withColumn("begin_offset", begin.cast("long"))
        .select(
            "doc_id",
            "n_tokens",
            "begin_offset",
            F.floor(F.col("begin_offset") / capacity).cast("long").alias("seq_id"),
            (F.col("begin_offset") % capacity).cast("long").alias("seq_offset"),
            F.floor(
                (F.col("begin_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                / capacity
            ).cast("long").alias("end_seq_id"),
        )
    )
    return out


PACK_BINS_SCHEMA = ("doc_id long, n_tokens long, shard int, bin_id long, "
                    "bin_fill long")


def pack_bins_ffd(docs: DataFrame, capacity: int,
                  token_col: str = "n_tokens", id_col: str = "doc_id",
                  salt: str = "ffd", num_shards: int | None = None) -> DataFrame:
    """Boundary-preserving sequence packing: first-fit-decreasing bin
    packing, docs NEVER split across windows (the SFT-style packing that
    keeps every example intact and masks cross-example attention, vs
    :func:`pack_sequences`' concat-and-chunk which splits at exact
    boundaries). Returns (doc_id, n_tokens, shard, bin_id, bin_fill)
    with globally-unique ``bin_id`` and ``bin_fill`` = the bin's total
    tokens (<= capacity always; docs longer than capacity get a
    singleton overflow bin, flagged by bin_fill > capacity — filter or
    truncate upstream).

    Scale shape: docs hash-shard by md5 (deterministic, any
    parallelism), each shard packs INDEPENDENTLY with an in-memory FFD
    over its own docs (descending tokens, md5 tiebreak) inside one
    ``applyInPandas`` group — bins never cross shards, so the algorithm
    parallelizes perfectly and a 100 TB corpus just raises
    ``num_shards``. FFD within a shard wastes at most ~11/9 of optimal
    (Johnson's bound); cross-shard waste is one partial bin per shard,
    amortized away by shard sizes in the thousands of docs.

    Greedy bin assignment is an inherently sequential recurrence, so
    this op has NO DuckDB oracle — its invariants (every doc exactly
    once, no bin over capacity, determinism across partitioning,
    fill-efficiency floor) are pinned in tests/test_pipeline.py instead.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    import numpy as np
    import pandas as pd

    spark = docs.sparkSession
    shards = num_shards or spark.sparkContext.defaultParallelism * 4

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "_k"],
                              ascending=[False, True], kind="mergesort")
        toks = pdf["n_tokens"].to_numpy()
        fills: list[int] = []          # current fill per open bin
        assign = np.empty(len(pdf), dtype=np.int64)
        for i, t in enumerate(toks):
            # first-fit over open bins; linear scan is fine because bins
            # per shard are bounded (shard_tokens / capacity)
            for b, f in enumerate(fills):
                if f + t <= capacity:
                    fills[b] = f + t
                    assign[i] = b
                    break
            else:
                assign[i] = len(fills)
                fills.append(int(t))
        shard = int(pdf["_shard"].iloc[0])
        fill_arr = np.asarray(fills, dtype=np.int64)
        return pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(),
            "n_tokens": toks,
            "shard": shard,
            # globally unique: shard-local index striped by shard count
            "bin_id": assign * shards + shard,
            "bin_fill": fill_arr[assign],
        })

    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        key.alias("_k"),
    ).withColumn(
        "_shard",
        F.pmod(F.conv(F.substring("_k", 1, 8), 16, 10).cast("long"),
               F.lit(shards)).cast("int"),
    )
    return base.groupBy("_shard").applyInPandas(_pack, PACK_BINS_SCHEMA)
