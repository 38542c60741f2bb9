"""Conversation-level curation over the north-rule transcript table
(conv_id, turn_idx, role, text, tool, ts): the operators that work on
whole conversations rather than turns — stats/quality, assembly back
into one document, and context-budget truncation.

Everything here is per-conversation arithmetic: one groupBy(conv_id)
(map-side combined) or one conv-keyed window, so the shuffle key is the
conversation id — the natural partitioning of a transcript corpus, and
the one its Iceberg layout would already bucket by. No Python in any
plan; every op has an exact DuckDB mirror in the driver registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9]+"


def conversation_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation shape/quality features: (conv_id, n_turns,
    n_user, n_assistant, n_tool_calls, total_chars, total_words,
    mean_turn_words, role_repeats, started_by_user).

    ``role_repeats`` counts adjacent same-role turn pairs (in turn_idx
    order) — the alternation-violation signal a dialogue-quality filter
    thresholds on; ``n_tool_calls`` counts turns carrying a tool.
    One window (conv-keyed, parallel) + one groupBy(conv_id).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = turns.withColumn("_prev_role", F.lag("role").over(w))
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(WORD_RE), 0))
    return (
        t.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("n_assistant"),
            F.sum(F.when(F.col("tool").isNotNull() & (F.col("tool") != ""), 1)
                  .otherwise(0)).alias("n_tool_calls"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(words).alias("total_words"),
            F.sum(F.when(F.col("_prev_role") == F.col("role"), 1).otherwise(0))
            .alias("role_repeats"),
            F.max(F.when(F.col("turn_idx") == 0, F.col("role") == "user"))
            .alias("started_by_user"),
        )
        .withColumn(
            "mean_turn_words",
            F.round(F.col("total_words") / F.col("n_turns"), 4),
        )
    )


def assemble_conversations(turns: DataFrame, sep: str = "\n",
                           with_roles: bool = True) -> DataFrame:
    """Rebuild one document per conversation: (conv_id, n_turns, text) —
    turns concatenated in turn_idx order, each line ``role: text`` when
    ``with_roles`` (the rendering a conversation-granularity dedup or an
    export-to-training-file step consumes).

    collect_list carries (turn_idx, line) structs; array_sort makes the
    order deterministic regardless of shuffle arrival order — the
    standard Spark idiom for ordered reassembly (collect_list alone has
    no order guarantee).
    """
    line = (F.concat(F.col("role"), F.lit(": "), F.col("text"))
            if with_roles else F.col("text"))
    return (
        turns.select("conv_id", F.struct(F.col("turn_idx"), line.alias("line")).alias("_s"))
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list("_s")).alias("_ss"))
        .select(
            "conv_id",
            F.size("_ss").cast("long").alias("n_turns"),
            F.array_join(F.transform("_ss", lambda s: s["line"]), sep).alias("text"),
        )
    )


def truncate_conversations(turns: DataFrame, max_words: int) -> DataFrame:
    """Context-budget trimming: keep each conversation's longest PREFIX of
    whole turns whose cumulative word count stays <= ``max_words`` (turns
    after the budget drop entirely — no mid-turn cuts). Returns the kept
    turns with (words, cum_words) attached.

    One conv-keyed window cumsum — same parallel shape as
    conversation_stats. A conversation whose FIRST turn already exceeds
    the budget keeps nothing (strict semantics; relax upstream by
    splitting oversized turns if needed).
    """
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(WORD_RE), 0))
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        turns.withColumn("words", words.cast("long"))
        .withColumn("cum_words", F.sum("words").over(w))
        .where(F.col("cum_words") <= max_words)
    )


def sliding_turn_windows(turns: DataFrame, k: int = 3,
                         sep: str = "\n") -> DataFrame:
    """RAG-style chunking: every window of ``k`` consecutive turns per
    conversation, rendered ``role: text`` lines — (conv_id, start_idx,
    end_idx, text). Windows are full (exactly k turns); conversations
    shorter than k yield nothing (index the assembled doc instead).

    One conv-keyed window with a bounded following frame (ROWS CURRENT..
    k-1 FOLLOWING) — state per row is k lines, no self-join, parallel by
    conversation.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.currentRow, k - 1))
    line = F.concat(F.col("role"), F.lit(": "), F.col("text"))
    return (
        turns.withColumn("_lines", F.collect_list(line).over(w))
        .withColumn("_last", F.max("turn_idx").over(w))
        .where(F.size("_lines") == k)
        .select(
            "conv_id",
            F.col("turn_idx").alias("start_idx"),
            F.col("_last").alias("end_idx"),
            F.array_join("_lines", sep).alias("text"),
        )
    )


def loss_mask_spans(turns: DataFrame, sep: str = "\n",
                    train_roles: tuple = ("assistant",)) -> DataFrame:
    """SFT loss masking: for each turn, the character span it occupies in
    the assembled conversation document (:func:`assemble_conversations`
    with the same ``sep``, role-prefixed lines) plus whether the span is
    trainable (role in ``train_roles`` — train on assistant turns, mask
    user/tool turns). (conv_id, turn_idx, char_start, char_end, trainable)
    with 0-based, end-exclusive offsets; separators belong to no span.

    A tokenizer-side consumer maps char spans to token spans after
    encoding; keeping the mask in characters here keeps the op
    tokenizer-agnostic and exactly reproducible.

    Plan shape: one conv-keyed window (cumsum of line lengths +
    row_number), parallel across conversations — same shape as
    truncate_conversations. Spans tile the assembled text exactly:
    char_end of the last turn equals length(text) (pinned in tests).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_len = F.coalesce(
        F.sum("_len").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    rn = F.row_number().over(w)
    start = prev_len + (rn - 1) * len(sep)
    return (
        turns.withColumn(
            "_len",
            F.length(F.concat(F.col("role"), F.lit(": "), F.col("text"))).cast("long"),
        )
        .select(
            "conv_id", "turn_idx",
            start.cast("long").alias("char_start"),
            (start + F.col("_len")).cast("long").alias("char_end"),
            F.col("role").isin(*train_roles).cast("int").alias("trainable"),
        )
    )
