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


def sessionize(turns: DataFrame, gap_seconds: int = 1800,
               ts_col: str = "ts") -> DataFrame:
    """Split each conversation into activity sessions: a new session
    starts at turn 0 and whenever the time since the previous turn
    exceeds ``gap_seconds`` (the classic inactivity-gap sessionization a
    transcript corpus needs before per-session stats / context windows).
    Returns the turns with ``gap_s`` (seconds since previous turn, NULL
    on first turns) and a 0-based ``session_idx``.

    The lag and the running sum share the conv-keyed partition/order, so
    the physical plan has exactly ONE Exchange + ONE Sort (verified:
    ``[Window, Window, Window, Sort, Exchange]``) — the window nodes
    pipeline over the same sorted partition without re-shuffling. No
    joins, parallel across conversations. Session count per
    conversation is bounded by turn count, so no skew beyond the
    corpus's own conversation-length distribution.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return turns.withColumn("gap_s", gap).withColumn(
        "session_idx", (F.sum(is_new).over(run) - 1).cast("int")
    )


def session_stats(turns: DataFrame, gap_seconds: int = 1800,
                  ts_col: str = "ts") -> DataFrame:
    """Per-session rollup over :func:`sessionize`: (conv_id, session_idx,
    n_turns, n_tool_calls, start_s, end_s, duration_s) with start/end as
    epoch seconds (engine-portable — no timestamp round-tripping).
    One window + one map-side-combined groupBy on (conv_id, session_idx).
    """
    s = sessionize(turns, gap_seconds, ts_col)
    epoch = F.col(ts_col).cast("long")
    return s.groupBy("conv_id", "session_idx").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.when(F.col("tool").isNotNull() & (F.col("tool") != ""), 1)
              .otherwise(0)).alias("n_tool_calls"),
        F.min(epoch).alias("start_s"),
        F.max(epoch).alias("end_s"),
        (F.max(epoch) - F.min(epoch)).alias("duration_s"),
    )


def response_latency(turns: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Assistant response time: for each assistant turn, seconds elapsed
    since the conversation's previous turn (the user-perceived latency an
    agent-quality dashboard tracks). Returns (conv_id, turn_idx,
    latency_s); conversation-opening turns and non-assistant turns are
    excluded. One conv-keyed window, filter after — the lag must see ALL
    turns, so the role filter cannot be pushed below the window.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    return (
        turns.withColumn("latency_s", lat)
        .where((F.col("role") == "assistant") & F.col("latency_s").isNotNull())
        .select("conv_id", "turn_idx", "latency_s")
    )


def tool_usage_stats(turns: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-tool usage rollup over tool-carrying turns: (tool, n_calls,
    n_convs, mean_words, first_s, last_s). The tool-mix report an agent
    corpus is curated by (which tools dominate, how verbose their
    outputs run, when they were active). One filter + one groupBy(tool)
    — tool cardinality is tiny, so the final agg is a handful of groups
    after map-side partial aggregation; countDistinct(conv_id) expands
    to the standard two-phase distinct agg, still one logical shuffle.
    """
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(WORD_RE), 0))
    epoch = F.col(ts_col).cast("long")
    return (
        turns.where(F.col("tool").isNotNull() & (F.col("tool") != ""))
        .groupBy("tool")
        .agg(
            F.count("*").alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.round(F.avg(words), 4).alias("mean_words"),
            F.min(epoch).alias("first_s"),
            F.max(epoch).alias("last_s"),
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


def conversation_qa(turns: DataFrame,
                    expected_first: tuple = ("user", "system")) -> DataFrame:
    """Per-conversation structural QA — the malformed-transcript gate a
    transcript corpus runs before training (consecutive same-role turns,
    empty turns, duplicated or gapped turn indexes, a conversation that
    opens mid-dialogue).

    Output per conv_id: ``n_turns``, ``n_role_repeats`` (turns whose role
    equals the previous turn's), ``n_empty`` (whitespace-only text),
    ``n_dup_idx`` (duplicate turn_idx values), ``has_idx_gap`` (index
    range not dense), ``first_role``, and ``valid`` = no repeats AND no
    empties AND no dup/gapped indexes AND first_role in
    ``expected_first``.

    Plan shape: one conv-keyed window (the lag) + one groupBy on the same
    key — Spark reuses the exchange, so the whole gate is a single
    shuffle, parallel across conversations at any corpus size.
    ``first_role`` comes from min(struct(turn_idx, role)) and the lag
    window orders by (turn_idx, role) — total orders both, so every
    output (including the repeat count on a conversation whose indexes
    ARE duplicated) is deterministic under any partitioning.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "role")
    t = turns.withColumn("_prev_role", F.lag("role").over(w))
    n_distinct_idx = F.countDistinct("turn_idx")
    agg = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.coalesce(
            F.sum((F.col("role") == F.col("_prev_role")).cast("long")),
            F.lit(0),
        ).alias("n_role_repeats"),
        F.sum((F.trim(F.col("text")) == "").cast("long")).alias("n_empty"),
        (F.count(F.lit(1)) - n_distinct_idx).alias("n_dup_idx"),
        ((F.max("turn_idx") - F.min("turn_idx") + 1) != n_distinct_idx)
        .alias("has_idx_gap"),
        F.min(F.struct("turn_idx", "role"))["role"].alias("first_role"),
    )
    return agg.withColumn(
        "valid",
        (F.col("n_role_repeats") == 0) & (F.col("n_empty") == 0)
        & (F.col("n_dup_idx") == 0) & ~F.col("has_idx_gap")
        & F.col("first_role").isin(*expected_first),
    )


def expand_context(hits: DataFrame, turns: DataFrame, k: int = 1,
                   conv_col: str = "conv_id", idx_col: str = "turn_idx",
                   id_col: str = "doc_id") -> DataFrame:
    """RAG context expansion: attach each hit turn's +-k neighbors from
    the same conversation -> (hit_doc_id, score, conv_id, ctx_doc_id,
    turn_idx, offset). The retrieval pattern transcript search serves —
    a matching turn alone rarely answers; the surrounding exchange does.

    ``hits`` is a scored (doc_id, score) frame (any ``search``/``wand``
    output); ``turns`` the stored turn table. One doc_id join to recover
    each hit's (conv, idx), then ONE conv-keyed equi-join whose
    turn-range predicate is a residual filter — the plan is a hash/SMJ
    join on conv_id, never a NestedLoop, and k bounds fan-out at 2k+1
    rows per hit. Overlapping hit windows keep one row per
    (hit, neighbor) pair so downstream assembly stays per-hit."""
    pos = turns.select(F.col(id_col).alias("hit_doc_id"),
                       F.col(conv_col).alias("_c"),
                       F.col(idx_col).alias("_i"))
    h = hits.select(F.col("doc_id").alias("hit_doc_id"), "score").join(
        pos, "hit_doc_id")
    t = turns.select(F.col(conv_col).alias("_c"),
                     F.col(id_col).alias("ctx_doc_id"),
                     F.col(idx_col).alias(idx_col))
    j = h.join(t, "_c").where(
        (F.col(idx_col) >= F.col("_i") - int(k))
        & (F.col(idx_col) <= F.col("_i") + int(k)))
    return j.select(
        "hit_doc_id", "score", F.col("_c").alias(conv_col),
        "ctx_doc_id", idx_col,
        (F.col(idx_col) - F.col("_i")).cast("int").alias("offset"))


def assemble_context(ctx: DataFrame, turns: DataFrame, sep: str = "\n",
                     conv_col: str = "conv_id", idx_col: str = "turn_idx",
                     id_col: str = "doc_id", role_col: str = "role",
                     text_col: str = "text") -> DataFrame:
    """Render :func:`expand_context` output into ONE prompt-ready string
    per hit -> (hit_doc_id, score, conv_id, n_turns, context_text):
    ``role: text`` lines in turn order joined by ``sep`` — the string a
    RAG pipeline actually feeds the model. One doc_id join to fetch the
    stored text + one hit-keyed groupBy whose sort_array runs over at
    most 2k+1 structs per hit; no window, no Python."""
    t = turns.select(F.col(id_col).alias("ctx_doc_id"),
                     F.col(role_col).alias("_r"),
                     F.col(text_col).alias("_t"))
    j = ctx.join(t, "ctx_doc_id")
    line = F.concat(F.col("_r"), F.lit(": "), F.col("_t"))
    ordered = F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col(idx_col).alias("i"), line.alias("l")))),
        lambda s: s["l"])
    return (
        j.groupBy("hit_doc_id", "score", conv_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_turns"),
             F.array_join(ordered, sep).alias("context_text"))
    )
