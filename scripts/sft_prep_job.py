"""spark-submit entry point: SFT training-data prep over a transcript table.

The conversation-side companion to curate_job.py (same deployment shape):

    python scripts/make_dist.py
    spark-submit --py-files dist/whoosh_spark.zip \\
        scripts/sft_prep_job.py \\
        --turns /data/turns.parquet --out /data/sft \\
        [--min-turns 2] [--max-violations 0] [--budget-words 2048]

Input: the north-rule transcript shape (conv_id, turn_idx, role, text,
tool, ts). Stages, each a conv-keyed pass:

1. stats filter   — conversation_stats: drop convs with < --min-turns
                    turns or more than --max-violations role-alternation
                    violations (malformed transcripts)
2. dedup          — conversation-granularity exact dedup (keep the
                    canonical copy of each distinct conversation)
3. truncate       — longest whole-turn prefix under --budget-words
4. assemble+mask  — one document per conversation plus per-turn char
                    spans with the trainable flag (assistant turns train,
                    user/tool turns mask), spans collected in turn order

Output rows: (conv_id, n_turns, text, spans: array<struct<turn_idx,
char_start, char_end, trainable>>). Deterministic end to end — a
resubmit reproduces byte-identical output. Prints one JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-turns", type=int, default=2)
    ap.add_argument("--max-violations", type=int, default=0)
    ap.add_argument("--budget-words", type=int, default=2048)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("whoosh-spark-sft-prep").getOrCreate()
    # imports AFTER session start (package arrives via --py-files)
    from whoosh_spark.pipeline import (
        assemble_conversations,
        conversation_stats,
        exact_duplicates,
        loss_mask_spans,
        truncate_conversations,
    )

    t0 = time.time()
    turns = spark.read.parquet(args.turns).persist()
    n_convs_in = turns.select("conv_id").distinct().count()

    stats = conversation_stats(turns)
    good = stats.where(
        (F.col("n_turns") >= args.min_turns)
        & (F.col("role_repeats") <= args.max_violations)
    ).select("conv_id")
    kept = turns.join(good, "conv_id", "left_semi").persist()

    # conversation-granularity exact dedup: assemble role-less, label
    # groups by md5, keep each group's canonical (min conv_id) copy
    canon = exact_duplicates(
        assemble_conversations(kept, sep=" ", with_roles=False),
        id_col="conv_id",
    ).where(F.col("is_canonical")).select(F.col("doc_id").alias("conv_id"))
    deduped = kept.join(canon, "conv_id", "left_semi")

    trimmed = truncate_conversations(deduped, args.budget_words) \
        .select("conv_id", "turn_idx", "role", "text").persist()

    docs = assemble_conversations(trimmed)
    spans = loss_mask_spans(trimmed)
    packed_spans = spans.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(F.struct(
            "turn_idx", "char_start", "char_end", "trainable"))).alias("spans"),
        F.sum(F.when(F.col("trainable") == 1,
                     F.col("char_end") - F.col("char_start"))
              .otherwise(0)).alias("trainable_chars"),
    )
    out = docs.join(packed_spans, "conv_id").persist()
    n_out = out.count()
    trainable_chars = out.agg(F.sum("trainable_chars")).collect()[0][0] or 0
    total_chars = out.agg(F.sum(F.length("text"))).collect()[0][0] or 0
    out.write.mode("overwrite").parquet(args.out)

    print(json.dumps({
        "convs_in": n_convs_in,
        "convs_out": n_out,
        "trainable_chars": int(trainable_chars),
        "total_chars": int(total_chars),
        "trainable_frac": round(trainable_chars / max(total_chars, 1), 4),
        "budget_words": args.budget_words,
        "wall_sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
