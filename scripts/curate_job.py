"""spark-submit entry point: end-to-end training-data curation sweep.

The pipeline companion to build_index_job.py — same deployment shape:

    python scripts/make_dist.py
    spark-submit --py-files dist/whoosh_spark.zip \\
        scripts/curate_job.py \\
        --docs /data/documents.parquet --out /data/curated \\
        [--min-quality 0.1] [--capacity 2048] [--sample 1.0]

Stages (each a bounded-shuffle pass, all joined on doc_id):

1. curation_labels  — langid + quality + exact-dup canonical + near-dup
                      (MinHash-LSH -> connected-components sweep)
                      canonical, composed into one keep verdict
2. substring pass   — exact duplicated-substring spans cut from the
                      KEPT docs (Lee et al. 2022 tier)
3. paragraph pass   — optional (--paragraph-dedup) Dolma-tier
                      paragraph-granularity exact dedup of the cleaned
                      text (corpus-first occurrence kept)
4. pack             — token counts + sequence packing (--pack-mode:
                      concat-and-chunk, or boundary-preserving FFD bins)
                      of the cleaned survivors into --capacity windows
5. sample           — optional deterministic md5 Bernoulli downsample

Writes the curated/packed table to --out and prints one JSON metrics
line (docs in/kept, dup chars cut, sequences, wall). Resubmittable: the
output write is overwrite-mode and every stage is deterministic, so a
re-run reproduces byte-identical results.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-quality", type=float, default=0.1)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--sample", type=float, default=1.0)
    ap.add_argument("--paragraph-dedup", action="store_true")
    ap.add_argument("--keep-best", action="store_true",
                    help="pick near-dup cluster canonicals by highest "
                         "quality instead of min doc_id")
    ap.add_argument("--pack-mode", choices=("chunk", "ffd"), default="chunk",
                    help="chunk = concat-and-chunk (docs split at window "
                         "boundaries); ffd = boundary-preserving FFD bins "
                         "(docs never split)")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("whoosh-spark-curate").getOrCreate()
    # imports AFTER session start (package arrives via --py-files)
    from whoosh_spark.pipeline import (
        pack_sequences,
        remove_duplicate_substrings,
        token_counts,
    )
    from whoosh_spark.pipeline.curate import curation_labels

    t0 = time.time()
    docs = spark.read.parquet(args.docs).persist()
    n_in = docs.count()

    labels = curation_labels(docs, quality_min=args.min_quality,
                             keep_best_quality=args.keep_best)
    kept_ids = labels.where("keep").select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "left_semi").persist()
    n_kept = kept.count()

    cleaned = remove_duplicate_substrings(kept).persist()
    dup_chars = cleaned.agg(F.sum("dup_chars")).collect()[0][0] or 0

    base = cleaned.select("doc_id", F.col("text_clean").alias("text"))
    paras_dropped = 0
    if args.paragraph_dedup:
        from whoosh_spark.pipeline import paragraph_dedup

        pd_out = paragraph_dedup(base).persist()
        paras_dropped = pd_out.agg(F.sum("n_dropped")).collect()[0][0] or 0
        base = pd_out.select("doc_id", F.col("text_clean").alias("text"))
    if args.sample < 1.0:
        from whoosh_spark.pipeline import hash_sample

        base = hash_sample(base, args.sample)
    if args.pack_mode == "ffd":
        from whoosh_spark.pipeline import pack_bins_ffd

        packed = pack_bins_ffd(
            token_counts(base).select(
                "doc_id", F.col("bpe_tokens").alias("n_tokens")),
            args.capacity,
        ).withColumnRenamed("bin_id", "end_seq_id")
    else:
        packed = pack_sequences(
            token_counts(base), args.capacity, token_col="bpe_tokens"
        )
    out = base.join(packed, "doc_id").persist()
    n_out = out.count()
    n_seqs = (out.select(F.countDistinct("end_seq_id")).collect()[0][0] - 1
              if args.pack_mode == "ffd"
              else out.agg(F.max("end_seq_id")).collect()[0][0])
    out.write.mode("overwrite").parquet(args.out)

    print(json.dumps({
        "docs_in": n_in,
        "docs_kept_curation": n_kept,
        "dup_chars_cut": int(dup_chars),
        "paragraphs_dropped": int(paras_dropped),
        "docs_out": n_out,
        "sequences": int(n_seqs) + 1 if n_seqs is not None else 0,
        "capacity": args.capacity,
        "wall_sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
