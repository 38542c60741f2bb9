"""A/B the LSM-layered term stats (segments.py::_finalize).

The round-3 change: per-micro-batch _finalize writes ONLY the new
segment's vocabulary as a fresh stats delta layer (readers fold layers
with the decomposable aggregate; > STATS_LAYERS_MAX layers compact into
one). The pre-round-3 behavior re-aggregated EVERY active segment's block
rows AND rewrote the FULL lexicon on every micro-batch.

At sandbox scales the whole-append wall is dominated by fixed per-batch
work (analyze, pack, write, count ≈ 2.5 s), so this measures the
_finalize STEP in isolation against a cold tier big enough that the full
block scan + full lexicon rewrite cost real time.

Protocol: build a BASE_TURNS cold tier once (build_segments), stream one
small batch in (creates the delta segment), then time _finalize over the
same active set along both code paths:
  A) layered delta (shipped): write O(batch vocabulary) rows
  B) full recompute (pre-round-3), forced by pointing the TOC's stats
     provenance at a missing generation: scan ALL active block rows and
     rewrite the full lexicon
Also times a top-k WAND query against the layered vs compacted stats view
(read amplification check). Content equality of the two paths is pinned by
tests/test_streaming_deletes.py.

Prints one JSON line. Run from the repo root:
    python scripts/bench_incremental_stats.py [BASE_TURNS] [REPS]
"""

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from whoosh_spark.fields import transcript_schema  # noqa: E402
from whoosh_spark.indexing import segments as S  # noqa: E402
from whoosh_spark.search.wand import wand_topk  # noqa: E402
from whoosh_spark.streaming import IncrementalIndexer  # noqa: E402
from whoosh_spark.transcripts import synth_turns  # noqa: E402

BASE_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BATCH_TURNS = 10_000


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = tempfile.mkdtemp() + "/ix"
    base = synth_turns(spark, BASE_TURNS).persist()
    base.count()
    t0 = time.perf_counter()
    S.build_segments(spark, base, transcript_schema(), path, n_segments=8)
    build_wall = round(time.perf_counter() - t0, 1)
    base.unpersist()

    batch = synth_turns(spark, BATCH_TURNS, seed=101).drop("doc_id")
    ixer = IncrementalIndexer(spark, path, transcript_schema())
    ixer.append_batch(batch, 0)

    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    active = meta["active_segments"]
    doc_count = meta["doc_count"]
    gen = meta["stats"]["generation"]  # delta layer on top of the base
    prev_state = {
        "generation": gen - 1,
        "segments": [s for s in active if s < S.STREAM_BASE],
        "layers": ["terms_global"],
    }

    def reset_meta(stats):
        m = dict(meta)
        m["stats"] = stats
        with open(os.path.join(path, "_meta.json"), "w") as f:
            json.dump(m, f)

    n_blocks = S._segment_blocks(spark, path, active).count()
    lex_rows = S.read_term_stats(spark, path).count()

    inc, full = [], []
    # keep every layer on disk across reps (cleanup would delete the layer
    # the next rep's rolled-back TOC points at); cleanup cost itself is a
    # driver-local rmtree, irrelevant to either path's timing
    real_rmtree = shutil.rmtree
    shutil.rmtree = lambda *a, **k: None
    try:
        for _ in range(REPS):
            # A: layered delta — published stats cover the base segments
            # only, so the publish writes just the batch's vocabulary
            reset_meta(prev_state)
            t0 = time.perf_counter()
            S._finalize(spark, path, doc_count, active)
            inc.append(round(time.perf_counter() - t0, 3))
            # B: full recompute — provenance points at a missing generation
            reset_meta({"generation": 999, "segments": [],
                        "layers": ["terms_global_g999"]})
            t0 = time.perf_counter()
            S._finalize(spark, path, doc_count, active)
            full.append(round(time.perf_counter() - t0, 3))
    finally:
        shutil.rmtree = real_rmtree

    # read amplification: same WAND query against the layered view
    # (base + delta, folded on read) vs the compacted single run
    reset_meta(prev_state)
    S._finalize(spark, path, doc_count, active)  # publish layered state
    six = S.open_segments(spark, path, ixer.stored_docs(), transcript_schema())
    terms = ["shuffle", "partition", "broadcast"]
    t0 = time.perf_counter()
    wand_topk(six, "text", terms, k=10).collect()
    q_layered = round(time.perf_counter() - t0, 3)
    reset_meta({"generation": 999, "segments": [],
                "layers": ["terms_global_g999"]})
    S._finalize(spark, path, doc_count, active)  # compacted single run
    six = S.open_segments(spark, path, ixer.stored_docs(), transcript_schema())
    t0 = time.perf_counter()
    wand_topk(six, "text", terms, k=10).collect()
    q_single = round(time.perf_counter() - t0, 3)

    print(json.dumps({
        "base_turns": BASE_TURNS, "batch_turns": BATCH_TURNS,
        "build_wall_s": build_wall, "total_block_rows": n_blocks,
        "lexicon_rows": lex_rows,
        "finalize_delta_layer_s": inc, "finalize_full_recompute_s": full,
        "speedup": round((sum(full) / len(full)) / (sum(inc) / len(inc)), 2),
        "wand_layered_stats_s": q_layered, "wand_single_run_s": q_single,
    }))
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


if __name__ == "__main__":
    main()
