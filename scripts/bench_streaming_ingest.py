"""Sustained streaming-ingest rehearsal: micro-batches -> segments, with
merge compaction and LSM stats layers, end to end.

Protocol: N_BATCHES micro-batches of BATCH_TURNS each appended via
IncrementalIndexer (merge_every=MERGE_EVERY, so the hot tier is folded
into the cold tier repeatedly mid-run — the intended 100 TB operating
mode), then one search against the final index. Reports per-batch walls,
sustained ingest throughput, and the final TOC shape.

Run from the repo root:
    python scripts/bench_streaming_ingest.py [BATCH_TURNS] [N_BATCHES]
"""

import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from whoosh_spark.fields import transcript_schema  # noqa: E402
from whoosh_spark.indexing.segments import open_segments  # noqa: E402
from whoosh_spark.search.wand import wand_topk  # noqa: E402
from whoosh_spark.streaming import IncrementalIndexer  # noqa: E402
from whoosh_spark.transcripts import synth_turns  # noqa: E402

BATCH_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 20
MERGE_EVERY = 8


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
    ixer = IncrementalIndexer(spark, path, transcript_schema(),
                              merge_every=MERGE_EVERY)
    batches = [
        synth_turns(spark, BATCH_TURNS, seed=500 + i).drop("doc_id").persist()
        for i in range(N_BATCHES)
    ]
    for b in batches:
        b.count()  # synth cost out of the ingest measurement

    walls = []
    t_start = time.perf_counter()
    for i, b in enumerate(batches):
        t0 = time.perf_counter()
        ixer.append_batch(b, i)
        walls.append(round(time.perf_counter() - t0, 3))
    total = time.perf_counter() - t_start

    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    six = open_segments(spark, path, ixer.stored_docs(), transcript_schema())
    t0 = time.perf_counter()
    top = wand_topk(six, "text", ["shuffle", "partition", "broadcast"],
                    k=10).collect()
    q_wall = round(time.perf_counter() - t0, 3)

    print(json.dumps({
        "batch_turns": BATCH_TURNS, "batches": N_BATCHES,
        "merge_every": MERGE_EVERY,
        "per_batch_s": walls,
        "total_wall_s": round(total, 1),
        "ingest_turns_per_sec": round(BATCH_TURNS * N_BATCHES / total, 1),
        "final_active_segments": len(meta["active_segments"]),
        "final_stats_layers": len(meta["stats"]["layers"]),
        "doc_count": meta["doc_count"],
        "wand_top1": top[0].asDict() if top else None,
        "wand_wall_s": q_wall,
    }))


if __name__ == "__main__":
    main()
