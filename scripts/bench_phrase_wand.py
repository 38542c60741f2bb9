"""Block-max phrase WAND vs the executor's positional phrase plan at volume.

The executor phrase plan (executor._c_phrase) inner-joins the FULL posting
lists of every phrase word and runs the position chain on every
co-occurring doc; wand_phrase_topk bounds the work with block-range
candidate skipping, conjunction-score-ordered verification with early
exit, and lazy per-block position decode (BENCH.md "Phrase WAND").
Parity is pinned in tests/test_phrase_wand.py (bit-identical).

Run from the repo root:
    python scripts/bench_phrase_wand.py [TURNS]
"""

import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from whoosh_spark import query as Q  # noqa: E402
from whoosh_spark.fields import transcript_schema  # noqa: E402
from whoosh_spark.indexing.segments import build_segments, open_segments  # noqa: E402
from whoosh_spark.search import Searcher  # noqa: E402
from whoosh_spark.search.wand import wand_phrase_topk  # noqa: E402
from whoosh_spark.transcripts import synth_turns  # noqa: E402

TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

# common-word phrases (worst case for the unpruned join) + a rarer chain
PHRASES = [
    (["hash", "join"], 1),
    (["data", "line"], 1),
    (["window", "merge", "join"], 2),
]


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
    base = synth_turns(spark, TURNS).persist()
    base.count()
    build_segments(spark, base, transcript_schema(), path, n_segments=8)
    six = open_segments(spark, path, base, transcript_schema())
    s = Searcher(six)

    out = {"turns": TURNS, "phrases": []}
    for words, slop in PHRASES:
        t0 = time.time()
        ref = [(r.doc_id, round(r.score, 9)) for r in
               s.search(Q.Phrase("text", words, slop=slop),
                        optimize=False).collect()]
        t_exec = time.time() - t0
        t0 = time.time()
        got = [(r.doc_id, round(r.score, 9)) for r in
               wand_phrase_topk(six, "text", words, slop=slop).collect()]
        t_wand = time.time() - t0
        out["phrases"].append({
            "phrase": " ".join(words), "slop": slop,
            "executor_s": round(t_exec, 2), "wand_s": round(t_wand, 2),
            "speedup": round(t_exec / t_wand, 2),
            "parity": got == ref, "n": len(ref),
        })
    base.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
