"""Batched query-set execution vs serial per-query WAND.

Serial top-k pays a ~0.8 s/query driver-orchestration floor (BENCH.md
"Query-side scaling") that neither grows with data nor shrinks with
cores. wand_topk_many runs the WHOLE query set as one Spark action (one
union-pruned scan, one shuffle, one kernel wave), so the floor is paid
once per SET. Parity with per-query wand_topk is pinned in
tests/test_segments.py::test_wand_batch_equals_per_query.

Run from the repo root:
    python scripts/bench_query_batch.py [TURNS] [N_QUERIES]
"""

import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from whoosh_spark.fields import transcript_schema  # noqa: E402
from whoosh_spark.indexing.segments import build_segments, open_segments  # noqa: E402
from whoosh_spark.search.wand import wand_topk, wand_topk_many  # noqa: E402
from whoosh_spark.transcripts import _VOCAB, synth_turns  # noqa: E402

TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 12


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
    base.unpersist()
    six = open_segments(spark, path, base, transcript_schema())

    # N_QUERIES 3-term OR queries over the vocabulary, deterministic
    vocab = sorted(_VOCAB)
    queries = {
        q: [vocab[(3 * q + j) % len(vocab)] for j in range(3)]
        for q in range(N_QUERIES)
    }

    # warm both paths once (JIT/codegen), then measure
    wand_topk(six, "text", queries[0], k=10).collect()
    wand_topk_many(six, "text", {0: queries[0]}, k=10).collect()

    t0 = time.perf_counter()
    serial_rows = {q: wand_topk(six, "text", ts, k=10).collect()
                   for q, ts in queries.items()}
    serial = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    batch_rows = wand_topk_many(six, "text", queries, k=10).collect()
    batch = round(time.perf_counter() - t0, 2)

    by_q = {}
    for r in batch_rows:
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
    parity = all(
        by_q.get(q, []) == [(r.doc_id, r.score) for r in serial_rows[q]]
        for q in queries
    )
    # executor path (arbitrary query trees): Searcher.search_many vs serial
    from whoosh_spark import query as Q
    from whoosh_spark.search import Searcher

    s = Searcher(six)
    trees = {q: Q.Or([Q.Term("text", t) for t in ts])
             for q, ts in queries.items()}
    s.search(trees[0], limit=10).collect()  # warm
    t0 = time.perf_counter()
    ex_serial_rows = {q: s.search(t, limit=10).collect()
                      for q, t in trees.items()}
    ex_serial = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ex_batch_rows = s.search_many(trees, limit=10).collect()
    ex_batch = round(time.perf_counter() - t0, 2)
    ex_by_q = {}
    for r in ex_batch_rows:
        ex_by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
    ex_parity = all(
        ex_by_q.get(q, []) == [(r.doc_id, r.score) for r in ex_serial_rows[q]]
        for q in trees
    )
    print(json.dumps({
        "turns": TURNS, "n_queries": N_QUERIES,
        "wand_serial_wall_s": serial, "wand_batch_wall_s": batch,
        "wand_speedup": round(serial / batch, 2),
        "wand_parity": parity,
        "executor_serial_wall_s": ex_serial,
        "executor_batch_wall_s": ex_batch,
        "executor_speedup": round(ex_serial / ex_batch, 2),
        "executor_parity": ex_parity,
    }))


if __name__ == "__main__":
    main()
