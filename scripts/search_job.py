"""spark-submit entry point: query a segmented transcript index.

Completes the build_index_job.py production story (a reference user's
`ix.searcher().search(parser.parse(q))` loop, cluster-side):

    spark-submit --py-files dist/whoosh_spark.zip \\
        scripts/search_job.py \\
        --index /data/ix --query '"hash join" OR spark^2' \\
        [--docs path.parquet | --turns 2000000] [--limit 10] [--wand]

- --docs points at the stored transcript table the index was built from
  (any parquet/Iceberg path with the input_hint columns); --turns N
  regenerates the deterministic synthetic corpus instead (must match the
  build's --turns).
- --wand routes through the block-max WAND top-k path (per-segment
  pruning on packed block metadata); default is the executor pipeline.
  For unboosted Term / flat And / flat Or queries both paths return
  bit-identical (doc_id, score) rankings — tested in
  tests/test_segments.py; boosted queries are refused on the WAND path.
- Prints one JSON line: the parsed query, top-k (doc_id, score) rows, and
  wall time.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--docs", default=None)
    ap.add_argument("--turns", type=int, default=None)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--field", default="text")
    ap.add_argument("--wand", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("whoosh-spark-search").getOrCreate()
    from whoosh_spark.fields import transcript_schema
    from whoosh_spark.indexing.docids import assign_doc_ids
    from whoosh_spark.indexing.segments import open_segments
    from whoosh_spark.query.parser import QueryParser
    from whoosh_spark.search import Searcher
    from whoosh_spark.transcripts import synth_turns

    schema = transcript_schema()
    if args.docs:
        docs = spark.read.parquet(args.docs)
        if "doc_id" not in docs.columns:
            docs = assign_doc_ids(docs, ["conv_id", "turn_idx"])
    elif args.turns:
        docs = synth_turns(spark, args.turns)
    else:
        raise SystemExit("one of --docs or --turns is required")

    ix = open_segments(spark, args.index, docs, schema)
    q = QueryParser(args.field, schema).parse(args.query)

    t0 = time.perf_counter()
    if args.wand:
        from whoosh_spark import query as Q
        from whoosh_spark.search.wand import wand_topk

        if isinstance(q, Q.Term):
            leaves, mode = [q], "or"
        elif isinstance(q, (Q.And, Q.Or)) and all(
            isinstance(s, Q.Term) for s in q.subqueries
        ):
            leaves = list(q.subqueries)
            mode = "and" if isinstance(q, Q.And) else "or"
        else:
            raise SystemExit("--wand supports Term / flat And / flat Or queries")
        if any(s.boost != 1.0 for s in leaves) or q.boost != 1.0:
            # wand_topk scores unboosted terms; a boosted query would
            # silently rank differently from the executor path
            raise SystemExit("--wand supports unboosted terms; drop ^boosts "
                             "or use the executor path")
        terms = [s.text for s in leaves]
        rows = wand_topk(ix, args.field, terms, k=args.limit, mode=mode).collect()
    else:
        rows = Searcher(ix).search(q, limit=args.limit).collect()
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "query": repr(q),
                "path": "wand" if args.wand else "executor",
                "wall_sec": round(wall, 3),
                "hits": [
                    {"doc_id": r["doc_id"], "score": round(r["score"], 6)}
                    for r in rows
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
