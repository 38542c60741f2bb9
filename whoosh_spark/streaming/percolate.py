"""Query percolation: match incoming documents against a registered set
of standing queries — the INVERSE of search (alerting / routing: "which
of my saved searches does this new document satisfy?"). Whoosh has no
percolator; this is part of the streaming extension over the same engine
(the shape popularized by Elasticsearch's percolate API).

Batch kernel: analyze + index the incoming batch ONCE through the same
verified build path as the main engine (``build_index`` — mapInArrow
analyzer, postings + stats frames), then compile every standing query
against that per-batch index and union the tagged match sets into ONE
Spark action. Each compiled query is a column-expression plan over the
SHARED postings frame, so the scan is multiplexed across queries by
Catalyst instead of re-run per query. Per-micro-batch cost scales with
batch size; the rule set is the bounded side (tens to thousands of
standing queries — broadcast-sized by nature). At very large rule
counts the classical refinement is a term->query inverted index over
the RULES to prefilter candidates; the union plan here already skips
non-matching docs per query via the postings semi-joins, which is the
same effect for conjunctive rules.

Streaming twin: ``percolate_stream`` runs the identical batch kernel
per micro-batch via ``foreachBatch`` and appends matches to a parquet
sink; streaming == batch is pinned in tests/test_percolate.py via an
availableNow run over the same rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_spark import query as Q
from whoosh_spark.fields import Schema, documents_schema
from whoosh_spark.indexing import build_index
from whoosh_spark.search import Searcher

__all__ = ["percolate", "percolate_stream"]


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: dict[str, Q.Query],
    schema: Schema | None = None,
    with_scores: bool = True,
) -> DataFrame:
    """Match every standing query against ``docs`` ->
    (query_name, doc_id[, score]): one row per (query, matching doc).

    ``queries`` may be arbitrary compiled trees (boolean, phrase, range,
    fuzzy, ...) — the full query surface of the engine applies. Scores
    are the per-batch BM25 scores (stats are batch-local: a percolation
    batch IS the corpus for alerting purposes); pass
    ``with_scores=False`` for pure membership.
    """
    df, _ix = _percolate_with_ix(spark, docs, queries, schema, with_scores)
    return df


def _percolate_with_ix(spark, docs, queries, schema, with_scores):
    if not queries:
        return (
            spark.createDataFrame([], "query_name string, doc_id long, score double"),
            None,
        )
    # persist the analyzed frames for the duration of the multi-query
    # union — every branch shares the same postings scan
    ix = build_index(spark, docs, schema or documents_schema()).persist()
    s = Searcher(ix)
    branches = []
    for name, q in queries.items():
        scored = s.compile(q)
        cols = [F.lit(name).alias("query_name"), "doc_id"]
        if with_scores:
            cols.append(F.col("score"))
        branches.append(scored.select(*cols))
    return reduce(DataFrame.unionByName, branches), ix


def percolate_stream(
    stream_docs: DataFrame,
    queries: dict[str, Q.Query],
    out_path: str,
    checkpoint: str,
    schema: Schema | None = None,
    with_scores: bool = True,
    available_now: bool = True,
):
    """Percolate a document STREAM: each micro-batch runs the same batch
    kernel and appends (query_name, doc_id[, score], _batch_id) parquet
    rows to ``out_path``. Returns the started StreamingQuery (caller
    awaits / stops). State is per-batch only — percolation is stateless
    across batches by definition, so no watermark is needed and a
    restart resumes cleanly from the checkpoint's source offsets.
    """

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        out, ix = _percolate_with_ix(
            bdf.sparkSession, bdf, queries, schema, with_scores
        )
        try:
            (out.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("append").parquet(out_path))
        finally:
            if ix is not None:
                ix.unpersist()  # per-batch cache; percolation is stateless

    writer = (
        stream_docs.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
