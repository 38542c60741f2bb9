"""JVM analyzer engine (build_index(analyzer_engine="jvm")): pinned
bit-exact against the default Arrow/numpy chain — two independent
implementations of tokenize → lowercase → stop/minsize → renumber →
per-(doc,term) combine → byte-quantized dl that must agree row for row.
"""

import pytest

from pyspark.sql import functions as F

from whoosh_spark.fields import ID, NUMERIC, Schema, TEXT, transcript_schema
from whoosh_spark.indexing import build_index
from whoosh_spark.indexing.build import _jvm_analyzer_eligible

COLS = ["field", "term", "doc_id", "weight", "positions", "dl"]


def _postings(spark, docs, schema, engine):
    ix = build_index(spark, docs, schema, materialize=False,
                     analyzer_engine=engine)
    return ix.postings.select(COLS).orderBy("field", "term", "doc_id").collect()


def test_jvm_equals_arrow_on_synth_corpus(spark):
    from whoosh_spark.transcripts import synth_turns

    t = synth_turns(spark, 3000).persist()
    a = _postings(spark, t, transcript_schema(), "arrow")
    j = _postings(spark, t, transcript_schema(), "jvm")
    assert len(a) > 10_000
    assert a == j
    t.unpersist()


def test_jvm_equals_arrow_edge_texts(spark):
    docs = spark.createDataFrame(
        [
            (0, "the the the", "u"),          # all stopped -> no rows
            (1, "", "u"),                      # empty
            (2, "Spark SPARK spark x", "a"),   # case folding + minsize drop
            (3, "a1.b2 c.d.e ver1.2.3", "t"),  # dotted-token pattern
            (4, "repeat repeat other repeat", "u"),  # positions + tf
            (5, None, "u"),                    # null text
        ],
        "doc_id long, text string, role string",
    )
    schema = Schema(TEXT("text"), ID("role"))
    assert _postings(spark, docs, schema, "arrow") == \
        _postings(spark, docs, schema, "jvm")


def test_jvm_dl_quantization_exhaustive(spark):
    """bround(ln(...)) in the JVM must reproduce numpy rint(log(...))
    for EVERY possible raw length 0..68000 (and the >= 68000 clamp)."""
    import math

    import numpy as np

    from whoosh_spark.util import BYTE_TO_LENGTH, quantized_length_np

    ln_base = math.log(1.0325)
    raw = F.col("id")
    byte = F.when(raw <= 0, F.lit(0)).when(raw >= 68000, F.lit(255)).otherwise(
        F.least(
            F.lit(255),
            F.bround(F.log(raw.cast("double") / F.lit(8.0) + F.lit(1.0))
                     / F.lit(ln_base)).cast("int"),
        )
    )
    dl = F.element_at(F.array(*[F.lit(int(v)) for v in BYTE_TO_LENGTH]),
                      byte + 1).cast("long")
    got = np.array([r.dl for r in
                    spark.range(68002).select(dl.alias("dl")).collect()])
    want = quantized_length_np(np.arange(68002))
    assert (got == want).all()


def test_jvm_engine_gates_on_eligibility(spark):
    """Fields whose chain the JVM path can't express (stem, ngram, ...)
    silently keep the Arrow engine — results identical either way."""
    from whoosh_spark.analysis import (AnalyzerSpec, FANCY, NGRAM_WORDS,
                                       STANDARD, STEMMING)

    assert _jvm_analyzer_eligible(STANDARD)
    assert _jvm_analyzer_eligible(AnalyzerSpec(minsize=3))
    assert not _jvm_analyzer_eligible(STEMMING)
    assert not _jvm_analyzer_eligible(FANCY)
    assert not _jvm_analyzer_eligible(NGRAM_WORDS())
    assert not _jvm_analyzer_eligible(AnalyzerSpec(lowercase=False))

    docs = spark.createDataFrame(
        [(0, "running runs", "hash join"), (1, "runner ran", "sort merge")],
        "doc_id long, stems string, text string",
    )
    schema = Schema(TEXT("stems", analyzer=STEMMING), TEXT("text"))
    assert _postings(spark, docs, schema, "arrow") == \
        _postings(spark, docs, schema, "jvm")


def test_jvm_engine_search_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [(0, "hash join merge"), (1, "hash hash probe"), (2, "scan only")],
        "doc_id long, text string",
    )
    sa = Searcher(build_index(spark, docs, Schema(TEXT("text"))))
    sj = Searcher(build_index(spark, docs, Schema(TEXT("text")),
                              analyzer_engine="jvm"))
    q = Q.Or([Q.Term("text", "hash"), Q.Term("text", "merge")])
    assert [(r.doc_id, r.score) for r in sa.search(q).collect()] == \
        [(r.doc_id, r.score) for r in sj.search(q).collect()]


def test_jvm_engine_validation(spark):
    docs = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="analyzer_engine"):
        build_index(spark, docs, Schema(TEXT("text")), analyzer_engine="bogus")
