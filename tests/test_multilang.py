"""MULTILANG_TEXT: per-row analyzer routing on a language column.

Pins (a) correct routing — each row's terms come out of its OWN
language's stemmer, (b) the default-spec fallback for unknown / NULL
languages, (c) bit-exact equivalence with the plain TEXT path when every
language maps to the same spec (the refactor guard for the shared
_postings_record_batch body), and (d) end-to-end search over a routed
index.
"""

import pytest
from pyspark.sql import functions as F

from whoosh_spark import query as Q
from whoosh_spark.analysis import LANGUAGE, STANDARD, AnalyzerSpec
from whoosh_spark.fields import MULTILANG_TEXT, TEXT, Schema
from whoosh_spark.indexing import build_index
from whoosh_spark.search import Searcher


@pytest.fixture(scope="module")
def mixed_docs(spark):
    return spark.createDataFrame([
        (0, "en", "the developers walked computing zorgling"),
        (1, "de", "zorgelungen grosse worte laufen"),
        (2, "es", "zorgelando palabras corriendo"),
        (3, "fr", "zorgelation parler grande"),
        (4, "zz", "zorgling unknown language fallback"),
        (5, None, "zorgling null language fallback"),
    ], "doc_id long, lang string, text string")


def _terms(ix, doc_id):
    return {r.term for r in
            ix.postings.where(F.col("doc_id") == doc_id).collect()}


def test_routing_per_language(spark, mixed_docs):
    schema = Schema(MULTILANG_TEXT("text", specs={
        "en": AnalyzerSpec(stem="porter2"),
        "de": AnalyzerSpec(stem="de"),
        "es": AnalyzerSpec(stem="es"),
        "fr": AnalyzerSpec(stem="fr"),
    }, default=AnalyzerSpec(stem="porter2")))
    ix = build_index(spark, mixed_docs, schema).persist()
    assert {"develop", "walk", "comput", "zorgl"} <= _terms(ix, 0)
    assert {"zorgel", "gross", "wort", "lauf"} <= _terms(ix, 1)
    assert {"zorgel", "palabr"} <= _terms(ix, 2)
    assert {"zorgel", "parl"} <= _terms(ix, 3)
    # unknown and NULL languages -> default porter2, never a raise
    assert "zorgl" in _terms(ix, 4)
    assert "zorgl" in _terms(ix, 5)
    ix.unpersist()


def test_lazy_language_resolution(spark, mixed_docs):
    # no explicit specs: bundled codes resolve via LANGUAGE(code), the
    # rest (zz, NULL) fall back to the default spec silently
    schema = Schema(MULTILANG_TEXT("text", default="en"))
    ix = build_index(spark, mixed_docs, schema).persist()
    assert "zorgel" in _terms(ix, 1)      # de routed
    assert "zorgl" in _terms(ix, 4)       # zz -> en fallback
    assert "zorgl" in _terms(ix, 5)       # NULL -> en fallback
    # LANGUAGE('de') includes the German stoplist: 'grosse' survives it
    # but 'die'-class words would not; spot-check a German stop word
    d = spark.createDataFrame([(9, "de", "aber zorgelungen")],
                              "doc_id long, lang string, text string")
    ix2 = build_index(spark, d, Schema(MULTILANG_TEXT("text", default="en")))
    t = _terms(ix2, 9)
    assert "zorgel" in t and "aber" not in t
    ix.unpersist()


def test_uniform_specs_match_plain_text_bitexact(spark, mixed_docs):
    # every language mapped to ONE spec == the plain TEXT build, posting
    # for posting (weights, positions, dl) — pins the shared batch body
    uniform = Schema(MULTILANG_TEXT("text", specs={}, default=STANDARD))
    plain = Schema(TEXT("text", analyzer=STANDARD))
    a = build_index(spark, mixed_docs, uniform).postings
    b = build_index(spark, mixed_docs, plain).postings
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_search_routed_index(spark, mixed_docs):
    schema = Schema(MULTILANG_TEXT("text", specs={
        "en": AnalyzerSpec(stem="porter2"),
        "de": AnalyzerSpec(stem="de"),
        "es": AnalyzerSpec(stem="es"),
        "fr": AnalyzerSpec(stem="fr"),
    }, default=AnalyzerSpec(stem="porter2")))
    s = Searcher(build_index(spark, mixed_docs, schema).persist())
    hits = {r.doc_id for r in s.search(Q.Term("text", "zorgel"), limit=10).collect()}
    assert hits == {1, 2, 3}
    hits2 = {r.doc_id for r in s.search(Q.Term("text", "zorgl"), limit=10).collect()}
    assert hits2 == {0, 4, 5}


def test_partitioning_invariance(spark, mixed_docs):
    schema = Schema(MULTILANG_TEXT("text", default="en"))
    a = sorted(map(tuple,
                   build_index(spark, mixed_docs, schema).postings.collect()))
    b = sorted(map(tuple,
                   build_index(spark, mixed_docs.repartition(5),
                               schema).postings.collect()))
    assert a == b


def test_query_side_language_override(spark, mixed_docs):
    # the query-side selector for a routed index: parse with LANGUAGE(x)
    # overriding the field's default spec, hit exactly that language's
    # routed postings
    from whoosh_spark.query.parser import QueryParser

    schema = Schema(MULTILANG_TEXT("text", default="en"))
    s = Searcher(build_index(spark, mixed_docs, schema).persist())
    p_de = QueryParser("text", schema,
                       analyzer_overrides={"text": LANGUAGE("de")})
    q = p_de.parse("zorgelungen")
    assert q == Q.Term("text", "zorgel")
    hits = {r.doc_id for r in s.search(q, limit=10).collect()}
    assert 1 in hits and 0 not in hits
    # default parser analyzes with the en chain: zorgling -> zorgl
    p_en = QueryParser("text", schema)
    q2 = p_en.parse("zorgling")
    assert q2 == Q.Term("text", "zorgl")
    assert {r.doc_id for r in s.search(q2, limit=10).collect()} >= {0, 4, 5}
