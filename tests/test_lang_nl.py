"""Snowball Dutch stemmer + LanguageAnalyzer('nl').

Independent implementation of the PUBLISHED Snowball Dutch algorithm
(snowballstem.org; reference surface: src/whoosh/lang/snowball/dutch.py
via analysis/analyzers.py::LanguageAnalyzer). The reference mount is
empty, so parity is pinned by vectors hand-executed from the published
spec — each chosen to exercise one rule — plus end-to-end index/search
behavior. Dutch is the two-region family (R1 min-3-adjusted) with a
consonant-marking prelude (initial y, y after a vowel, i between vowels
go upper-case), kk/dd/tt ending undoubling, and a final CVVD
double-vowel undouble step.
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import SNOWBALL_STOP_NL, stem_nl

NL_VECTORS = [
    # step 4 undouble-vowel (the spec's own examples)
    ("maan", "man"),
    ("brood", "brod"),
    # step 1 en after a valid en-ending, then kk/dd/tt undouble
    ("bedden", "bed"),
    ("katten", "kat"),
    ("huizen", "huiz"),
    ("wegen", "weg"),
    # step 1 s: valid s-ending is a non-vowel other than j
    ("huis", "huis"),           # 's' starts before R1 (min-3 adj) — kept
    ("zorgels", "zorgel"),      # s after l — removed
    ("videos", "videos"),       # s after o (vowel) — kept
    # step 1 heden -> heid, then step 3a heid in R2
    ("lichamelijkheden", "licham"),
    ("zorgelheden", "zorgel"),
    ("heden", "heden"),         # suffix starts before R1 — kept
    # step 2 e after a non-vowel in R1 (+ undouble)
    ("hoeden", "hoed"),
    ("lichamelijke", "licham"),
    # step 3b lijk (repeat step 2 afterwards)
    ("lichamelijk", "licham"),
    # step 3b ig with the e-guard
    ("eenvoudig", "eenvoud"),
    # 'end' in R2 deleted, then the exposed 'ig' (also in R2, not
    # preceded by e) is deleted too
    ("zorgeligend", "zorgel"),
    # invented-stem group: the derived-corpus oracle group (entry
    # dutch_search_topk)
    ("zorgelen", "zorgel"),
]


def test_stem_nl_vectors():
    for word, want in NL_VECTORS:
        assert stem_nl(word) == want, (word, stem_nl(word), want)


def test_stem_nl_case_insensitive():
    assert stem_nl("BEDDEN") == "bed"
    assert stem_nl("Lichamelijk") == "licham"


def test_stem_nl_prelude_marks():
    # i between vowels is marked as a consonant: 'draaien' — the marked I
    # makes the preceding 'aa' NOT a step-4 CVVD shape (D == I is
    # excluded) and makes 'aI' a valid en-ending boundary
    # d r a a i e n: prelude -> draaIen; r1 = 4 (a at 2, next a vowel;
    # a at 3, next I non-vowel -> 5? hand-run pinned below)
    out = stem_nl("draaien")
    # en at pos 5 >= r1, rem 'draaI' ends with marked I (non-vowel) ->
    # removed; postlude unmarks -> 'draai'
    assert out == "draai"
    # initial y is marked (consonant): 'ya' has r1 = max(2,3) = 3 == len,
    # nothing fires
    assert stem_nl("ya") == "ya"


def test_stem_nl_accents_fold():
    # umlauts and acutes fold to the plain vowel in the prelude
    assert stem_nl("coördinaten") == stem_nl("coordinaten")
    assert stem_nl("één") == "een"


def test_stem_nl_bar_requires_step2_e():
    # 'bar' is deleted only if step 2 actually removed an e:
    # 'zorgelebar': step 2 has no final e -> 'bar' kept even in R2
    assert stem_nl("zorgelbar") == "zorgelbar"
    # 'zorgelbare': step 2 removes the final e -> 'bar' (in R2) removed
    assert stem_nl("zorgelbare") == "zorgel"
    # 'baar' needs no e: 'zorgelbaar' -> 'zorgel'
    assert stem_nl("zorgelbaar") == "zorgel"


def test_stem_nl_gem_guard():
    # en preceded by 'gem' is NOT a valid en-ending
    assert stem_nl("zorgelgemen") == "zorgelgemen"


def test_snowball_stop_nl():
    for w in ("de", "het", "een", "niet", "worden"):
        assert w in SNOWBALL_STOP_NL
    assert "zorgel" not in SNOWBALL_STOP_NL


def test_language_nl_spec():
    assert LANGUAGE("nl").stem == "nl"
    assert LANGUAGE("nl").stoplist is SNOWBALL_STOP_NL
    assert LANGUAGE("dutch").stem == "nl"
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="vl")


def test_language_nl_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["de grote zorgelheden van het huis"]),
        LANGUAGE("nl"),
    )
    # 'de'/'van'/'het' are Dutch stopwords; the rest stem (grote loses
    # its step-2 e; huis keeps its s — the suffix starts before R1)
    assert list(out.term) == ["grot", "zorgel", "huis"]


def test_language_nl_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [
            (0, "de katten slapen op het bed"),
            (1, "een kat liep door de straat"),
            (2, "lichamelijke oefening is gezond"),
            (3, "veel andere dingen"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("nl")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # katten and kat share the stem 'kat'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_nl("katten")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1]
    # Dutch stopwords are not indexed
    assert s.search(Q.Term("text", "veel"), limit=10,
                    optimize=False).count() == 0
