"""Snowball German stemmer (lang.stem_de) + LanguageAnalyzer('de').

Independent implementation of the PUBLISHED Snowball German algorithm
(snowballstem.org 'german'; reference surface: src/whoosh/lang/snowball/
german.py via analysis/analyzers.py::LanguageAnalyzer). The reference
mount is empty, so parity is pinned by vectors hand-executed from the
published spec — each chosen to exercise one rule of the algorithm —
plus end-to-end index/search behavior.
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import SNOWBALL_STOP_DE, stem_de

# (word, stem): every step / side-condition of the published algorithm
VECTORS = [
    # step 1 group (a): er / ern / em
    ("aufeinander", "aufeinand"),
    ("kinder", "kind"),
    ("kindern", "kind"),
    ("häuser", "haus"),  # + umlaut strip in the postlude
    # step 1 group (b): e / en / es
    ("singen", "sing"),
    ("grenzen", "grenz"),
    ("bäume", "baum"),
    ("hauses", "haus"),
    # group (b) + niss special case
    ("ergebnisse", "ergebnis"),
    ("geheimnisse", "geheimnis"),
    # step 1 group (c): s after a valid s-ending (d yes, u no)
    ("lieds", "lied"),
    ("blaus", "blaus"),
    # step 2: est / en-er after step 1, st with valid st-ending
    ("kleinsten", "klein"),
    ("schnellsten", "schnell"),
    ("zorgelest", "zorgel"),
    # step 3 d-suffixes: each branch + its follow-up deletion
    ("bedeutung", "bedeut"),          # ung in R2
    ("sammlung", "sammlung"),         # ung NOT in R2 -> kept
    ("zorgeligung", "zorgel"),        # ung then ig (not after e)
    ("lebendig", "lebend"),           # ig in R2, not after e
    ("elektrisch", "elektr"),         # isch in R2, not after e
    ("zorgeleisch", "zorgeleisch"),   # isch after e -> kept
    ("freundlichkeit", "freundlich"),  # keit in R2; lich NOT in R2
    ("zorgellichkeit", "zorgel"),     # keit then lich in R2
    ("zorgelerlich", "zorgel"),       # lich then er in R1
    ("heiterkeit", "heiter"),
    ("schönheit", "schonheit"),       # heit NOT in R2 -> kept
    ("königin", "konigin"),           # no suffix, umlaut strip only
    # prelude: ß -> ss; u/y between vowels marked consonant for regions
    ("straße", "strass"),
    ("treue", "treu"),
    ("bayern", "bay"),
    # R1 floored at 3: suffix before position 3 never strips
    ("een", "een"),
    # derived-corpus oracle forms (entry german_search_topk)
    ("zorgelung", "zorgel"),
    ("zorgelungen", "zorgel"),
    ("zorgeles", "zorgel"),
]


def test_stem_de_vectors():
    for word, want in VECTORS:
        assert stem_de(word) == want, (word, stem_de(word), want)


def test_stem_de_case_insensitive():
    assert stem_de("Häuser") == "haus"


def test_snowball_stop_de():
    assert len(SNOWBALL_STOP_DE) == 232
    for w in ("aber", "und", "der", "die", "das", "daß", "während",
              "zwischen", "für", "können"):
        assert w in SNOWBALL_STOP_DE
    assert "haus" not in SNOWBALL_STOP_DE


def test_language_de_spec():
    spec = LANGUAGE("de")
    assert spec.stem == "de"
    assert spec.stoplist is SNOWBALL_STOP_DE
    assert LANGUAGE("german").stem == "de"
    with pytest.raises(NotImplementedError):
        LANGUAGE("el")
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="nope")


def test_language_de_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["Die Kinder singen in den Häusern"]), LANGUAGE("de")
    )
    # 'die'/'in'/'den' are German stopwords; the rest stem
    # (häusern: 'ern' in R1 -> häus -> umlaut strip -> haus)
    assert list(out.term) == ["kind", "sing", "haus"]


def test_language_de_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [
            (0, "die Kinder singen im Garten"),
            (1, "das Kind singt"),
            (2, "viele Häuser und Bäume"),
            (3, "des Hauses Dach"),
            (4, "ganz andere Themen"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("de")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # häuser and hauses share the stem 'haus'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_de("häuser")), limit=10,
                          optimize=False).collect())
    assert got == [2, 3]
    # kinder/kind share 'kind'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_de("kinder")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1]
    # German stopwords are not indexed
    assert s.search(Q.Term("text", "und"), limit=10,
                    optimize=False).count() == 0
