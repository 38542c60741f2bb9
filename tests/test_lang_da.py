"""Snowball Danish stemmer + LanguageAnalyzer('da').

Independent implementation of the PUBLISHED Snowball Danish algorithm
(snowballstem.org; reference surface: src/whoosh/lang/snowball/danish.py
via analysis/analyzers.py::LanguageAnalyzer). The reference mount is
empty, so parity is pinned by vectors hand-executed from the published
spec — each chosen to exercise one rule — plus end-to-end index/search
behavior. Danish shares the Scandinavian single-R1 window discipline
with Swedish/Norwegian and adds the unlimited igst pre-step plus the
step-4 undouble.
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import SNOWBALL_STOP_DA, stem_da

DA_VECTORS = [
    # step 1 main suffixes in R1
    ("hundens", "hund"),              # ens
    ("hundes", "hund"),               # es
    ("zorgeleret", "zorgel"),         # eret (longest-match over 'et')
    # step 1 's' with the valid s-ending look-behind — Danish famously
    # admits the vowels a, o and å, unlike Swedish/Norwegian
    ("hunds", "hund"),                # s after d
    ("videos", "video"),              # s after o — o IS a valid s-ending
    ("fokus", "fokus"),               # s after u — u is NOT
    # R1 min-3 adjustment: 'løst' starting before R1 never matches
    ("løst", "løst"),
    # step 1 + step 3 chain through 'els', then step 4 undouble with the
    # doubled consonant's first letter before R1
    ("bestemmelse", "bestem"),
    ("indtagelse", "indtag"),
    ("undersøgelse", "undersøg"),
    # step 2 consonant pairs -> drop the last letter
    ("vendt", "vend"),                # dt
    # step 3 igst pre-step (unlimited) then 'lig' in R1
    ("venligst", "ven"),
    # step 3(b) løst -> løs inside R1
    ("hjælpeløst", "hjælpeløs"),
    # invented-stem group: the derived-corpus oracle group (entry
    # danish_search_topk)
    ("zorgelerne", "zorgel"),
    ("zorgelheden", "zorgel"),
    ("zorgelets", "zorgel"),
]


def test_stem_da_vectors():
    for word, want in DA_VECTORS:
        assert stem_da(word) == want, (word, stem_da(word), want)


def test_stem_da_case_insensitive():
    assert stem_da("HUNDENS") == "hund"
    assert stem_da("Bestemmelse") == "bestem"


def test_stem_da_step3_repeats_step2():
    # after an 'els'/'ig'-class deletion step 2 runs AGAIN: an exposed
    # gd/dt/gt/kt pair inside R1 loses its last letter
    # zorgelgtig: r1=3; step 3 strips 'ig' -> zorgelgt, re-run step 2:
    # 'gt' in R1 -> zorgelg
    assert stem_da("zorgelgtig") == "zorgelg"


def test_stem_da_undouble_r1_boundary():
    # undouble fires only when the FINAL letter sits in R1: 'hytt' has
    # r1 == 3 so the last t (index 3) is in R1 -> 'hyt'; 'att' (r1 == 3 ==
    # len) keeps its double t
    assert stem_da("hytt") == "hyt"
    assert stem_da("att") == "att"


def test_snowball_stop_da():
    for w in ("og", "ikke", "hvad", "være", "sådan"):
        assert w in SNOWBALL_STOP_DA
    assert "zorgel" not in SNOWBALL_STOP_DA


def test_language_da_spec():
    assert LANGUAGE("da").stem == "da"
    assert LANGUAGE("da").stoplist is SNOWBALL_STOP_DA
    assert LANGUAGE("danish").stem == "da"
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="dk")


def test_language_da_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["og alle hundens zorgelheden"]),
        LANGUAGE("da"),
    )
    # 'og'/'alle' are Danish stopwords; the rest stem
    assert list(out.term) == ["hund", "zorgel"]


def test_language_da_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [
            (0, "hundens ejer gik tur"),
            (1, "en stor hund løb hurtigt"),
            (2, "bestemmelse om reglerne"),
            (3, "mange andre ting"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("da")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # hundens and hund share the stem 'hund'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_da("hundens")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1]
    # Danish stopwords are not indexed
    assert s.search(Q.Term("text", "mange"), limit=10,
                    optimize=False).count() == 0
