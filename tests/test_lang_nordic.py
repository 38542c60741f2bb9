"""Snowball Swedish/Norwegian stemmers + LanguageAnalyzer('sv'/'no').

Independent implementations of the PUBLISHED Snowball Swedish and
Norwegian algorithms (snowballstem.org; reference surface:
src/whoosh/lang/snowball/{swedish,norwegian}.py via analysis/
analyzers.py::LanguageAnalyzer). The reference mount is empty, so parity
is pinned by vectors hand-executed from the published specs — each
chosen to exercise one rule — plus end-to-end index/search behavior.
Both stemmers search every suffix INSIDE the min-3-adjusted R1 window
(`setlimit tomark p1`); only the valid-s-ending look-behind reads
outside it.
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import (
    SNOWBALL_STOP_NO,
    SNOWBALL_STOP_SV,
    stem_no,
    stem_sv,
)

SV_VECTORS = [
    # step 1 main suffixes in R1
    ("jackor", "jack"),               # or
    ("jackorna", "jack"),             # orna
    ("flickor", "flick"),             # or
    ("klubbarna", "klubb"),           # arna
    ("dagen", "dag"),                 # en
    ("vackraste", "vackr"),           # aste
    ("spelas", "spel"),               # as
    # step 1 's' with the valid s-ending look-behind (which famously
    # includes 'o' and may sit outside R1)
    ("husets", "huset"),              # s after t
    ("radios", "radio"),              # s after o — o IS a valid s-ending
    # R1 min-3 adjustment: nothing strips inside a 3-letter prefix
    ("oss", "oss"),
    ("alla", "all"),                  # adjusted R1 still admits the final a
    # step 2 consonant pairs
    ("friskt", "frisk"),              # kt -> k
    ("trött", "trött"),               # tt not wholly inside R1 -> kept
    # step 3 residuals (+ chains through step 1)
    ("möjligheterna", "möj"),         # heterna, then lig
    ("bakelse", "bak"),               # e, then els
    ("hjälplöst", "hjälplös"),        # löst -> lös
    ("smärtfullt", "smärtfull"),      # fullt -> full
    # invented-stem group: the derived-corpus oracle group (entry
    # swedish_search_topk)
    ("zorgelarna", "zorgel"),
    ("zorgelheten", "zorgel"),
    ("zorgelerna", "zorgel"),
]

NO_VECTORS = [
    # step 1 main suffixes in R1
    ("bilene", "bil"),                # ene
    ("huset", "hus"),                 # et
    ("godhetene", "god"),             # hetene
    ("bankens", "bank"),              # ens
    # step 1 's': Norwegian admits 'k' only after a non-vowel
    ("verks", "verk"),                # s after k after r (non-vowel)
    ("maks", "maks"),                 # s after k after a (vowel) -> kept
    # step 1 erte/ert -> er
    ("forserte", "forser"),
    # step 2 dt/vt -> drop the t
    ("vondt", "vond"),
    # step 3 residual, R1-window-limited matching: 'lig' starts before
    # R1, the in-window 'ig' wins
    ("mulighetens", "mul"),
    # invented-stem group: the derived-corpus oracle group (entry
    # norwegian_search_topk)
    ("zorgelene", "zorgel"),
    ("zorgelheten", "zorgel"),
    ("zorgelens", "zorgel"),
]


def test_stem_sv_vectors():
    for word, want in SV_VECTORS:
        assert stem_sv(word) == want, (word, stem_sv(word), want)


def test_stem_no_vectors():
    for word, want in NO_VECTORS:
        assert stem_no(word) == want, (word, stem_no(word), want)


def test_stem_nordic_case_insensitive():
    assert stem_sv("JACKORNA") == "jack"
    assert stem_no("Bilene") == "bil"


def test_snowball_stop_nordic():
    for w in ("och", "att", "inte", "mycket", "varför"):
        assert w in SNOWBALL_STOP_SV
    for w in ("og", "ikke", "hvordan", "mellom", "kvifor"):
        assert w in SNOWBALL_STOP_NO
    assert "zorgel" not in SNOWBALL_STOP_SV
    assert "zorgel" not in SNOWBALL_STOP_NO


def test_language_nordic_spec():
    assert LANGUAGE("sv").stem == "sv"
    assert LANGUAGE("sv").stoplist is SNOWBALL_STOP_SV
    assert LANGUAGE("swedish").stem == "sv"
    assert LANGUAGE("no").stem == "no"
    assert LANGUAGE("no").stoplist is SNOWBALL_STOP_NO
    assert LANGUAGE("norwegian").stem == "no"
    with pytest.raises(NotImplementedError):
        LANGUAGE("el")
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="nope")


def test_language_sv_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["och alla jackorna zorgelheten"]),
        LANGUAGE("sv"),
    )
    # 'och'/'alla' are Swedish stopwords; the rest stem
    assert list(out.term) == ["jack", "zorgel"]


def test_language_no_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [
            (0, "bilene kjører fort"),
            (1, "en bil er rask"),
            (2, "godhetene varer lenge"),
            (3, "mellom andre ting"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("no")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # bilene and bil share the stem 'bil'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_no("bilene")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1]
    # Norwegian stopwords are not indexed
    assert s.search(Q.Term("text", "mellom"), limit=10,
                    optimize=False).count() == 0
