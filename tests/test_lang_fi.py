"""Snowball Finnish stemmer + LanguageAnalyzer('fi').

Independent implementation of the PUBLISHED Snowball Finnish algorithm
(snowballstem.org; reference surface: src/whoosh/lang/snowball/
finnish.py via analysis/analyzers.py::LanguageAnalyzer). The reference
mount is empty, so parity is pinned by vectors hand-executed from the
published spec — each chosen to exercise one rule — plus end-to-end
index/search behavior. Finnish is the agglutinative two-region shape:
particle / possessive / case / comparative steps, an i- or t-plural
selected by whether a CASE ending was removed, and a tidy pass whose
look-behinds honour Snowball's setlimit-to-R1 window (a condition
character before R1 is unreadable and fails its test).
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import SNOWBALL_STOP_FI, stem_fi

FI_VECTORS = [
    # step 1 particles (look-behind: vowel, n or t)
    ("kirjakin", "kirj"),            # kin, then tidy final a
    # step 2 possessives
    ("talossaan", "talo"),           # an after ssa, then case ssa
    ("edeltäjiensä", "edeltäjie"),   # nsä; the remainder has no case ending
    ("talosi", "talo"),              # si not preceded by k
    ("vastaukseni", "vastau"),       # ni with kse -> ksi, then case ksi
    ("talolleen", "talo"),           # en after lle, then case lle
    # step 3 cases
    ("taloissa", "talo"),            # ssa, then i-plural
    ("taloon", "talo"),              # n, then a long vowel loses a letter
    ("valtioiden", "valtio"),        # den preceded by Vi, then i-plural
    ("huoneeseen", "huone"),         # seen preceded by a long vowel
    ("perheettä", "perh"),           # ttä preceded by e; tidy ee + e
    ("maahan", "maahan"),            # hVn outside R1 is protected
    # step 5 t-plural (no case removed) exposing the superlative
    ("kirjat", "kirj"),
    ("suurimmat", "suurim"),         # t, then tidy a + undouble mm
    ("kalleimmat", "kalleim"),
    # step 4 comparative outside R2 is protected; tidy still fires
    ("suurempi", "suuremp"),
    # tidy window semantics: the look-behind consonant sits before R1,
    # so the final 'a' survives
    ("pojan", "poja"),
    # sti in R2 fails for short words (R2 starts after it)
    ("nopeasti", "nopeast"),
    # invented-stem group: the derived-corpus oracle group (entry
    # finnish_search_topk)
    ("zorgelossa", "zorgelo"),
    ("zorgeloissa", "zorgelo"),
    ("zorgelot", "zorgelo"),
]


def test_stem_fi_vectors():
    for word, want in FI_VECTORS:
        assert stem_fi(word) == want, (word, stem_fi(word), want)


def test_stem_fi_case_insensitive():
    assert stem_fi("TALOISSA") == "talo"
    assert stem_fi("Kirjat") == "kirj"


def test_stem_fi_double_consonant_tidy():
    # "a double consonant followed by zero or more vowels loses its last
    # consonant" — the spec's own examples
    assert stem_fi("eläkk") == "eläk"
    assert stem_fi("aatonaatto") == "aatonaato"


def test_stem_fi_si_window_edge():
    # 'si' requires NOT preceded by k; at the window edge the look-behind
    # is unreadable, which counts as success for a negated test: 'maksi'
    # has r1 = 3 so the k at index 2 is invisible and si IS deleted
    assert stem_fi("maksi") == "mak"
    assert stem_fi("koskenlaskusi") == "koskenlasku"   # u precedes: deleted
    # an IN-window k blocks the possessive, and the case ending 'ksi'
    # (which subsumes it) strips all three letters instead
    assert stem_fi("zorgeloksi") == "zorgelo"


def test_snowball_stop_fi():
    for w in ("olla", "on", "ei", "ja", "että", "minä"):
        assert w in SNOWBALL_STOP_FI
    assert "zorgelo" not in SNOWBALL_STOP_FI


def test_language_fi_spec():
    assert LANGUAGE("fi").stem == "fi"
    assert LANGUAGE("fi").stoplist is SNOWBALL_STOP_FI
    assert LANGUAGE("finnish").stem == "fi"
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="suomi")
    # the snowball family is now COMPLETE: only languages the
    # reference does not bundle raise
    with pytest.raises(NotImplementedError):
        LANGUAGE("el")


def test_language_fi_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["on zorgelossa ja taloissa ei"]),
        LANGUAGE("fi"),
    )
    # 'on'/'ja'/'ei' are Finnish stopwords; the rest stem
    assert list(out.term) == ["zorgelo", "talo"]


def test_language_fi_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher
    from whoosh_spark.lang import stem_fi as _st

    docs = spark.createDataFrame(
        [
            (0, "taloissa asuu ihmisiä"),
            (1, "talo seisoo mäellä"),
            (2, "kirjat ovat pöydällä"),
            (3, "paljon muita asioita siellä"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("fi")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # taloissa and talo share the stem 'talo'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", _st("taloissa")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1]
    # Finnish stopwords are not indexed
    assert s.search(Q.Term("text", "siellä"), limit=10,
                    optimize=False).count() == 0


def test_language_tr_stopwords_only():
    # the reference bundles Turkish stopwords but no Turkish stemmer —
    # LanguageAnalyzer('tr') is tokenize|lowercase|stop with NO stemming
    # (the NoStemmer skip path)
    import pandas as pd

    from whoosh_spark.lang import STOP_TR

    spec = LANGUAGE("tr")
    assert spec.stem is False
    assert spec.stoplist is STOP_TR
    out = analyze_series(pd.Series(["bu evler ve arabalar"]), spec)
    # 'bu'/'ve' are Turkish stopwords; the rest pass through UNstemmed
    assert list(out.term) == ["evler", "arabalar"]
