"""Snowball Hungarian stemmer + LanguageAnalyzer('hu').

Independent implementation of the PUBLISHED Snowball Hungarian algorithm
(snowballstem.org; reference surface: src/whoosh/lang/snowball/
hungarian.py via analysis/analyzers.py::LanguageAnalyzer). The reference
mount is empty, so parity is pinned by vectors hand-executed from the
published spec — each chosen to exercise one rule — plus end-to-end
index/search behavior. Hungarian is a single-region (R1) stemmer with a
digraph-aware region mark, double-consonant undoubling (incl. the
digraph doubles ccs/ggy/lly/nny/ssz/tty/zzs), and nine ordered
suffix-class steps that each run once (so a case ending, an owner
suffix, and a plural can all strip from one word).
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import SNOWBALL_STOP_HU, stem_hu

HU_VECTORS = [
    # step 1 instrumental: assimilated -val/-vel leaves a double
    # consonant which is undoubled after deleting al/el
    ("könyvvel", "könyv"),
    ("busszal", "busz"),             # ssz digraph double -> sz
    # step 2 frequent cases (delete in R1; final á/é shortens to a/e)
    ("zorgelban", "zorgel"),
    ("házában", "ház"),              # ban, then á->a, then owner 'a'
    ("kertből", "kert"),
    # step 2 + step 9 chain: accusative then plural
    ("házakat", "ház"),
    # step 9 plural with long-vowel shortening
    ("almák", "alma"),               # ák -> a ... then sing_owner 'a'? see note
    # step 6 owned
    ("babáké", "bab"),               # áké -> a, then sing_owner strips 'a'
    # step 7 singular owner
    ("zorgelunk", "zorgel"),
    # step 8 plural owner
    ("zorgeleim", "zorgel"),         # eim
    # plural bare
    ("zorgelek", "zorgel"),
    ("gyümölcsök", "gyümölcs"),      # ök after digraph-final stem
]


def test_stem_hu_vectors():
    for word, want in HU_VECTORS:
        assert stem_hu(word) == want, (word, stem_hu(word), want)


def test_stem_hu_digraph_r1():
    from whoosh_spark.lang import _hu_r1

    # word-initial vowel: R1 is after the first consonant OR DIGRAPH (the
    # digraph counts as one unit): a|gy|on -> R1 = 3, not 2
    assert _hu_r1("agyon") == 3
    # 'ss' is not a digraph (only sz would be): a|s|szony -> R1 = 2
    assert _hu_r1("asszony") == 2
    # consonant-initial word: R1 = after the first vowel
    assert _hu_r1("zorgelban") == 2
    # behavior pins: 'on' inside R1 is a case ending; a suffix starting
    # before R1 is protected ('át': t at pos 1 < r1 = 2)
    assert stem_hu("agyon") == "agy"
    assert stem_hu("át") == "át"
    # step 2 deletes the bare superessive 'n' and shortens the exposed á
    assert stem_hu("fán") == "fa"


def test_stem_hu_almak_chain():
    # ák -> a (plural with shortening) happens in step 9, which is the
    # LAST step — the exposed final 'a' survives because sing_owner
    # (step 7) already ran
    assert stem_hu("almák") == "alma"
    # but a final 'a' present before step 7 is stripped there
    assert stem_hu("alma") == "alm"


def test_snowball_stop_hu():
    for w in ("a", "az", "és", "hogy", "nem"):
        assert w in SNOWBALL_STOP_HU
    assert "zorgel" not in SNOWBALL_STOP_HU


def test_language_hu_spec():
    assert LANGUAGE("hu").stem == "hu"
    assert LANGUAGE("hu").stoplist is SNOWBALL_STOP_HU
    assert LANGUAGE("hungarian").stem == "hu"
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="magyar")


def test_language_hu_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["az zorgelban és a házakat nem"]),
        LANGUAGE("hu"),
    )
    # 'az'/'és'/'a'/'nem' are Hungarian stopwords; the rest stem
    assert list(out.term) == ["zorgel", "ház"]


def test_language_hu_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher
    from whoosh_spark.lang import stem_hu as _st

    docs = spark.createDataFrame(
        [
            (0, "házakat látok kertben"),
            (1, "ház mellett sétálok"),
            (2, "könyvvel dolgozom minden nap"),
            (3, "sok minden történik"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("hu")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # házakat and ház share the stem 'ház'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", _st("házakat")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1]
    # Hungarian stopwords are not indexed
    assert s.search(Q.Term("text", "minden"), limit=10,
                    optimize=False).count() == 0
