"""Snowball Italian stemmer (lang.stem_it) + LanguageAnalyzer('it').

Independent implementation of the PUBLISHED Snowball Italian algorithm
(snowballstem.org 'italian'; reference surface: src/whoosh/lang/snowball/
italian.py via analysis/analyzers.py::LanguageAnalyzer). The reference
mount is empty, so parity is pinned by vectors hand-executed from the
published spec — each chosen to exercise one rule of the algorithm —
plus end-to-end index/search behavior.
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import SNOWBALL_STOP_IT, stem_it

# (word, stem): every step / side-condition of the published algorithm
VECTORS = [
    # step 1 R2 groups (+ the always-on step 3a final vowel)
    ("organizzazione", "organizz"),   # azione
    ("organizzare", "organizz"),      # step 2 are — conflates
    ("comunicazione", "comun"),       # azione, then ic in R2
    ("mineralogia", "mineralog"),     # logia -> log
    ("distribuzione", "distribu"),    # uzione -> u (u survives 3a)
    ("differenza", "different"),      # enza -> ente, then 3a final e
    ("abilità", "abil"),              # ità; abil-prefix NOT in R2 -> kept
    ("generosità", "generos"),        # ità (os is NOT an ità follow-up)
    ("significativo", "signif"),      # ivo, at in R2, ic in R2
    ("rapidamente", "rapid"),         # amente in R1
    ("velocemente", "veloc"),         # mente in R2, then 3a final e
    ("responsabile", "respons"),      # abile
    ("cambiamento", "camb"),          # amento in RV, then 3a i-pair
    # step 1 fails R2 -> step 2 / step 3a take over
    ("famoso", "famos"),              # oso not in R2; 3a final o
    # step 0 attached pronouns
    ("mangiandolo", "mang"),          # lo after ando; ando then deletes
    ("vendermelo", "vend"),           # melo after er -> 'e'; ere deletes
    # step 2 verb suffixes in RV
    ("abbandonata", "abbandon"),
    ("pronunziare", "pronunz"),       # are, then 3a final i
    ("finiscono", "fin"),             # iscono
    ("finiranno", "fin"),             # iranno
    ("aiutare", "aiut"),              # prelude marks aIutare
    # step 3a final vowel + preceding i
    ("nazionale", "nazional"),
    ("nazionali", "nazional"),
    ("crocchio", "crocc"),            # 3a o then i, 3b ch -> c
    ("crocchi", "crocc"),             # 3a i, 3b ch -> c
    ("città", "citt"),                # 3a final à
    # prelude: acute -> grave, u after q
    ("perché", "perc"),               # é -> è, 3a è, 3b ch -> c
    ("quindi", "quind"),              # qU mark, 3a final i
    # invented-stem group: the derived-corpus oracle group (entry
    # italian_search_topk — ASCII because the DuckDB RE2 prelude's \\w
    # would split an accented token the Python analyzer keeps whole)
    ("zorgelazione", "zorgel"),
    ("zorgelare", "zorgel"),
    ("zorgelando", "zorgel"),
]


def test_stem_it_vectors():
    for word, want in VECTORS:
        assert stem_it(word) == want, (word, stem_it(word), want)


def test_stem_it_case_insensitive():
    assert stem_it("Organizzazione") == "organizz"


def test_snowball_stop_it():
    for w in ("di", "la", "che", "perché", "più", "è", "avrò",
              "facessimo", "stettero", "sarebbero"):
        assert w in SNOWBALL_STOP_IT
    assert "organizz" not in SNOWBALL_STOP_IT


def test_language_it_spec():
    spec = LANGUAGE("it")
    assert spec.stem == "it"
    assert spec.stoplist is SNOWBALL_STOP_IT
    assert LANGUAGE("italian").stem == "it"
    with pytest.raises(NotImplementedError):
        LANGUAGE("el")
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="nope")


def test_language_it_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["la organizzazione di questa comunicazione"]),
        LANGUAGE("it"),
    )
    # 'la'/'di'/'questa' are Italian stopwords; the rest stem
    assert list(out.term) == ["organizz", "comun"]


def test_language_it_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [
            (0, "la organizzazione del lavoro"),
            (1, "vogliono organizzare tutto"),
            (2, "le nazionali di calcio"),
            (3, "il campionato nazionale"),
            (4, "altri argomenti diversi"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("it")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # organizzazione and organizzare share the stem 'organizz'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_it("organizzazione")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1]
    # nazionali/nazionale share 'nazional'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_it("nazionali")), limit=10,
                          optimize=False).collect())
    assert got == [2, 3]
    # Italian stopwords are not indexed
    assert s.search(Q.Term("text", "della"), limit=10,
                    optimize=False).count() == 0