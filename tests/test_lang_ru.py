"""Snowball Russian stemmer (lang.stem_ru) + LanguageAnalyzer('ru').

Independent implementation of the PUBLISHED Snowball Russian algorithm
(snowballstem.org 'russian'; reference surface: src/whoosh/lang/snowball/
russian.py via analysis/analyzers.py::LanguageAnalyzer). The reference
mount is empty, so parity is pinned by vectors hand-executed from the
published spec — each chosen to exercise one rule of the algorithm —
plus end-to-end index/search behavior. Unlike the romance stemmers, the
whole backward pass is RV-window-limited (`setlimit tomark pV`), so the
vectors also pin the limited longest-match semantics.
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import SNOWBALL_STOP_RU, stem_ru

# (word, stem): every step / side-condition of the published algorithm
VECTORS = [
    # step 1 noun endings
    ("книга", "книг"),                # а
    ("книги", "книг"),                # и
    ("книгами", "книг"),              # ами (longest over и)
    ("технология", "технолог"),       # ия
    ("технологиями", "технолог"),     # иями (4-char longest)
    ("получении", "получен"),         # ии
    ("системы", "систем"),            # ы
    ("большинство", "большинств"),    # о (verb ло/но precondition misses)
    ("двигатель", "двигател"),        # ь
    ("процессе", "процесс"),          # е
    ("увидев", "увид"),               # ев — after PG 'в' fails its а/я test
    # step 1 adjective (+ participle inside adjectival)
    ("важная", "важн"),               # ая
    ("важный", "важн"),               # ый
    ("важного", "важн"),              # ого
    ("красивые", "красив"),           # ые (no participle behind it)
    ("большую", "больш"),             # ую
    ("строившийся", "стро"),          # ся + ий + participle ивш (group 2)
    ("искусственный", "искусствен"),  # ый; нн participle fails а/я test;
                                      # step-4 undouble fires instead
    # step 1 verb
    ("пользовались", "пользова"),     # сь + ли after а (group 1)
    ("остановиться", "останов"),      # ся + ить (group 2)
    ("существует", "существ"),        # ует
    ("избегать", "избега"),           # ть after а
    ("сделаешь", "сдела"),            # ешь after а
    ("сделайте", "сдела"),            # йте after а
    ("жизнью", "жизн"),               # ю (group 2), then step-4 ь
    ("подчеркнул", "подчеркнул"),     # л needs а/я before it; 'у' fails and
                                      # the class commits — word unchanged
    # step 1 perfective gerund
    ("прочитав", "прочита"),          # в after а (group 1)
    ("спрятавшись", "спрята"),        # вшись after а (group 1)
    ("заметивши", "замет"),           # ивши (group 2)
    # step 3 derivational (R2-gated)
    ("возможностей", "возможн"),      # ей, then ост inside R2
    ("возможность", "возможн"),       # ь, then ост inside R2
    ("скорость", "скорост"),          # ь, but ост starts BEFORE R2 — kept
    # step 4
    ("определенно", "определен"),     # noun о, then undouble нн
    ("новейший", "нов"),              # ий, then superlative ейш
    ("быстрейший", "быстр"),          # ий, then superlative ейш
    # prelude ё -> е; vowel-free word has an empty RV
    ("ёлка", "елк"),
    ("вгтрк", "вгтрк"),
    # invented-stem group: the derived-corpus oracle group (entry
    # russian_search_topk — Cyrillic works in the DuckDB mirror because
    # its prelude swaps RE2's ASCII \w for [\w\p{Cyrillic}])
    ("зоргелить", "зоргел"),
    ("зоргелов", "зоргел"),
    ("зоргелами", "зоргел"),
]


def test_stem_ru_vectors():
    for word, want in VECTORS:
        assert stem_ru(word) == want, (word, stem_ru(word), want)


def test_stem_ru_case_insensitive():
    assert stem_ru("Книгами") == "книг"
    assert stem_ru("ЁЛКА") == "елк"


def test_snowball_stop_ru():
    for w in ("и", "что", "когда", "чтобы", "конечно", "между",
              "нибудь", "впрочем"):
        assert w in SNOWBALL_STOP_RU
    assert "зоргел" not in SNOWBALL_STOP_RU


def test_language_ru_spec():
    spec = LANGUAGE("ru")
    assert spec.stem == "ru"
    assert spec.stoplist is SNOWBALL_STOP_RU
    assert LANGUAGE("russian").stem == "ru"
    with pytest.raises(NotImplementedError):
        LANGUAGE("el")
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="nope")


def test_language_ru_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["что он книгами зоргелить"]),
        LANGUAGE("ru"),
    )
    # 'что'/'он' are Russian stopwords; the rest stem
    assert list(out.term) == ["книг", "зоргел"]


def test_language_ru_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher

    docs = spark.createDataFrame(
        [
            (0, "он читает книги"),
            (1, "все эти книгами полны"),
            (2, "новейший двигатель"),
            (3, "двигатели будущего"),
            (4, "совсем другое дело"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("ru")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # книги and книгами share the stem 'книг'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_ru("книги")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1]
    # двигатель/двигатели share 'двигател'
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", stem_ru("двигатели")), limit=10,
                          optimize=False).collect())
    assert got == [2, 3]
    # Russian stopwords are not indexed
    assert s.search(Q.Term("text", "совсем"), limit=10,
                    optimize=False).count() == 0
