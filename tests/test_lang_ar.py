"""ISRI Arabic stemmer + LanguageAnalyzer('ar').

Independent implementation of the PUBLISHED ISRI algorithm (Taghva,
Elkhoury & Coombs 2005, "Arabic Stemming Without A Root Dictionary";
reference surface: src/whoosh/lang/isri.py via
lang.stemmer_for_language("ar") — the one non-snowball stemmer the
reference bundles). The reference mount is empty, so parity is pinned
by vectors hand-executed from the paper's affix classes and pattern
(awzan) tables — each chosen to exercise one rule — plus end-to-end
index/search behavior. ISRI extracts the 3- or 4-letter root:
diacritic removal, length-3/2 prefix+suffix classes, the connective-waw
rule, initial-hamza normalization, then per-length pattern matching.
"""

import pytest

from whoosh_spark.analysis import LANGUAGE, AnalyzerSpec, analyze_series
from whoosh_spark.lang import STOP_AR, stem_ar

AR_VECTORS = [
    # prefix classes: definite article and its fused forms
    ("الكتاب", "كتب"),      # al- removed, then فعال pattern -> root
    ("والزرجل", "زرجل"),    # wal- (3-letter prefix class)
    ("الزرجل", "زرجل"),     # al- (2-letter prefix class)
    # suffix classes
    ("زرجلون", "زرجل"),     # -un masculine plural (2-letter suffix)
    ("زرجلها", "زرجل"),     # -ha possessive
    # awzan pattern extraction (3-letter root فعل)
    ("استفعل", "فعل"),      # istaf'ala (6-letter, است prefix pattern)
    ("مفعول", "فعل"),       # maf'ul (5-letter)
    ("افتعال", "فعل"),      # ifti'al (6-letter)
    ("فاعل", "فعل"),        # fa'il (4-letter, medial alif)
    ("مكتبة", "كتب"),       # maktaba (مفعلة): root ktb
    ("انفعل", "فعل"),       # infa'ala (انفعل)
    ("تفعيل", "فعل"),       # taf'il
    # guards: a word too short for its affix class keeps it
    ("الفن", "الفن"),       # len 4 < 5: al- NOT removed... then pro_w4
]


def test_stem_ar_vectors():
    for word, want in AR_VECTORS[:-1]:
        assert stem_ar(word) == want, (word, stem_ar(word), want)


def test_stem_ar_short_word_guard():
    # len-4 word: the 2-letter prefix class needs len >= 5, so the
    # article survives into the pattern step; pro_w4 sees الفن with
    # word[1] = ل not in its tables ... word[2] = ف not in اوي,
    # word[3] = ن not ة -> suf1 (final ن IS in s1) -> الف
    assert stem_ar("الفن") == "الف"


def test_stem_ar_diacritics_and_hamza():
    # diacritics strip first; initial hamza forms normalize to bare alif
    assert stem_ar("كَتَبَ") == "كتب"
    assert stem_ar("أفتعال"[0] + "فتعال") == stem_ar("افتعال")


def test_stem_ar_connective_waw():
    # an initial وو loses one و (w-w -> w) when length allows
    assert stem_ar("ووصول") == stem_ar("وصول")


def test_stem_ar_isri_stop_passthrough():
    # the ISRI exception list returns high-frequency function words
    # unstemmed
    assert stem_ar("اليوم") == "اليوم"
    assert stem_ar("كذلك") == "كذلك"


def test_stop_ar():
    for w in ("من", "في", "على", "هذا", "التي"):
        assert w in STOP_AR
    assert "زرجل" not in STOP_AR


def test_language_ar_spec():
    assert LANGUAGE("ar").stem == "ar"
    assert LANGUAGE("ar").stoplist is STOP_AR
    assert LANGUAGE("arabic").stem == "ar"
    with pytest.raises(ValueError):
        AnalyzerSpec(stem="arabic")


def test_language_ar_chain():
    import pandas as pd

    out = analyze_series(
        pd.Series(["في الكتاب من زرجلون"]),
        LANGUAGE("ar"),
    )
    # 'في'/'من' are Arabic stopwords; the rest root-extract
    assert list(out.term) == ["كتب", "زرجل"]


def test_language_ar_end_to_end(spark):
    from whoosh_spark import query as Q
    from whoosh_spark.fields import ID, TEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search import Searcher
    from whoosh_spark.lang import stem_ar as _st

    docs = spark.createDataFrame(
        [
            (0, "قرأت الكتاب المفيد"),
            (1, "كتاب جديد وصل"),
            (2, "مكتبة المدينة كبيرة"),
            (3, "أشياء أخرى تماما"),
        ],
        "doc_id long, text string",
    )
    schema = Schema(ID("doc_id"), TEXT("text", analyzer=LANGUAGE("ar")))
    ix = build_index(spark, docs, schema)
    s = Searcher(ix)
    # الكتاب / كتاب / مكتبة all extract the root كتب
    got = sorted(r.doc_id for r in
                 s.search(Q.Term("text", _st("الكتاب")), limit=10,
                          optimize=False).collect())
    assert got == [0, 1, 2]
