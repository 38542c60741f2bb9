"""Tier-0 analyzer parity (FIXTURES.md F4) — no Spark needed.

Expected streams follow the reference chain
RegexTokenizer(r"\\w+(\\.?\\w+)*") | LowercaseFilter | StopFilter(minsize=2,
renumber=True). The unicode/tbd rows are validated against Python `re`
semantics (the reference is pure Python, so Python `re` IS its tokenizer
engine — same \\w class).
"""

import pandas as pd

from whoosh_spark.analysis import (
    STANDARD,
    STOP_WORDS,
    AnalyzerSpec,
    analyze_series,
    analyze_text,
    postings_frame,
)


def test_f4_fixture_basic():
    assert analyze_text("The quick-brown FOX, v1.2.3!") == [
        ("quick", 0),
        ("brown", 1),
        ("fox", 2),
        ("v1.2.3", 3),
    ]


def test_f4_fixture_stop_and_minsize():
    # 'a','an','the' are stopwords; 'x' fails minsize=2; 'yz' survives at pos 0
    assert analyze_text("a an x yz the") == [("yz", 0)]


def test_f4_fixture_empty():
    assert analyze_text("") == []
    assert analyze_text("   ") == []
    assert analyze_text("...") == []


def test_unicode_and_tbd():
    # Python re \w is unicode: café/naïve/東京 are single tokens; 'tbd' is in
    # Whoosh's quirky stoplist and must be dropped.
    assert analyze_text("Café NAÏVE 東京 tbd") == [("café", 0), ("naïve", 1), ("東京", 2)]
    assert "tbd" in STOP_WORDS


def test_dotted_token_pattern():
    # \w+(\.?\w+)* joins single dots but not trailing/consecutive dots
    assert analyze_text("v1.2.3") == [("v1.2.3", 0)]
    assert analyze_text("a.b") == [("a.b", 0)]  # len 3 >= 2, not a stopword
    # "x..y" tokenizes to ['x', 'y'] (a double dot breaks the token);
    # both are single chars -> dropped by minsize=2
    assert analyze_text("x..y") == []


def test_renumbering_positions():
    # positions renumber after stopword removal (critical for phrase queries)
    assert analyze_text("the hash and join") == [("hash", 0), ("join", 1)]


def test_case_folding_after_tokenize():
    assert analyze_text("Spark SPARK spark") == [
        ("spark", 0),
        ("spark", 1),
        ("spark", 2),
    ]


def test_batch_matches_scalar():
    texts = [
        "The quick-brown FOX, v1.2.3!",
        "",
        "a an x yz the",
        "hash join hash",
        None,
    ]
    b = analyze_series(pd.Series(texts))
    per_row = [[] for _ in texts]
    for r, t, p in zip(b.row, b.term, b.pos):
        per_row[r].append((t, p))
    for i, t in enumerate(texts):
        assert per_row[i] == analyze_text(t if t is not None else "")
    lens = b.lengths()
    assert lens.tolist() == [4, 0, 1, 3, 0]


def test_postings_frame_weights_and_positions():
    pf = postings_frame(pd.Series(["hash join the hash"]))
    rows = {r.term: (r.weight, r.positions) for r in pf.itertuples()}
    assert rows == {"hash": (2.0, [0, 2]), "join": (1.0, [1])}


def test_simple_analyzer_no_stop():
    spec = AnalyzerSpec(stoplist=None, minsize=1)
    assert analyze_text("The a x", spec) == [("the", 0), ("a", 1), ("x", 2)]


def test_standard_spec_defaults():
    assert STANDARD.minsize == 2
    assert STANDARD.maxsize is None
    assert STANDARD.stoplist == STOP_WORDS


def test_accent_fold_charset_filter():
    # CharsetFilter analogue: NFKD + strip combining marks, post-lowercase
    from whoosh_spark.analysis import AnalyzerSpec, analyze_text

    spec = AnalyzerSpec(accent_fold=True)
    assert analyze_text("Café au naïve Zürich résumé", spec) == [
        ("cafe", 0), ("au", 1), ("naive", 2), ("zurich", 3), ("resume", 4)
    ]
    # folded terms are visible to the stop filter ("the" still dropped)
    assert analyze_text("the café", spec) == [("cafe", 0)]


def test_intraword_filter_splits_and_renumbers():
    from whoosh_spark.analysis import AnalyzerSpec, analyze_text

    spec = AnalyzerSpec(intraword=True)
    assert analyze_text("getUserID fooBar XMLParser x86", spec) == [
        ("get", 0), ("user", 1), ("id", 2), ("foo", 3), ("bar", 4),
        ("xml", 5), ("parser", 6), ("86", 7),
    ]


def test_intraword_series_batch():
    import pandas as pd

    from whoosh_spark.analysis import AnalyzerSpec, analyze_series

    b = analyze_series(pd.Series(["runTime2go", "", "aB"]), AnalyzerSpec(intraword=True))
    assert list(zip(b.row.tolist(), b.term.tolist(), b.pos.tolist())) == [
        (0, "run", 0), (0, "time", 1), (0, "go", 2)
    ]
    assert b.lengths().tolist() == [3, 0, 0]


# ---------------- round-2 filter surface (charset/sub/strip/reverse/
# delimited-boost/biword/shingle/path) ----------------


def test_charset_filter_custom_map():
    from whoosh_spark.analysis import AnalyzerSpec, analyze_text

    spec = AnalyzerSpec(stoplist=None, minsize=1, charmap=(("øß", "os"),))
    assert [t for t, _ in analyze_text("søss gøß", spec)] == ["soss", "gos"]


def test_charset_tokenizer_changes_boundaries():
    from whoosh_spark.analysis import AnalyzerSpec, analyze_text

    # '_' is \w, so 'ab_cd' is ONE token by default; CharsetTokenizer maps
    # it to space BEFORE tokenizing and yields two tokens
    plain = AnalyzerSpec(stoplist=None, minsize=1, charmap=(("_", " "),))
    tok = AnalyzerSpec(stoplist=None, minsize=1, charmap=(("_", " "),),
                       charmap_tokenize=True)
    assert [t for t, _ in analyze_text("ab_cd", plain)] == ["ab cd"]
    assert [t for t, _ in analyze_text("ab_cd", tok)] == ["ab", "cd"]


def test_substitution_filter():
    from whoosh_spark.analysis import SPACE_SEP, analyze_text
    from dataclasses import replace

    spec = replace(SPACE_SEP, substitutions=(("-", ""),), lowercase=True)
    assert [t for t, _ in analyze_text("Wi-Fi up-link", spec)] == ["wifi", "uplink"]


def test_comma_separated_with_strip():
    from whoosh_spark.analysis import COMMA_SEP, analyze_text

    got = analyze_text("alpha, beta ,  gamma delta ", COMMA_SEP)
    assert [t for t, _ in got] == ["alpha", "beta", "gamma delta"]
    assert [p for _, p in got] == [0, 1, 2]


def test_reverse_filter():
    from whoosh_spark.analysis import AnalyzerSpec, analyze_text

    spec = AnalyzerSpec(stoplist=None, minsize=1, reverse=True)
    assert [t for t, _ in analyze_text("abc def", spec)] == ["cba", "fed"]


def test_delimited_boost_filter():
    from whoosh_spark.analysis import AnalyzerSpec, postings_frame
    import pandas as pd

    # the delimiter must survive tokenization (Whoosh composes this filter
    # with whitespace tokenizers), so use the space-separated pattern
    spec = AnalyzerSpec(pattern=r"[^ \t\r\n]+", stoplist=None, minsize=1,
                        delimited_boost="^")
    pdf = postings_frame(pd.Series(["big^2 big small^0.5"]), spec)
    w = dict(zip(pdf["term"], pdf["weight"]))
    assert w == {"big": 3.0, "small": 0.5}
    # field length counts TOKENS, independent of boost
    from whoosh_spark.analysis import analyze_series

    b = analyze_series(pd.Series(["big^2 big small^0.5"]), spec)
    assert b.lengths().tolist() == [3]


def test_delimited_boost_field_totals_are_token_counts(spark):
    """field_length_total must be a RAW token count (reference:
    field lengths and totals are boost-independent) even though posting
    weights sum the delimited boosts — sum(weight) of 'big^2 big
    small^0.5' is 3.5, the token total is 3. Guards the avgdl the
    BM25 length normalization divides by."""
    from whoosh_spark.analysis import AnalyzerSpec
    from whoosh_spark.fields import TEXT, Schema
    from whoosh_spark.indexing import build_index

    spec = TEXT("text", analyzer=AnalyzerSpec(
        pattern=r"[^ \t\r\n]+", stoplist=None, minsize=1,
        delimited_boost="^"))
    docs = spark.createDataFrame(
        [(0, "big^2 big small^0.5"), (1, "plain words here")],
        "doc_id long, text string")
    ix = build_index(spark, docs, Schema(spec))
    assert ix.field_totals["text"] == 6.0  # 3 + 3 tokens, not 3.5 + 3


def test_biword_filter():
    from whoosh_spark.analysis import BIWORD, analyze_text

    got = analyze_text("quick brown fox", BIWORD())
    assert [t for t, _ in got] == ["quick-brown", "brown-fox"]
    assert [p for _, p in got] == [0, 1]


def test_shingle_filter_size3():
    from whoosh_spark.analysis import SHINGLES, analyze_text

    got = analyze_text("a b c d", SHINGLES(3, " "))
    assert [t for t, _ in got] == ["a b c", "b c d"]


def test_path_tokenizer():
    from whoosh_spark.analysis import PATH, analyze_text

    got = analyze_text("/usr/local/bin", PATH)
    assert [t for t, _ in got] == ["usr", "usr/local", "usr/local/bin"]
    assert analyze_text("", PATH) == []


def test_biword_does_not_cross_rows():
    import pandas as pd

    from whoosh_spark.analysis import BIWORD, analyze_series

    b = analyze_series(pd.Series(["one two", "three four"]), BIWORD())
    assert b.term.tolist() == ["one-two", "three-four"]
    assert b.row.tolist() == [0, 1]


def test_compound_word_filter():
    from whoosh_spark.analysis import AnalyzerSpec, analyze_text

    words = frozenset({"data", "base", "up", "link", "note"})
    spec = AnalyzerSpec(stoplist=None, minsize=1, compound_words=words)
    got = analyze_text("database uplink notebook", spec)
    # decomposable tokens keep the compound + subwords at the SAME position;
    # 'notebook' has no full decomposition ('book' not in the set) -> kept
    assert got == [
        ("database", 0), ("data", 0), ("base", 0),
        ("uplink", 1), ("up", 1), ("link", 1),
        ("notebook", 2),
    ]
    drop = AnalyzerSpec(stoplist=None, minsize=1, compound_words=words,
                        keep_compound=False)
    assert [t for t, _ in analyze_text("database", drop)] == ["data", "base"]


def test_fancy_preset_splits_intraword():
    from whoosh_spark.analysis import FANCY, analyze_text

    toks = [t for t, _ in analyze_text("getUserName with under_score v2", FANCY)]
    # camelCase + underscore splits, lowercased, stop/minsize applied
    assert "get" in toks and "user" in toks and "name" in toks
    assert "under" in toks and "score" in toks
    assert "with" not in toks  # stoplist still active


def test_language_preset_english_is_snowball_not_classic_porter():
    from whoosh_spark.analysis import LANGUAGE, STEMMING, analyze_text

    # the reference's LanguageAnalyzer("en") resolves the SNOWBALL
    # stemmer + snowball stoplist; "en_porter" is the classic escape hatch
    assert analyze_text("fairly skies", LANGUAGE("en")) == \
        [("fair", 0), ("sky", 1)]
    assert analyze_text("fairly skies", LANGUAGE("en_porter")) == \
        [("fairli", 0), ("ski", 1)]
    assert analyze_text("x", LANGUAGE("en_porter")) == \
        analyze_text("x", STEMMING)
    # snowball stoplist is wider than the default: 'our'/'has' stop here
    # (positions renumber after stopping, the engine's StopFilter default)
    assert analyze_text("our spark has vectors", LANGUAGE("en")) == \
        [("spark", 0), ("vector", 1)]


def test_porter2_attested_vectors():
    from whoosh_spark.lang import stem2

    vectors = {
        # exceptional forms + invariants
        "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
        "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
        "early": "earli", "only": "onli", "singly": "singl",
        "sky": "sky", "news": "news", "bias": "bias",
        "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
        "inning": "inning", "herring": "herring",
        # step 1a/1b
        "caresses": "caress", "ponies": "poni", "ties": "tie",
        "cries": "cri", "gas": "gas", "this": "this", "agreed": "agre",
        "feed": "feed", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "hoping": "hope",
        # step 1c
        "happy": "happi", "cry": "cri", "by": "by", "say": "say",
        # step 2
        "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
        "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "fairly": "fair",
        "generously": "generous", "knightly": "knight",
        # step 3 (note: 'ative' needs R2, so formative -> format via
        # step 4's 'ive', unlike classic Porter's 'form')
        "triplicate": "triplic", "formative": "format",
        "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        # step 4
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "communism",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler",
        # step 5
        "probate": "probat", "rate": "rate", "controll": "control",
        "roll": "roll", "generate": "generat",
        # end-to-end attested
        "consign": "consign", "consigned": "consign",
        "consigning": "consign", "consignment": "consign",
        "abilities": "abil", "running": "run",
    }
    bad = {w: (stem2(w), want) for w, want in vectors.items()
           if stem2(w) != want}
    assert not bad, bad


def test_language_preset_unsupported_raises():
    import pytest

    from whoosh_spark.analysis import LANGUAGE

    with pytest.raises(NotImplementedError, match="reference"):
        LANGUAGE("el")  # languages the reference does not bundle still raise


def test_unknown_stem_variant_raises():
    import pytest

    from whoosh_spark.analysis import AnalyzerSpec, analyze_text

    with pytest.raises(ValueError, match="unknown stem variant"):
        analyze_text("running", AnalyzerSpec(stem="snowball"))


def test_snowball_stoplist_is_published_data():
    from whoosh_spark.lang import SNOWBALL_STOP_EN

    # snowball stop.txt members NLTK lacks
    assert {"would", "could", "should", "cannot", "ought"} <= SNOWBALL_STOP_EN
    # NLTK-only additions must NOT be present
    assert not {"just", "don", "now", "s", "t", "will"} & SNOWBALL_STOP_EN
