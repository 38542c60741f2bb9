"""Whoosh-parity text analysis as vectorized pandas operations.

Mirrors the reference's default TEXT chain
``RegexTokenizer | LowercaseFilter | StopFilter`` (= StandardAnalyzer):

- RegexTokenizer: full regex matches of ``\\w+(\\.?\\w+)*`` (UNICODE) over the
  *original* text (reference: src/whoosh/analysis/tokenizers.py::RegexTokenizer
  ~L60, default_pattern ~L30). We use the non-capturing equivalent
  ``\\w+(?:\\.?\\w+)*`` so pandas ``str.findall`` returns full matches.
- LowercaseFilter: Python ``str.lower`` per token (reference:
  src/whoosh/analysis/filters.py::LowercaseFilter ~L120). Applied *after*
  tokenization, like the reference chain — tokenize(lower(s)) is NOT always
  identical under unicode case folding.
- StopFilter(stoplist=STOP_WORDS, minsize=2, maxsize=None, renumber=True):
  drops stopwords and tokens shorter than minsize, then renumbers surviving
  positions consecutively (reference:
  src/whoosh/analysis/filters.py::StopFilter ~L160).

Everything here is pandas/numpy only (no Spark imports) so the same code
runs inside pandas UDFs on executors and directly in unit tests. The per-row
invariant (BASELINE.json::input_hint): vectorized pandas/Arrow batches, no
row-at-a-time Python UDFs.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# Reference: src/whoosh/analysis/filters.py::STOP_WORDS (~L20). Note the
# quirky 'tbd' — rank parity breaks on any membership diff (SURVEY.md A.2).
STOP_WORDS = frozenset(
    (
        "a", "an", "and", "are", "as", "at", "be", "by", "can", "for",
        "from", "have", "if", "in", "is", "it", "may", "not", "of", "on",
        "or", "tbd", "that", "the", "this", "to", "us", "we", "when",
        "will", "with", "yet", "you", "your",
    )
)

# Non-capturing form of Whoosh's default ``\w+(\.?\w+)*`` (same language).
DEFAULT_TOKEN_PATTERN = r"\w+(?:\.?\w+)*"
_DEFAULT_RE = re.compile(DEFAULT_TOKEN_PATTERN, re.UNICODE)


@dataclass(frozen=True)
class AnalyzerSpec:
    """Config for the standard chain; presets below mirror
    src/whoosh/analysis/analyzers.py (~L60-240). ``ngram=(lo, hi)`` appends
    an NgramFilter stage (char n-grams of each surviving token, reference:
    src/whoosh/analysis/ngrams.py::NgramFilter ~L120; each gram keeps its
    source token's position).

    Stage order (fixed, documented — Whoosh chains compose explicitly; this
    covers the orderings its built-in analyzers actually use):
    tokenize [charmap_tokenize] -> intraword -> strip -> lowercase ->
    accent_fold/charmap -> substitutions -> reverse -> delimited boost ->
    stop/minsize -> stem -> biword/shingle -> ngram.
    """

    pattern: str = DEFAULT_TOKEN_PATTERN
    lowercase: bool = True
    stoplist: frozenset[str] | None = STOP_WORDS
    minsize: int = 2
    maxsize: int | None = None
    ngram: tuple[int, int] | None = None
    # StemFilter after the stop filter: True/"porter" = classic Porter
    # (StemmingAnalyzer), "porter2" = English Snowball (what the
    # reference's LanguageAnalyzer("en") selects via
    # lang.stemmer_for_language)
    stem: "bool | str" = False
    # CharsetFilter analogue (src/whoosh/analysis/filters.py::CharsetFilter
    # with the accent map): NFKD-decompose + strip combining marks, applied
    # right after lowercasing so stop/minsize filters see folded terms
    accent_fold: bool = False
    # IntraWordFilter (src/whoosh/analysis/intraword.py::IntraWordFilter
    # ~L30): split camelCase / letter-digit runs into subword tokens before
    # lowercasing; positions renumber over the split stream
    intraword: bool = False
    # CharsetFilter with a CUSTOM char map (reference: filters.py::
    # CharsetFilter, support/charset.py) — ((from_chars, to_chars), ...)
    # pairs applied per token via str.translate; charmap_tokenize=True also
    # applies the map to the RAW text before tokenizing (CharsetTokenizer,
    # tokenizers.py::CharsetTokenizer ~L200 — mapping can change token
    # boundaries there)
    charmap: tuple[tuple[str, str], ...] | None = None
    charmap_tokenize: bool = False
    # SubstitutionFilter(pattern, replacement) (filters.py::
    # SubstitutionFilter ~L240), applied in order
    substitutions: tuple[tuple[str, str], ...] | None = None
    # StripFilter (filters.py::StripFilter): strip whitespace per token
    strip: bool = False
    # ReverseTextFilter (filters.py::ReverseTextFilter): reverse each token
    reverse: bool = False
    # DelimitedAttributeFilter(delimiter, 'boost') (filters.py::
    # DelimitedAttributeFilter ~L280): 'word^2' -> token 'word' with
    # boost 2.0; boosts sum into the posting weight like the reference's
    # format weight = sum of token boosts
    delimited_boost: str | None = None
    # BiWordFilter(sep) / ShingleFilter(size, sep) (analysis/morph? ->
    # src/whoosh/analysis/intraword.py::BiWordFilter ~L300, ShingleFilter):
    # emit joins of ``shingle_size`` consecutive tokens
    shingle_size: int | None = None
    shingle_sep: str = "-"
    # CompoundWordFilter(wordset, keep_compound) (intraword.py::
    # CompoundWordFilter ~L260): split tokens decomposable into dictionary
    # words; subwords share the source token's position
    compound_words: frozenset[str] | None = None
    keep_compound: bool = True
    # DoubleMetaphoneFilter (analysis/morph.py ~L80 over lang/dmetaphone.py):
    # replace each token with its phonetic code(s); primary + secondary
    # share the source position (sounds-like search fields)
    dmetaphone: bool = False
    # PathTokenizer (tokenizers.py::PathTokenizer ~L240): progressive path
    # prefixes of a '/'-separated value (replaces ``pattern``)
    path: bool = False

    def __post_init__(self):
        # fail at CONSTRUCTION, on the driver — an unknown stemmer name
        # must never reach the executor-side analyzer (where it would
        # surface as retried task failures), nor silently fall back
        if self.stem not in (False, True, "porter", "porter2", "de", "es",
                             "fr", "it", "pt", "ru", "sv", "no", "da",
                             "nl", "ro", "hu", "fi", "ar"):
            raise ValueError(
                f"unknown stem variant {self.stem!r}: use True/'porter', "
                "'porter2', 'de', 'es', 'fr', 'it', 'pt', 'ru', 'sv', "
                "'no', 'da', 'nl', 'ro', 'hu', 'fi', or 'ar'"
            )

    def compiled(self) -> re.Pattern:
        return re.compile(self.pattern, re.UNICODE)

    def trans_table(self) -> dict | None:
        if self.charmap is None:
            return None
        table: dict[int, str] = {}
        for src, dst in self.charmap:
            table.update(str.maketrans(src, dst))
        return table


_INTRAWORD_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|\d+")
_COMBINING_RE = "[\\u0300-\\u036f]+"  # Combining Diacritical Marks block


STANDARD = AnalyzerSpec()
SIMPLE = AnalyzerSpec(stoplist=None, minsize=1)  # SimpleAnalyzer: no stop filter
# StemmingAnalyzer: RegexTokenizer | Lowercase | Stop | StemFilter
# (reference: analysis/analyzers.py::StemmingAnalyzer ~L180)
STEMMING = AnalyzerSpec(stem=True)


def NGRAM_WORDS(minsize: int = 3, maxsize: int = 3) -> AnalyzerSpec:
    """NgramWordAnalyzer: tokenize | lowercase | char n-grams, no stop
    filter (reference: analysis/analyzers.py::NgramWordAnalyzer ~L230)."""
    return AnalyzerSpec(stoplist=None, minsize=1, ngram=(minsize, maxsize))


# Tokenizer presets (reference: analysis/tokenizers.py): each is the bare
# tokenizer as an analyzer — compose filters by replacing fields.
SPACE_SEP = AnalyzerSpec(pattern=r"[^ \t\r\n]+", lowercase=False,
                         stoplist=None, minsize=1)
COMMA_SEP = AnalyzerSpec(pattern=r"[^,]+", strip=True, lowercase=False,
                         stoplist=None, minsize=1)
PATH = AnalyzerSpec(path=True, lowercase=False, stoplist=None, minsize=1)
# KeywordAnalyzer(lowercase=True) analogue for simple keyword fields
KEYWORD_LOWER = AnalyzerSpec(pattern=r"[^ \t\r\n]+", lowercase=True,
                             stoplist=None, minsize=1)


def BIWORD(sep: str = "-") -> AnalyzerSpec:
    """BiWordFilter chain: tokenize | lowercase | biword join (reference:
    analysis/intraword.py::BiWordFilter — merges adjacent token pairs to
    make phrase-ish searching cheap)."""
    return AnalyzerSpec(stoplist=None, minsize=1, shingle_size=2, shingle_sep=sep)


def SHINGLES(size: int, sep: str = " ") -> AnalyzerSpec:
    """ShingleFilter chain (reference: analysis/intraword.py::ShingleFilter)."""
    return AnalyzerSpec(stoplist=None, minsize=1, shingle_size=size, shingle_sep=sep)


# FancyAnalyzer: RegexTokenizer | IntraWordFilter | LowercaseFilter |
# StopFilter (reference: analysis/analyzers.py::FancyAnalyzer ~L200 —
# the camelCase/underscore-splitting chain)
FANCY = AnalyzerSpec(intraword=True)


def LANGUAGE(lang: str = "en") -> AnalyzerSpec:
    """LanguageAnalyzer analogue (reference: analysis/analyzers.py::
    LanguageAnalyzer ~L220: tokenize | lowercase | StopFilter(lang) |
    StemFilter(lang)). For English the reference resolves the SNOWBALL
    (Porter2) stemmer and the Snowball English stoplist via
    lang.stemmer_for_language — NOT the classic Porter/default-stoplist
    chain StemmingAnalyzer uses — so that is what this preset selects
    (lang.py::stem2 + SNOWBALL_STOP_EN). ``"en_porter"`` mirrors the
    reference's classic-Porter escape hatch. German, Spanish, French,
    Italian, Portuguese, Russian, Swedish, Norwegian, Danish, Dutch,
    Romanian, Hungarian, and Finnish ship the same way — the COMPLETE
    Snowball family the reference bundles (lang.py::stem_de/_es/_fr/
    _it/_pt/_ru/_sv/_no/_da/_nl/_ro/_hu/_fi + their SNOWBALL_STOP_*
    lists — the published Snowball
    algorithms + stoplists, independently implemented). Other
    languages would need their snowball stemmer and stoplist ported
    (reference: lang/snowball/, lang/stopwords.py) — they raise instead
    of silently degrading (COVERAGE.md notes the gap)."""
    from whoosh_spark.lang import (
        SNOWBALL_STOP_DA,
        SNOWBALL_STOP_DE,
        SNOWBALL_STOP_EN,
        SNOWBALL_STOP_ES,
        SNOWBALL_STOP_FI,
        SNOWBALL_STOP_FR,
        SNOWBALL_STOP_HU,
        SNOWBALL_STOP_IT,
        SNOWBALL_STOP_NL,
        SNOWBALL_STOP_NO,
        SNOWBALL_STOP_PT,
        SNOWBALL_STOP_RO,
        SNOWBALL_STOP_RU,
        SNOWBALL_STOP_SV,
    )

    if lang == "en_porter":
        return AnalyzerSpec(stem=True)
    if lang in ("de", "de_DE", "german"):
        return AnalyzerSpec(stem="de", stoplist=SNOWBALL_STOP_DE)
    if lang in ("es", "es_ES", "spanish"):
        return AnalyzerSpec(stem="es", stoplist=SNOWBALL_STOP_ES)
    if lang in ("fr", "fr_FR", "french"):
        return AnalyzerSpec(stem="fr", stoplist=SNOWBALL_STOP_FR)
    if lang in ("it", "it_IT", "italian"):
        return AnalyzerSpec(stem="it", stoplist=SNOWBALL_STOP_IT)
    if lang in ("pt", "pt_BR", "pt_PT", "portuguese"):
        return AnalyzerSpec(stem="pt", stoplist=SNOWBALL_STOP_PT)
    if lang in ("ru", "ru_RU", "russian"):
        return AnalyzerSpec(stem="ru", stoplist=SNOWBALL_STOP_RU)
    if lang in ("sv", "sv_SE", "swedish"):
        return AnalyzerSpec(stem="sv", stoplist=SNOWBALL_STOP_SV)
    if lang in ("no", "nb", "nn", "no_NO", "norwegian"):
        return AnalyzerSpec(stem="no", stoplist=SNOWBALL_STOP_NO)
    if lang in ("da", "da_DK", "danish"):
        return AnalyzerSpec(stem="da", stoplist=SNOWBALL_STOP_DA)
    if lang in ("nl", "nl_NL", "nl_BE", "dutch"):
        return AnalyzerSpec(stem="nl", stoplist=SNOWBALL_STOP_NL)
    if lang in ("ro", "ro_RO", "romanian"):
        return AnalyzerSpec(stem="ro", stoplist=SNOWBALL_STOP_RO)
    if lang in ("hu", "hu_HU", "hungarian"):
        return AnalyzerSpec(stem="hu", stoplist=SNOWBALL_STOP_HU)
    if lang in ("fi", "fi_FI", "finnish"):
        return AnalyzerSpec(stem="fi", stoplist=SNOWBALL_STOP_FI)
    if lang in ("tr", "tr_TR", "turkish"):
        # the reference has Turkish STOPWORDS but no Turkish stemmer;
        # its LanguageAnalyzer composes tokenize|lowercase|stop only
        # (the try/except NoStemmer path) — mirror that exactly
        from whoosh_spark.lang import STOP_TR
        return AnalyzerSpec(stem=False, stoplist=STOP_TR)
    if lang in ("ar", "ar_SA", "arabic"):
        # the reference's stemmer_for_language("ar") selects the ISRI
        # root-extraction stemmer (lang/isri.py), not a snowball class
        from whoosh_spark.lang import STOP_AR
        return AnalyzerSpec(stem="ar", stoplist=STOP_AR)
    if lang not in ("en", "en_US", "english"):
        raise NotImplementedError(
            f"LanguageAnalyzer({lang!r}): EVERY language the reference "
            "bundles is implemented — the 14 snowball languages, ISRI "
            "Arabic, and stopword-only Turkish; other languages have no "
            "stemmer/stoplist data in the reference either"
        )
    return AnalyzerSpec(stem="porter2", stoplist=SNOWBALL_STOP_EN)


_STEM_FN_NAMES = {
    True: "stem", "porter": "stem", "porter2": "stem2",
    "de": "stem_de", "es": "stem_es", "fr": "stem_fr", "it": "stem_it",
    "pt": "stem_pt", "ru": "stem_ru", "sv": "stem_sv", "no": "stem_no",
    "da": "stem_da", "nl": "stem_nl", "ro": "stem_ro", "hu": "stem_hu",
    "fi": "stem_fi", "ar": "stem_ar",
}


@functools.lru_cache(maxsize=None)
def _stemmer_for(variant):
    """Resolve a stem-variant name to its (pure) stemmer, wrapped in the
    reference StemFilter's LRU (cachesize=50000 — morph.py::StemFilter
    default) so repeated Arrow batches in one worker process reuse
    stems across calls. An unknown name must NOT silently fall back to
    classic Porter — the index would quietly diverge."""
    name = _STEM_FN_NAMES.get(variant)
    if name is None:
        raise ValueError(
            f"unknown stem variant {variant!r}: use True/'porter', "
            "'porter2', 'de', 'es', 'fr', 'it', 'pt', 'ru', 'sv', "
            "'no', 'da', 'nl', 'ro', 'hu', 'fi', or 'ar'"
        )
    import whoosh_spark.lang as _lang

    return functools.lru_cache(maxsize=50000)(getattr(_lang, name))


@dataclass(frozen=True)
class AnalyzedBatch:
    """Flat (row, term, pos) view of an analyzed batch of texts.

    ``row`` indexes into the input series' positional order; ``pos`` is the
    renumbered token position after stop filtering (StopFilter(renumber=True)).
    """

    row: np.ndarray  # int64
    term: np.ndarray  # object (str)
    pos: np.ndarray  # int64
    n_rows: int
    # per-token boost (DelimitedAttributeFilter); None = all 1.0
    boost: np.ndarray | None = None

    def lengths(self) -> np.ndarray:
        """Post-filter token count per input row (the Whoosh field length)."""
        out = np.zeros(self.n_rows, dtype=np.int64)
        if self.row.size:
            uniq, counts = np.unique(self.row, return_counts=True)
            out[uniq] = counts
        return out


def analyze_series(texts: pd.Series, spec: AnalyzerSpec = STANDARD) -> AnalyzedBatch:
    """Run the analyzer chain over a batch of texts, vectorized.

    pandas str ops give C-level tokenize/lower/mask; positions are
    renumbered with a groupby cumcount, exactly StopFilter(renumber=True).
    """
    texts = texts.reset_index(drop=True).fillna("")
    n_rows = len(texts)

    def _empty():
        e = np.empty(0, dtype=np.int64)
        return AnalyzedBatch(e, np.empty(0, dtype=object), e, n_rows)

    table = spec.trans_table()
    if table is not None and spec.charmap_tokenize:
        # CharsetTokenizer: the map applies to the RAW text (can merge or
        # split token boundaries), then tokenization proceeds normally
        texts = texts.str.translate(table)
    if spec.path:
        # PathTokenizer: progressive '/'-prefixes; one C-level slice+join
        # per depth level, never per-row Python
        parts = texts.str.strip("/").str.split("/")
        depth = parts.str.len().fillna(0).astype(int)
        max_d = int(depth.max()) if n_rows else 0
        cols = []
        for d in range(1, max_d + 1):
            pref = parts[depth >= d].str[:d].str.join("/")
            cols.append(pref)
        flat = pd.concat(cols).sort_index(kind="stable") if cols else pd.Series([], dtype=object)
    else:
        toks = texts.str.findall(spec.compiled())
        flat = toks.explode()
        flat = flat[flat.notna()]
    if len(flat) == 0:
        return _empty()
    if spec.intraword:
        flat = flat.str.findall(_INTRAWORD_RE).explode()
        flat = flat[flat.notna()]
        if len(flat) == 0:
            return _empty()
    if spec.strip:
        flat = flat.str.strip()
        flat = flat[flat.str.len() > 0]
    if spec.lowercase:
        flat = flat.str.lower()
    if spec.accent_fold:
        flat = flat.str.normalize("NFKD").str.replace(_COMBINING_RE, "", regex=True)
    if table is not None and not spec.charmap_tokenize:
        flat = flat.str.translate(table)  # CharsetFilter (per-token map)
    if spec.substitutions:
        for pat, repl in spec.substitutions:  # SubstitutionFilter chain
            flat = flat.str.replace(pat, repl, regex=True)
        flat = flat[flat.str.len() > 0]
    if spec.reverse:
        flat = flat.str[::-1]  # ReverseTextFilter
    boosts: pd.Series | None = None
    if spec.delimited_boost is not None:
        # DelimitedAttributeFilter(delim, 'boost'): 'word^2.5' -> boost 2.5
        d = re.escape(spec.delimited_boost)
        m = flat.str.extract(rf"^(.*?)(?:{d}(\d+(?:\.\d+)?))?$", expand=True)
        flat = m[0]
        boosts = pd.to_numeric(m[1], errors="coerce").fillna(1.0)
    keep = flat.str.len() >= spec.minsize
    if spec.maxsize is not None:
        keep &= flat.str.len() <= spec.maxsize
    if spec.stoplist is not None:
        keep &= ~flat.isin(spec.stoplist)
    kept = flat[keep]
    if boosts is not None:
        boosts = boosts[keep.to_numpy()]
    if spec.stem:
        # stem per UNIQUE term (zipfian batches -> tiny vocabulary),
        # vectorized via Series.map; _stemmer_for adds the reference's
        # cross-call StemFilter LRU (cachesize=50000) per worker process
        _stem = _stemmer_for(spec.stem)
        mapping = {u: _stem(u) for u in pd.unique(kept)}
        kept = kept.map(mapping)
    if spec.shingle_size is not None and spec.shingle_size > 1:
        # BiWord/ShingleFilter: join n consecutive same-row tokens; the
        # shingle takes the FIRST token's renumbered position
        n = spec.shingle_size
        joined = kept.copy()
        ok = np.ones(len(kept), dtype=bool)
        for step in range(1, n):
            nxt = kept.groupby(level=0).shift(-step)
            ok &= nxt.notna().to_numpy()
            # positional concat (indexes are non-unique row labels; pandas
            # index alignment is undefined there, numpy concat is not)
            joined = pd.Series(
                joined.to_numpy(dtype=object)
                + np.full(len(joined), spec.shingle_sep, dtype=object)
                + nxt.fillna("").to_numpy(dtype=object),
                index=kept.index,
            )
        kept = joined[ok]
        boosts = None  # shingles reset per-token boosts (Whoosh: boost 1.0)
        if len(kept) == 0:
            return _empty()
    if spec.dmetaphone:
        # encode per UNIQUE term (memoized, same trick as stem); both codes
        # emitted at the source token's position
        from whoosh_spark.dmetaphone import dmetaphone_codes

        pos0 = kept.groupby(level=0).cumcount()
        mapping = {u: dmetaphone_codes(u) for u in pd.unique(kept)}
        dfm = pd.DataFrame({"t": kept.map(mapping), "p": pos0}).explode("t")
        dfm = dfm[dfm["t"].notna() & (dfm["t"] != "")]
        kept, boosts = dfm["t"], None
        if len(kept) == 0:
            return _empty()
        pos = dfm["p"].astype(np.int64)
        return AnalyzedBatch(
            row=kept.index.to_numpy(dtype=np.int64),
            term=kept.to_numpy(dtype=object),
            pos=pos.to_numpy(dtype=np.int64),
            n_rows=n_rows,
        )
    pos = kept.groupby(level=0).cumcount()
    if spec.compound_words is not None:
        # split per UNIQUE term (memoized, the stem-filter trick); subwords
        # share the source token's position like the reference filter
        mapping = {
            u: _compound_split(u, spec.compound_words, spec.keep_compound)
            for u in pd.unique(kept)
        }
        df = pd.DataFrame({"t": kept.map(mapping), "p": pos}).explode("t")
        kept, pos = df["t"], df["p"].astype(np.int64)
        boosts = None
    if spec.ngram is not None:
        return _ngram_expand(kept, pos, spec.ngram, n_rows)
    return AnalyzedBatch(
        row=kept.index.to_numpy(dtype=np.int64),
        term=kept.to_numpy(dtype=object),
        pos=pos.to_numpy(dtype=np.int64),
        n_rows=n_rows,
        boost=boosts.to_numpy(dtype=np.float64) if boosts is not None else None,
    )


def _compound_subwords(s: str, wordset: frozenset, memo: dict) -> list[str] | None:
    """Greedy-recursive dictionary decomposition (reference: intraword.py::
    CompoundWordFilter.subwords): first prefix in the wordset whose
    remainder also decomposes wins; None = not decomposable."""
    if s in wordset:
        return [s]
    if s in memo:
        return memo[s]
    memo[s] = None  # guard against cycles while recursing
    for i in range(1, len(s)):
        if s[:i] in wordset:
            rest = _compound_subwords(s[i:], wordset, memo)
            if rest is not None:
                memo[s] = [s[:i]] + rest
                return memo[s]
    return None


def _compound_split(term: str, wordset: frozenset, keep: bool) -> list[str]:
    sub = _compound_subwords(term, wordset, {})
    if sub is None or sub == [term]:
        return [term]
    return [term] + sub if keep else sub


def _ngram_expand(kept: pd.Series, pos: pd.Series, sizes: tuple[int, int],
                  n_rows: int) -> AnalyzedBatch:
    """NgramFilter stage, vectorized: for each gram size n and start
    offset, one str.slice over ALL tokens at once (token lengths are small,
    so sizes x offsets is a short loop of C-level slices, never per-token
    Python)."""
    lo, hi = sizes
    rows = kept.index.to_numpy(dtype=np.int64)
    positions = pos.to_numpy(dtype=np.int64)
    lens = kept.str.len().to_numpy()
    parts_row, parts_term, parts_pos = [], [], []
    max_len = int(lens.max()) if lens.size else 0
    for n in range(lo, hi + 1):
        for off in range(0, max(max_len - n + 1, 0)):
            grams = kept.str.slice(off, off + n)
            ok = lens >= off + n
            if not ok.any():
                continue
            parts_row.append(rows[ok])
            parts_term.append(grams.to_numpy(dtype=object)[ok])
            parts_pos.append(positions[ok])
    if not parts_row:
        e = np.empty(0, dtype=np.int64)
        return AnalyzedBatch(e, np.empty(0, dtype=object), e, n_rows)
    row = np.concatenate(parts_row)
    term = np.concatenate(parts_term)
    p = np.concatenate(parts_pos)
    order = np.lexsort((p, row))  # stable (row, source-token pos) order
    return AnalyzedBatch(row[order], term[order], p[order], n_rows)


def analyze_text(text: str, spec: AnalyzerSpec = STANDARD) -> list[tuple[str, int]]:
    """Single-string convenience for tests and the query parser (query text
    goes through the same chain as indexed text, like the reference)."""
    b = analyze_series(pd.Series([text]), spec)
    return list(zip(b.term.tolist(), b.pos.tolist()))


@dataclass(frozen=True)
class PostingArrays:
    """Per-(row, term) aggregated postings for a batch, as flat arrays.

    Groups are ordered by (row, lexicographic term); ``offsets`` delimits
    each group's slice of ``positions_flat`` (len = n_groups + 1), ready for
    zero-copy pyarrow ``ListArray.from_arrays``. ``weight`` = tf (token
    boosts are all 1.0 in the standard chain, reference
    src/whoosh/formats.py ~L150). Built with factorize + lexsort +
    run-length boundaries — no per-group Python objects; a pandas
    ``groupby().agg(list)`` here is ~20x slower.
    """

    row: np.ndarray  # int64, one per group
    term: np.ndarray  # object (str), one per group
    weight: np.ndarray  # float64, one per group (sum of token boosts)
    positions_flat: np.ndarray  # int32, concatenated per-group positions
    offsets: np.ndarray  # int32, group boundaries into positions_flat
    count: np.ndarray | None = None  # int64 token count per group (== weight
    # unless DelimitedAttributeFilter boosts are in play; field LENGTH always
    # counts tokens, Whoosh field_length is boost-independent)

    def __len__(self) -> int:
        return self.row.size

    def token_counts(self) -> np.ndarray:
        return self.count if self.count is not None else self.weight.astype(np.int64)


def postings_arrays(texts: pd.Series, spec: AnalyzerSpec = STANDARD) -> PostingArrays:
    """Vectorized per-(row, term) aggregation of an analyzed batch."""
    b = analyze_series(texts, spec)
    e64 = np.empty(0, dtype=np.int64)
    if b.row.size == 0:
        return PostingArrays(
            e64, np.empty(0, dtype=object), np.empty(0, dtype=np.float64),
            np.empty(0, dtype=np.int32), np.zeros(1, dtype=np.int32),
        )
    codes, uniques = pd.factorize(b.term, sort=True)  # sorted -> lex term order
    order = np.lexsort((b.pos, codes, b.row))
    r, c, p = b.row[order], codes[order], b.pos[order]
    boundary = np.flatnonzero((r[1:] != r[:-1]) | (c[1:] != c[:-1]))
    starts = np.concatenate(([0], boundary + 1))
    offsets = np.concatenate((starts, [r.size])).astype(np.int32)
    counts = np.diff(offsets)
    if b.boost is not None:
        # reference format weight = sum of token boosts per (doc, term)
        weight = np.add.reduceat(b.boost[order], starts)
    else:
        weight = counts.astype(np.float64)
    return PostingArrays(
        row=r[starts],
        term=np.asarray(uniques, dtype=object)[c[starts]],
        weight=weight,
        positions_flat=p.astype(np.int32),
        offsets=offsets,
        count=counts.astype(np.int64),
    )


def postings_frame(texts: pd.Series, spec: AnalyzerSpec = STANDARD) -> pd.DataFrame:
    """pandas view of :func:`postings_arrays` (tests / small batches).

    Columns: row:int64, term:str, weight:float64, positions:list[int];
    groups ordered by (row, lexicographic term).
    """
    pa_ = postings_arrays(texts, spec)
    positions = [
        pa_.positions_flat[pa_.offsets[i] : pa_.offsets[i + 1]].tolist()
        for i in range(len(pa_))
    ]
    return pd.DataFrame(
        {
            "row": pd.Series(pa_.row, dtype=np.int64),
            "term": pd.Series(pa_.term, dtype=object),
            "weight": pd.Series(pa_.weight, dtype=np.float64),
            "positions": pd.Series(positions, dtype=object),
        }
    )
