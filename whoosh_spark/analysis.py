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
    source token's position)."""

    pattern: str = DEFAULT_TOKEN_PATTERN
    lowercase: bool = True
    stoplist: frozenset[str] | None = STOP_WORDS
    minsize: int = 2
    maxsize: int | None = None
    ngram: tuple[int, int] | None = None
    stem: bool = False  # StemFilter (Porter) after the stop filter
    # CharsetFilter analogue (src/whoosh/analysis/filters.py::CharsetFilter
    # with the accent map): NFKD-decompose + strip combining marks, applied
    # right after lowercasing so stop/minsize filters see folded terms
    accent_fold: bool = False
    # IntraWordFilter (src/whoosh/analysis/intraword.py::IntraWordFilter
    # ~L30): split camelCase / letter-digit runs into subword tokens before
    # lowercasing; positions renumber over the split stream
    intraword: bool = False

    def compiled(self) -> re.Pattern:
        return re.compile(self.pattern, re.UNICODE)


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
    toks = texts.str.findall(spec.compiled())
    flat = toks.explode()
    flat = flat[flat.notna()]
    if len(flat) == 0:
        empty = np.empty(0, dtype=np.int64)
        return AnalyzedBatch(empty, np.empty(0, dtype=object), empty, n_rows)
    if spec.intraword:
        flat = flat.str.findall(_INTRAWORD_RE).explode()
        flat = flat[flat.notna()]
        if len(flat) == 0:
            empty = np.empty(0, dtype=np.int64)
            return AnalyzedBatch(empty, np.empty(0, dtype=object), empty, n_rows)
    if spec.lowercase:
        flat = flat.str.lower()
    if spec.accent_fold:
        flat = flat.str.normalize("NFKD").str.replace(_COMBINING_RE, "", regex=True)
    keep = flat.str.len() >= spec.minsize
    if spec.maxsize is not None:
        keep &= flat.str.len() <= spec.maxsize
    if spec.stoplist is not None:
        keep &= ~flat.isin(spec.stoplist)
    kept = flat[keep]
    if spec.stem:
        # stem per UNIQUE term (zipfian batches -> tiny vocabulary), the
        # reference's StemFilter lru_cache trick vectorized via Series.map
        from whoosh_spark.lang import stem as _stem

        mapping = {u: _stem(u) for u in pd.unique(kept)}
        kept = kept.map(mapping)
    pos = kept.groupby(level=0).cumcount()
    if spec.ngram is not None:
        return _ngram_expand(kept, pos, spec.ngram, n_rows)
    return AnalyzedBatch(
        row=kept.index.to_numpy(dtype=np.int64),
        term=kept.to_numpy(dtype=object),
        pos=pos.to_numpy(dtype=np.int64),
        n_rows=n_rows,
    )


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
    weight: np.ndarray  # float64, one per group
    positions_flat: np.ndarray  # int32, concatenated per-group positions
    offsets: np.ndarray  # int32, group boundaries into positions_flat

    def __len__(self) -> int:
        return self.row.size


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
    return PostingArrays(
        row=r[starts],
        term=np.asarray(uniques, dtype=object)[c[starts]],
        weight=counts.astype(np.float64),
        positions_flat=p.astype(np.int32),
        offsets=offsets,
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
