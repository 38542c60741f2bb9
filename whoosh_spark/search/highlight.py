"""Snippet highlighting over top-k results.

Reference: src/whoosh/highlight.py — Fragmenters (WholeFragmenter,
ContextFragmenter(maxchars=200, surround=20)), BasicFragmentScorer,
Formatters (UppercaseFormatter, HtmlFormatter); surfaced via
Hit.highlights (searching.py ~L1400).

Shape: highlighting runs over the TOP-K stored texts only (k is small), so
the fragmenter itself is pure driver-side Python — but the batch entry
point :func:`highlight_df` applies the same pure function through a pandas
UDF so a large result page still processes as Arrow batches, never
row-at-a-time through the driver.

Tokenization here re-runs the field's analyzer pattern with char offsets
(the index stores positions, not char spans — same trade as the reference,
which re-analyzes stored text for highlighting when vectors are absent).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_spark.analysis import DEFAULT_TOKEN_PATTERN, STOP_WORDS


@dataclass(frozen=True)
class Fragment:
    start: int
    end: int
    matches: tuple[tuple[int, int, str], ...]  # (startchar, endchar, term)

    def score(self) -> float:
        """BasicFragmentScorer: number of matched tokens (+ small bonus for
        distinct terms)."""
        terms = {m[2] for m in self.matches}
        return len(self.matches) + 0.1 * len(terms)


def _token_spans(text: str, terms: set[str]) -> list[tuple[int, int, str]]:
    out = []
    for m in re.finditer(DEFAULT_TOKEN_PATTERN, text, re.UNICODE):
        tok = m.group(0).lower()
        if tok in terms:
            out.append((m.start(), m.end(), tok))
    return out


def context_fragments(
    text: str,
    terms: set[str],
    maxchars: int = 200,
    surround: int = 20,
) -> list[Fragment]:
    """ContextFragmenter: a fragment spans a run of nearby matches plus
    ``surround`` chars of context, capped at ``maxchars``."""
    spans = _token_spans(text, terms)
    frags: list[Fragment] = []
    cur: list[tuple[int, int, str]] = []
    for span in spans:
        if cur and (span[1] - cur[0][0] + 2 * surround > maxchars):
            frags.append(_close(cur, text, surround))
            cur = []
        cur.append(span)
    if cur:
        frags.append(_close(cur, text, surround))
    return frags


def _close(matches: list[tuple[int, int, str]], text: str, surround: int) -> Fragment:
    start = max(0, matches[0][0] - surround)
    end = min(len(text), matches[-1][1] + surround)
    return Fragment(start, end, tuple(matches))


def format_fragment(text: str, frag: Fragment, fmt: str = "upper") -> str:
    """Render one fragment; fmt in {upper, html}."""
    parts: list[str] = []
    pos = frag.start
    for s, e, term in frag.matches:
        parts.append(text[pos:s])
        tok = text[s:e]
        if fmt == "upper":
            parts.append(tok.upper())
        else:
            parts.append(f'<b class="match term">{tok}</b>')
        pos = e
    parts.append(text[pos : frag.end])
    body = "".join(parts)
    prefix = "..." if frag.start > 0 else ""
    suffix = "..." if frag.end < len(text) else ""
    return prefix + body + suffix


def highlights(
    text: str,
    terms: set[str],
    top: int = 2,
    maxchars: int = 200,
    surround: int = 20,
    fmt: str = "upper",
    joiner: str = "...",
) -> str:
    """Top-scoring snippets of ``text`` for ``terms`` (Hit.highlights)."""
    terms = {t.lower() for t in terms} - STOP_WORDS
    frags = context_fragments(text, terms, maxchars, surround)
    frags.sort(key=lambda fr: (-fr.score(), fr.start))
    return joiner.join(format_fragment(text, fr, fmt) for fr in frags[:top])


def highlight_df(
    results_with_text: DataFrame,
    terms: list[str],
    text_col: str = "text",
    top: int = 2,
    fmt: str = "upper",
) -> DataFrame:
    """Add a ``highlight`` column to a results frame, Arrow-batched."""
    tset = set(terms)

    @F.pandas_udf("string")
    def hl(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: highlights(t or "", tset, top=top, fmt=fmt))

    return results_with_text.withColumn("highlight", hl(F.col(text_col)))
