"""Snippet highlighting over top-k results.

Reference: src/whoosh/highlight.py — Fragmenters (WholeFragmenter ~L120,
SentenceFragmenter ~L150, ContextFragmenter(maxchars=200, surround=20)
~L350, PinpointFragmenter ~L450), BasicFragmentScorer,
Formatters (UppercaseFormatter, HtmlFormatter ~L650); surfaced via
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


def _token_spans(text: str, terms: set[str],
                 match_fn=None) -> list[tuple[int, int, str]]:
    out = []
    for m in re.finditer(DEFAULT_TOKEN_PATTERN, text, re.UNICODE):
        tok = m.group(0).lower()
        key = match_fn(tok) if match_fn is not None else tok
        if key in terms:
            out.append((m.start(), m.end(), key))
    return out


def context_fragments(
    text: str,
    terms: set[str],
    maxchars: int = 200,
    surround: int = 20,
    match_fn=None,
) -> list[Fragment]:
    """ContextFragmenter: a fragment spans a run of nearby matches plus
    ``surround`` chars of context, capped at ``maxchars``."""
    spans = _token_spans(text, terms, match_fn)
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


def whole_fragment(text: str, terms: set[str], match_fn=None) -> list[Fragment]:
    """WholeFragmenter: the entire text is one fragment (used for short
    stored fields, e.g. titles)."""
    return [Fragment(0, len(text), tuple(_token_spans(text, terms, match_fn)))]


def sentence_fragments(
    text: str,
    terms: set[str],
    maxchars: int = 200,
    sentencechars: str = ".!?",
    match_fn=None,
) -> list[Fragment]:
    """SentenceFragmenter: each sentence containing a match becomes a
    fragment, capped at ``maxchars``. Sentence ends = a sentencechar run
    followed by whitespace/end-of-text (same break rule as the
    reference)."""
    spans = _token_spans(text, terms, match_fn)
    if not spans:
        return []
    bounds = [0]
    for m in re.finditer(rf"[{re.escape(sentencechars)}]+(?=\s|$)", text):
        bounds.append(m.end())
    if bounds[-1] < len(text):
        bounds.append(len(text))
    frags: list[Fragment] = []
    si = 0
    for lo, hi in zip(bounds, bounds[1:]):
        inside = []
        while si < len(spans) and spans[si][0] < hi:
            if spans[si][0] >= lo:
                inside.append(spans[si])
            si += 1
        if inside:
            # strip leading whitespace; cap at maxchars
            start = lo + (len(text[lo:hi]) - len(text[lo:hi].lstrip()))
            end = min(hi, start + maxchars)
            kept = tuple(s for s in inside if s[1] <= end)
            if kept:
                frags.append(Fragment(start, end, kept))
    return frags


def pinpoint_fragments(
    text: str,
    terms: set[str],
    maxchars: int = 256,
    surround: int = 50,
    autotrim: bool = False,
    match_fn=None,
) -> list[Fragment]:
    """PinpointFragmenter: fragments built directly from matched char
    ranges — runs of matches whose span fits in ``maxchars`` share one
    fragment padded by ``surround`` chars; ``autotrim`` snaps the padded
    edges to the nearest whitespace so fragments never cut mid-word."""
    spans = _token_spans(text, terms, match_fn)
    frags: list[Fragment] = []
    cur: list[tuple[int, int, str]] = []
    for span in spans:
        if cur and (span[1] - cur[0][0] > maxchars - 2 * surround):
            frags.append(cur)
            cur = []
        cur.append(span)
    if cur:
        frags.append(cur)
    out = []
    for matches in frags:
        start = max(0, matches[0][0] - surround)
        end = min(len(text), matches[-1][1] + surround)
        if autotrim:
            if start > 0:
                ws = text.find(" ", start, matches[0][0])
                if ws >= 0:
                    start = ws + 1
            if end < len(text):
                ws = text.rfind(" ", matches[-1][1], end)
                if ws >= 0:
                    end = ws
        out.append(Fragment(start, end, tuple(matches)))
    return out


_FRAGMENTERS = {
    "context": lambda text, terms, maxchars, surround, match_fn=None:
        context_fragments(text, terms, maxchars, surround, match_fn),
    "whole": lambda text, terms, maxchars, surround, match_fn=None:
        whole_fragment(text, terms, match_fn),
    "sentence": lambda text, terms, maxchars, surround, match_fn=None:
        sentence_fragments(text, terms, maxchars, match_fn=match_fn),
    "pinpoint": lambda text, terms, maxchars, surround, match_fn=None:
        pinpoint_fragments(text, terms, max(maxchars, 2 * surround + 1),
                           surround, match_fn=match_fn),
}


def html_formatter(tagname: str = "strong", classname: str = "match",
                   termclass: str = "term"):
    """HtmlFormatter(tagname=, classname=, termclass=): wraps each matched
    token in ``<tagname class="classname termclassN">`` where N numbers the
    distinct matched terms in first-seen order (reference:
    highlight.py::HtmlFormatter — same numbering scheme)."""
    seen: dict[str, int] = {}

    def fmt(tok: str, term: str) -> str:
        n = seen.setdefault(term, len(seen))
        return f'<{tagname} class="{classname} {termclass}{n}">{tok}</{tagname}>'

    return fmt


def format_fragment(text: str, frag: Fragment, fmt="upper",
                    ellipses: bool = True) -> str:
    """Render one fragment; fmt in {upper, html} or a callable
    ``(token_text, term) -> str`` (e.g. from :func:`html_formatter`)."""
    if not callable(fmt) and fmt not in ("upper", "html"):
        raise ValueError(f"unknown formatter {fmt!r}; 'upper', 'html', or a callable")
    parts: list[str] = []
    pos = frag.start
    for s, e, term in frag.matches:
        if s < pos:
            continue  # overlapping span already rendered
        parts.append(text[pos:s])
        tok = text[s:e]
        if callable(fmt):
            parts.append(fmt(tok, term))
        elif fmt == "upper":
            parts.append(tok.upper())
        else:
            parts.append(f'<b class="match term">{tok}</b>')
        pos = e
    parts.append(text[pos : frag.end])
    body = "".join(parts)
    if not ellipses:
        return body
    prefix = "..." if frag.start > 0 else ""
    suffix = "..." if frag.end < len(text) else ""
    return prefix + body + suffix


def highlights(
    text: str,
    terms: set[str],
    top: int = 2,
    maxchars: int = 200,
    surround: int = 20,
    fmt="upper",
    joiner: str = "...",
    fragmenter: str = "context",
    stoplist: "set[str] | None" = STOP_WORDS,
    match_fn=None,
    order: str = "first",
) -> str:
    """Top-scoring snippets of ``text`` for ``terms`` (Hit.highlights);
    ``fragmenter`` in {context, whole, sentence, pinpoint}.

    The TOP fragments are selected by score and rendered per ``order``
    (reference: highlight.py FIRST/SCORE sort keys): "first" = POSITION
    order (the reference's default), "score" = best-scoring first (ties
    position-ascending). Fragments are joined by ``joiner`` and do not
    carry their own ellipses inside the joined string.

    Non-default analyzers: pass ``stoplist`` (None for a no-stopword field)
    and ``match_fn`` — a ``surface_token -> comparable`` normalizer (e.g.
    ``whoosh_spark.lang.stem`` for STEMTEXT fields, so the stemmed query
    term 'run' highlights the surface token 'running')."""
    if fragmenter not in _FRAGMENTERS:
        raise ValueError(
            f"unknown fragmenter {fragmenter!r}; one of {sorted(_FRAGMENTERS)}"
        )
    if order not in ("first", "score"):
        raise ValueError(f"unknown order {order!r}; one of ['first', 'score']")
    terms = {t.lower() for t in terms} - (stoplist or set())
    frags = _FRAGMENTERS[fragmenter](text, terms, maxchars, surround,
                                     match_fn=match_fn)
    frags.sort(key=lambda fr: (-fr.score(), fr.start))
    chosen = frags[:top]
    if order == "first":
        chosen = sorted(chosen, key=lambda fr: fr.start)
    return joiner.join(
        format_fragment(text, fr, fmt, ellipses=False) for fr in chosen
    )


def highlight_df(
    results_with_text: DataFrame,
    terms: list[str],
    text_col: str = "text",
    top: int = 2,
    fmt: str = "upper",
    fragmenter: str = "context",
) -> DataFrame:
    """Add a ``highlight`` column to a results frame, Arrow-batched."""
    tset = set(terms)

    @F.pandas_udf("string")
    def hl(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: highlights(t or "", tset, top=top, fmt=fmt,
                                              fragmenter=fragmenter))

    return results_with_text.withColumn("highlight", hl(F.col(text_col)))
