"""Property-based tests (hypothesis) for the parity-critical pure core:
varint/delta codecs, length quantization, and analyzer invariants.

The reference pins these with hand-picked cases (tests/test_misc.py,
test_analysis.py); property tests cover the input space those cases sample.
No Spark involvement — everything here is the numpy/pandas layer that runs
inside the UDFs.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_spark.analysis import STANDARD, STOP_WORDS, AnalyzerSpec, analyze_series
from whoosh_spark.util import (
    delta_varint_decode,
    delta_varint_encode,
    quantized_length,
    quantized_length_np,
    varint_decode,
    varint_encode_lengths,
)

sorted_ids = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300
).map(lambda xs: np.array(sorted(set(xs)), dtype=np.int64))

small_ints = st.lists(
    st.integers(min_value=0, max_value=2**30), min_size=0, max_size=300
).map(lambda xs: np.array(xs, dtype=np.int64))


@given(sorted_ids)
@settings(max_examples=200, deadline=None)
def test_delta_varint_roundtrip(ids):
    assert np.array_equal(delta_varint_decode(delta_varint_encode(ids)), ids)


@given(small_ints)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    buf, _ = varint_encode_lengths(vals)
    assert np.array_equal(varint_decode(buf), vals)


@given(st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=300, deadline=None)
def test_quantized_length_properties(n):
    q = quantized_length(n)
    # scalar and vectorized forms agree (the UDF uses the numpy twin)
    assert quantized_length_np(np.array([n], dtype=np.int64))[0] == q
    # idempotent on the quantized grid (byte_to_length(length_to_byte(x)))
    assert quantized_length(q) == q
    # never underestimates small lengths to zero
    if n > 0:
        assert q > 0


@given(st.integers(min_value=0, max_value=100_000), st.integers(min_value=0, max_value=100_000))
@settings(max_examples=200, deadline=None)
def test_quantized_length_monotone(a, b):
    qa, qb = quantized_length(a), quantized_length(b)
    assert (a <= b) == (qa <= qb) or qa == qb


texts = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po"), max_codepoint=0x2FF
        ),
        max_size=120,
    ),
    min_size=1,
    max_size=20,
)


@given(texts)
@settings(max_examples=150, deadline=None)
def test_analyzer_invariants(rows):
    b = analyze_series(pd.Series(rows), STANDARD)
    # every surviving term: lowercase, len >= 2, not a stopword
    for t in b.term:
        assert t == t.lower() and len(t) >= 2 and t not in STOP_WORDS
    # positions renumber consecutively from 0 within each row
    for r in np.unique(b.row):
        pos = b.pos[b.row == r]
        assert pos.tolist() == list(range(len(pos)))
    # lengths() == tokens per row
    lens = b.lengths()
    counts = np.bincount(b.row, minlength=len(rows)) if len(b.row) else np.zeros(len(rows), int)
    assert lens.tolist() == counts.tolist()


@given(texts)
@settings(max_examples=100, deadline=None)
def test_analyzer_batch_equals_rowwise(rows):
    """Batch analysis == analyzing each row alone (no cross-row leakage)."""
    batch = analyze_series(pd.Series(rows), STANDARD)
    for i, r in enumerate(rows):
        solo = analyze_series(pd.Series([r]), STANDARD)
        mask = batch.row == i
        assert batch.term[mask].tolist() == solo.term.tolist()
        assert batch.pos[mask].tolist() == solo.pos.tolist()


@given(texts)
@settings(max_examples=75, deadline=None)
def test_ngram_positions_inherit_source_token(rows):
    spec = AnalyzerSpec(stoplist=None, minsize=1, ngram=(2, 3))
    b = analyze_series(pd.Series(rows), spec)
    base = analyze_series(pd.Series(rows), AnalyzerSpec(stoplist=None, minsize=1))
    # every gram's (row, pos) pair must exist among source tokens
    src = set(zip(base.row.tolist(), base.pos.tolist()))
    assert set(zip(b.row.tolist(), b.pos.tolist())) <= src


# ---------------------------------------------------------------- parser

_QUERY_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyz"
    " :^\"'[]{}()*?~<>=+-.1234567890ANDORT"
)


@given(st.text(alphabet=_QUERY_ALPHABET, max_size=30))
@settings(max_examples=400, deadline=None)
def test_parser_total_on_arbitrary_input(s):
    """parse() is total up to ValueError: any input yields a Query or a
    ValueError (malformed dates/numbers), never an internal error — with
    every optional plugin enabled (mirrors whoosh test_parsing's garbage
    inputs)."""
    from whoosh_spark.fields import DATETIME, ID, NUMERIC, Schema, TEXT
    from whoosh_spark.query.nodes import Query
    from whoosh_spark.query.parser import QueryParser

    schema = Schema(TEXT("text"), ID("role"), NUMERIC("turn_idx"), DATETIME("ts"))
    p = QueryParser("text", schema, plugins=("gtlt", "plusminus", "regex"))
    try:
        q = p.parse(s)
    except ValueError:
        return
    assert isinstance(q, Query)
