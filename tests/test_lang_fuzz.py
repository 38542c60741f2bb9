"""Crash-safety fuzz for every bundled stemmer.

A stemmer exception inside the Arrow analyzer UDF would surface as
retried task failures on a real cluster — far more expensive than the
same bug locally. Property: every stemmer is total over arbitrary
unicode tokens (returns a str, never raises) and deterministic.
Hypothesis shrinks any counterexample to a minimal token.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_spark.lang import (
    stem,
    stem2,
    stem_ar,
    stem_da,
    stem_de,
    stem_es,
    stem_fi,
    stem_fr,
    stem_hu,
    stem_it,
    stem_nl,
    stem_no,
    stem_pt,
    stem_ro,
    stem_ru,
    stem_sv,
)

_ALL_STEMMERS = [stem, stem2, stem_ar, stem_da, stem_de, stem_es,
                 stem_fi, stem_fr, stem_hu, stem_it, stem_nl, stem_no,
                 stem_pt, stem_ro, stem_ru, stem_sv]

# tokens the analyzer can actually emit: \w+ runs — mix plain ASCII,
# accented Latin, Cyrillic, Arabic, and digits
_token = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Ll", "Lu", "Lo", "Nd", "Mn"),
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=300, deadline=None)
@given(_token)
def test_all_stemmers_total_and_deterministic(token):
    for fn in _ALL_STEMMERS:
        out = fn(token)
        assert isinstance(out, str)
        assert fn(token) == out          # deterministic
        # a stemmer never grows a token beyond one extra char (the only
        # growth rules are replacements like heden->heid / ksi)
        assert len(out) <= len(token) + 4


@settings(max_examples=150, deadline=None)
@given(_token)
def test_all_stemmers_lower_stable(token):
    # analyzers lowercase before stemming; no stemmer re-introduces case
    # outside its own prelude marks, and every postlude clears them
    for fn in _ALL_STEMMERS:
        out = fn(token.lower())
        assert out == out.lower(), (fn.__name__, token, out)
