"""Span query algebra (reference: src/whoosh/query/spans.py semantics)."""

import pytest

from whoosh_spark import query as Q
from whoosh_spark.fields import Schema, TEXT
from whoosh_spark.indexing import build_index
from whoosh_spark.search import Searcher
from whoosh_spark.search.executor import span_frames


@pytest.fixture(scope="module")
def s(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "beta alpha gamma beta delta"),
            (2, "gamma delta epsilon alpha"),
            (3, "delta gamma beta alpha"),
        ],
        "doc_id long, text string",
    )
    ix = build_index(spark, docs, Schema(TEXT("text"))).persist()
    return Searcher(ix)


def ids(s, q):
    return sorted(r.doc_id for r in s.compile(q.normalize()).collect())


def test_ordered_near_equals_phrase(s):
    near = Q.SpanNear2([Q.Term("text", "alpha"), Q.Term("text", "beta")])
    assert ids(s, near) == ids(s, Q.Phrase("text", ["alpha", "beta"])) == [0]


def test_unordered_near(s):
    q = Q.SpanNear2([Q.Term("text", "alpha"), Q.Term("text", "beta")], ordered=False)
    assert ids(s, q) == [0, 1, 3]  # beta alpha / beta alpha reversed count


def test_ordered_anywhere_and_sequence(s):
    assert ids(s, Q.Ordered([Q.Term("text", "alpha"), Q.Term("text", "delta")])) == [0, 1]
    seq = Q.Sequence(
        [Q.Term("text", "beta"), Q.Term("text", "gamma"), Q.Term("text", "delta")]
    )
    assert ids(s, seq) == [0]


def test_span_first_or_not_before_contains(s):
    assert ids(s, Q.SpanFirst(Q.Term("text", "beta"), limit=0)) == [1]
    assert ids(s, Q.SpanOr([Q.Term("text", "epsilon"), Q.Term("text", "alpha")])) == [0, 1, 2, 3]
    notq = Q.SpanNot(
        Q.Term("text", "alpha"),
        Q.SpanNear2([Q.Term("text", "alpha"), Q.Term("text", "beta")]),
    )
    assert ids(s, notq) == [1, 2, 3]
    assert ids(s, Q.SpanBefore(Q.Term("text", "gamma"), Q.Term("text", "epsilon"))) == [2]


def test_span_frames_expose_intervals(s):
    fr = (
        span_frames(
            s, Q.SpanNear2([Q.Term("text", "alpha"), Q.Term("text", "beta")], ordered=False)
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, [(x.s, x.e) for x in r.spans]) for r in fr] == [
        (0, [(0, 1)]),
        (1, [(0, 1)]),
        (3, [(2, 3)]),
    ]


def test_span_scores_match_conjunction(s):
    """Span wrappers filter; scoring is the underlying conjunction."""
    near = Q.SpanNear2([Q.Term("text", "alpha"), Q.Term("text", "beta")])
    conj = Q.And([Q.Term("text", "alpha"), Q.Term("text", "beta")])
    a = {r.doc_id: r.score for r in s.compile(near.normalize()).collect()}
    b = {r.doc_id: r.score for r in s.compile(conj.normalize()).collect()}
    for d, sc in a.items():
        assert sc == pytest.approx(b[d], rel=1e-12)


def test_three_way_unordered(s):
    q = Q.SpanNear2(
        [Q.Term("text", "gamma"), Q.Term("text", "beta"), Q.Term("text", "delta")],
        slop=2,
        ordered=False,
    )
    # chains left-to-right: (gamma~beta) then ~delta within slop 2
    assert 3 in ids(s, q)  # delta gamma beta: gamma-beta adjacent, delta before


def test_span_contains_and_before_apply_boost(s):
    from whoosh_spark.query.nodes import SpanBefore, SpanContains, SpanNear2, Term

    inner = SpanNear2([Term("text", "alpha"), Term("text", "beta")], slop=4)
    plain = s.compile(SpanContains(inner, Term("text", "gamma")).normalize()).collect()
    boosted = s.compile(
        SpanContains(inner, Term("text", "gamma"), boost=2.0).normalize()
    ).collect()
    assert len(plain) == len(boosted) > 0
    for a, b in zip(sorted(plain, key=lambda r: r.doc_id),
                    sorted(boosted, key=lambda r: r.doc_id)):
        assert b.score == pytest.approx(2.0 * a.score, rel=1e-9)
    plain2 = s.compile(SpanBefore(Term("text", "alpha"), Term("text", "delta")).normalize()).collect()
    boosted2 = s.compile(
        SpanBefore(Term("text", "alpha"), Term("text", "delta"), boost=3.0).normalize()
    ).collect()
    assert len(plain2) == len(boosted2) > 0
    for a, b in zip(sorted(plain2, key=lambda r: r.doc_id),
                    sorted(boosted2, key=lambda r: r.doc_id)):
        assert b.score == pytest.approx(3.0 * a.score, rel=1e-9)


def test_span_condition(s):
    """SpanCondition (spans.py::SpanCondition): spans from a, doc-level
    require on b; scores are the a+b intersection sum."""
    q = Q.SpanCondition(Q.Term("text", "gamma"), Q.Term("text", "beta"))
    assert ids(s, q) == [0, 1, 3]  # gamma docs that also contain beta
    fr = span_frames(s, q).orderBy("doc_id").collect()
    assert [(r.doc_id, [(x.s, x.e) for x in r.spans]) for r in fr] == [
        (0, [(2, 2)]),
        (1, [(2, 2)]),
        (3, [(1, 1)]),
    ]  # spans are a's positions only — b contributes no spans
    conj = Q.And([Q.Term("text", "gamma"), Q.Term("text", "beta")])
    a = {r.doc_id: r.score for r in s.compile(q.normalize()).collect()}
    b = {r.doc_id: r.score for r in s.compile(conj.normalize()).collect()}
    assert a and all(a[d] == pytest.approx(b[d], rel=1e-12) for d in a)
    # condition never satisfied in a's docs -> empty
    assert ids(s, Q.SpanCondition(Q.Term("text", "beta"), Q.Term("text", "epsilon"))) == []
    boosted = {
        r.doc_id: r.score
        for r in s.compile(
            Q.SpanCondition(
                Q.Term("text", "gamma"), Q.Term("text", "beta"), boost=2.0
            ).normalize()
        ).collect()
    }
    assert all(boosted[d] == pytest.approx(2.0 * a[d], rel=1e-9) for d in a)
