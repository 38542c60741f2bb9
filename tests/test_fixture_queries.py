"""FIXTURES.md F3 reference query set over the F1 corpus, end to end.

Queries run as STRINGS through the parser (exactly the reference's entry
point), scores checked against the pure-Python first-principles oracle
(tests/pyoracle.py) at full float64 precision, and Q22 pins WAND pruning ≡
exhaustive over the physical index built from the same corpus.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.pyoracle import PyIndex
from whoosh_spark import query as Q
from whoosh_spark.fields import transcript_schema
from whoosh_spark.indexing import build_index
from whoosh_spark.indexing.segments import build_segments, open_segments
from whoosh_spark.query.parser import QueryParser
from whoosh_spark.search import Searcher
from whoosh_spark.search.wand import wand_topk
from whoosh_spark.transcripts import fixture_corpus, fixture_rows


@pytest.fixture(scope="module")
def corpus_rows():
    return fixture_rows(n_convs=40, turns_per_conv=5)


@pytest.fixture(scope="module")
def searcher(spark, corpus_rows):
    docs = fixture_corpus(spark, 40, 5)
    ix = build_index(spark, docs, transcript_schema()).persist()
    return Searcher(ix)


@pytest.fixture(scope="module")
def oracle(corpus_rows):
    return PyIndex(corpus_rows, id_fields=("role", "tool"))


@pytest.fixture(scope="module")
def parser():
    return QueryParser("text", transcript_schema())


def top(searcher, q, k=10):
    return [(r.doc_id, r.score) for r in searcher.search(q, limit=k).collect()]


STRING_QUERIES = {
    "Q1": "spark",
    "Q2": "hash join",
    "Q3": "spark OR vector",
    "Q4": "merge NOT window",
    "Q5": '"hash join"',
    "Q6": '"slow query"~2',
    "Q7": "sca*",
    "Q8": "querry~",
    "Q9": "[batch TO filter]",
    "Q13": "spark^2 OR (join AND batch)",
    "Q15": "spark AND tbd",
}


@pytest.mark.parametrize("name", sorted(STRING_QUERIES))
def test_string_queries_match_oracle(searcher, oracle, parser, name):
    q = parser.parse(STRING_QUERIES[name])
    got = top(searcher, q)
    want = oracle.query(q, limit=10)
    assert [d for d, _ in got] == [d for d, _ in want], name
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9), name


def test_q10_multifield(searcher, oracle, parser):
    q = parser.parse("role:user AND spark")
    got = top(searcher, q)
    want = oracle.query(q, limit=10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_q11_numeric_range(searcher, parser):
    q = parser.parse("turn_idx:[2 TO 3]")
    got = sorted(r.doc_id for r in searcher.compile(q).collect())
    docs = searcher.index.docs
    want = sorted(
        r.doc_id for r in docs.where("turn_idx >= 2 and turn_idx <= 3").collect()
    )
    assert got == want


def test_q12_date_range(searcher, parser):
    q = parser.parse("ts:[20260101 TO 20260101]")
    n = searcher.compile(q).count()
    assert n == searcher.index.docs.count()  # all fixture turns are on day 1


def test_q14_stopword_only_is_null(parser):
    assert isinstance(parser.parse("the a x"), Q.NullQuery)


def test_q16_sortedby(searcher):
    rows = searcher.search(
        Q.Term("text", "spark"), limit=None, sortedby="role", reverse=True
    ).collect()
    vals = [r["role"] for r in rows]  # sortedby joins the key column
    assert vals == sorted(vals, reverse=True)


def test_q17_groupedby_counts(searcher, oracle):
    got = {
        r["role"]: r["count"]
        for r in searcher.group_counts(
            Q.Or([Q.Term("text", "spark"), Q.Term("text", "vector")]), "role"
        ).collect()
    }
    matched = {d for d, _ in oracle.query(
        Q.Or([Q.Term("text", "spark"), Q.Term("text", "vector")]), limit=None)}
    want: dict = {}
    for d in matched:
        role = oracle.id_terms["role"][d]
        want[role] = want.get(role, 0) + 1
    assert got == want


def test_q18_collapse(searcher):
    rows = searcher.search(
        Q.Or([Q.Term("text", "spark"), Q.Term("text", "vector")]),
        collapse="conv_id",
        limit=None,
    ).collect()
    convs = [
        r["conv_id"]
        for r in searcher.with_stored_fields(
            searcher.search(
                Q.Or([Q.Term("text", "spark"), Q.Term("text", "vector")]),
                collapse="conv_id",
                limit=None,
            ),
            "conv_id",
        ).collect()
    ]
    assert len(convs) == len(set(convs))  # one doc per conversation


def test_q19_filter_mask(searcher, oracle):
    got = {
        r.doc_id
        for r in searcher.search(
            Q.Term("text", "spark"),
            filter=Q.Term("role", "assistant"),
            mask=Q.Term("tool", "bash"),
            limit=None,
        ).collect()
    }
    base = {d for d, _ in oracle.query(Q.Term("text", "spark"), limit=None)}
    want = {
        d for d in base
        if oracle.id_terms["role"][d] == "assistant"
        and oracle.id_terms["tool"][d] != "bash"
    }
    assert got == want


def test_q20_pagination(searcher):
    q = Q.Or([Q.Term("text", "spark"), Q.Term("text", "vector")])
    all10 = top(searcher, q, 10)
    page2 = [
        (r.doc_id, r.score) for r in searcher.search_page(q, pagenum=2, pagelen=5).collect()
    ]
    assert page2 == all10[5:10]


def test_q21_every_count(searcher, corpus_rows):
    assert searcher.compile(Q.Every()).count() == len(corpus_rows)


def test_q22_wand_pruning_equals_exhaustive(spark, corpus_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("f1seg") / "ix")
    docs = fixture_corpus(spark, 40, 5)
    build_segments(spark, docs, transcript_schema(), path, n_segments=2)
    six = open_segments(spark, path, docs, transcript_schema())
    for prune in (False, True):
        got = wand_topk(six, "text", ["spark"], k=10, prune=prune).collect()
        ref = Searcher(six).search(Q.Term("text", "spark")).collect()
        assert got == ref  # optimize=True ≡ optimize=False ≡ collector path
