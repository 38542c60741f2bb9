"""Keyset ("search-after") deep pagination: Searcher.search_after.

Invariants pinned here:
- concatenating cursor pages reproduces search(limit=n*k) EXACTLY
  (same docs, same full-precision scores, same order) — including
  across tied scores, where the cursor continues on doc_id;
- cursor=None is page one (== plain top-k);
- the predicate composes with filter/mask and a pre-compiled frame;
- an exhausted cursor (past the last hit) returns an empty page.
"""

import pytest

from pyspark.sql import functions as F

from whoosh_spark import query as Q
from whoosh_spark.fields import ID, TEXT, Schema
from whoosh_spark.indexing import build_index
from whoosh_spark.search import BM25F, Searcher

# duplicate texts force exact score TIES so the doc_id leg of the keyset
# predicate is load-bearing, not decorative
DOCS = [
    {"doc_id": 0, "text": "hash join merge sort spark", "role": "user"},
    {"doc_id": 1, "text": "the spark spark query engine is fast", "role": "assistant"},
    {"doc_id": 2, "text": "merge window batch stream", "role": "user"},
    {"doc_id": 3, "text": "hash join hash join slow query", "role": "assistant"},
    {"doc_id": 4, "text": "spark vector join", "role": "tool"},
    {"doc_id": 5, "text": "spark vector join", "role": "user"},
    {"doc_id": 6, "text": "spark vector join", "role": "tool"},
    {"doc_id": 7, "text": "scan scatter scale spark batch", "role": "user"},
    {"doc_id": 8, "text": "slow merge query window spark hash", "role": "tool"},
    {"doc_id": 9, "text": "hash join merge sort spark", "role": "assistant"},
]

QUERY = Q.Or([Q.Term("text", "spark"), Q.Term("text", "join"),
              Q.Term("text", "merge")])


@pytest.fixture(scope="module")
def searcher(spark):
    schema = Schema(TEXT("text"), ID("role"))
    ix = build_index(spark, spark.createDataFrame(DOCS), schema).persist()
    return Searcher(ix, BM25F())


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _paged(searcher, q, k, **kw):
    """Collect every page of size k via cursors until exhausted."""
    out, cursor = [], None
    while True:
        page = _rows(searcher.search_after(q, cursor=cursor, limit=k, **kw))
        out.extend(page)
        if len(page) < k:
            return out
        cursor = (page[-1][1], page[-1][0])


def test_pages_concat_equals_full_search(searcher):
    full = _rows(searcher.search(QUERY, limit=None))
    assert len(full) >= 8  # ties present, multiple pages
    for k in (1, 2, 3, 4):
        assert _paged(searcher, QUERY, k) == full


def test_ties_split_across_page_boundary(searcher):
    # docs 4/5/6 share identical text => identical scores; pick k so a tie
    # group straddles a boundary and verify the doc_id leg resumes mid-tie
    full = _rows(searcher.search(QUERY, limit=None))
    scores = [s for _, s in full]
    assert len(set(scores)) < len(scores)  # genuine ties
    tied = [i for i in range(1, len(full)) if scores[i] == scores[i - 1]]
    k = tied[0]  # boundary right inside the first tie group
    page1 = _rows(searcher.search_after(QUERY, limit=k))
    page2 = _rows(searcher.search_after(
        QUERY, cursor=(page1[-1][1], page1[-1][0]), limit=k))
    assert page1 + page2 == full[: 2 * k]


def test_cursor_none_is_page_one(searcher):
    assert _rows(searcher.search_after(QUERY, limit=4)) == _rows(
        searcher.search(QUERY, limit=4))


def test_exhausted_cursor_returns_empty(searcher):
    full = _rows(searcher.search(QUERY, limit=None))
    last = full[-1]
    assert _rows(searcher.search_after(
        QUERY, cursor=(last[1], last[0]), limit=5)) == []


def test_composes_with_filter_and_mask(searcher):
    kw = dict(filter=Q.Term("role", "user"), mask=Q.Term("role", "tool"))
    full = _rows(searcher.search(QUERY, limit=None, **kw))
    assert _paged(searcher, QUERY, 2, **kw) == full


def test_precompiled_frame_paging(searcher):
    # rounded-score frame paging: the oracle-entry discipline — the cursor
    # predicate runs on the caller's own post-processed scores
    scored = searcher.compile(QUERY).withColumn("score", F.round("score", 4))
    full = _rows(scored.orderBy(F.desc("score"), F.asc("doc_id")))
    page1 = _rows(searcher.search_after(scored, limit=3))
    page2 = _rows(searcher.search_after(
        scored, cursor=(page1[-1][1], page1[-1][0]), limit=3))
    assert page1 + page2 == full[:6]
