"""Threshold-algorithm routing for Or-of-WAND-eligible children
(executor._or_mixed_route): the composite shapes the single-kernel route
rejects — Or(Phrase, boosted Term) like the flagship parsed query, Or of
flat booleans — must route through the per-child block-max kernels and
stay BIT-IDENTICAL to the unrouted executor plan (the same discipline as
tests/test_phrase_wand.py pruned-equals-unpruned). Mirrors the reference's
optimize=True contract (searching.py::Searcher.search ~L780: pruning
changes the plan, never the rows).
"""

import pytest

from whoosh_spark import query as Q
from whoosh_spark.fields import transcript_schema
from whoosh_spark.indexing.segments import build_segments, open_segments
from whoosh_spark.search import Searcher
from whoosh_spark.transcripts import transcript_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ixparts(spark, tmp_path_factory):
    corpus = transcript_corpus(spark, SF).persist()
    corpus.count()
    path = str(tmp_path_factory.mktemp("ormixix") / "ix")
    build_segments(spark, corpus, transcript_schema(), path, n_segments=3)
    return path, corpus


@pytest.fixture(scope="module")
def six(spark, ixparts):
    path, corpus = ixparts
    return open_segments(spark, path, corpus, transcript_schema())


# each case must be MIXED-route eligible but single-kernel ineligible
CASES = [
    # the flagship parsed shape: "hash join" OR spark^2
    Q.Or([Q.Phrase("text", ["hash", "join"]),
          Q.Term("text", "spark", boost=2.0)]),
    # unboosted phrase + term (still rejected by _wand_desc: mixed types)
    Q.Or([Q.Phrase("text", ["data", "line"], slop=3),
          Q.Term("text", "merge")]),
    # boosted term forces the child-decomposed path for a plain term pair
    Q.Or([Q.Term("text", "spark"), Q.Term("text", "join", boost=0.5)]),
    # flat boolean children
    Q.Or([Q.And([Q.Term("text", "hash"), Q.Term("text", "join")]),
          Q.Term("text", "spark", boost=2.0)]),
    Q.Or([Q.DisjunctionMax([Q.Term("text", "hash"), Q.Term("text", "merge")]),
          Q.Phrase("text", ["hash", "join"])]),
    # three children, slopped phrase
    Q.Or([Q.Phrase("text", ["hash", "join"], slop=2),
          Q.Term("text", "window", boost=3.0),
          Q.Or([Q.Term("text", "sort"), Q.Term("text", "scan")])]),
]


def _rows(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def test_or_mixed_routed_equals_executor_bit_exact(six):
    s = Searcher(six)
    for q in CASES:
        qn = q.normalize()
        assert s._or_mixed_desc(qn) is not None, q
        ref = _rows(s.search(q, limit=10, optimize=False))
        got = _rows(s._or_mixed_route(qn, 10))  # the TA route itself
        assert got == ref, q
        # and the default end-user path (cost-gated) agrees too
        assert _rows(s.search(q, limit=10)) == ref, q


def test_or_mixed_cost_gate(six, monkeypatch):
    """search(optimize=True) routes through the TA only past the
    leaf-postings cost gate: below it the executor's single action wins
    (measured crossover — see _wand_route). Both gate sides return the
    same rows."""
    import whoosh_spark.search.executor as ex

    s = Searcher(six)
    q = CASES[0]
    qn = q.normalize()
    assert s._wand_desc(qn) is None  # single-kernel route rejects it
    # tiny corpus: below the real gate -> executor path
    assert s._wand_route(qn, 10) is None
    ref = _rows(s.search(q, limit=10, optimize=False))
    # force the gate open: search() must route AND stay bit-exact
    monkeypatch.setattr(ex, "_TA_MIN_LEAF_POSTINGS", 0)
    routed = s._wand_route(qn, 10)
    assert routed is not None
    assert _rows(routed) == ref
    assert _rows(s.search(q, limit=10)) == ref


def test_or_mixed_deepening_rounds_stay_exact(six):
    # start_k=1 forces the threshold check to fail and the k' x4 deepening
    # loop to run several rounds; rows must not change
    s = Searcher(six)
    for q in CASES[:3]:
        qn = q.normalize()
        ref = _rows(s.search(q, limit=10, optimize=False))
        got = _rows(s._or_mixed_route(qn, 10, start_k=1))
        assert got == ref, q


def test_or_mixed_exhaustion_path(six):
    # k' larger than any child's match count: every child exhausts on the
    # first round and the candidate union IS the full match set
    s = Searcher(six)
    qn = CASES[0].normalize()
    ref = _rows(s.search(CASES[0], limit=10, optimize=False))
    got = _rows(s._or_mixed_route(qn, 10, start_k=10_000_000))
    assert got == ref


def test_or_mixed_ineligible_shapes_fall_back(six):
    s = Searcher(six)
    ineligible = [
        Q.Or([Q.Phrase("text", ["hash", "join"]), Q.Term("text", "spark")],
             scale=0.5),
        Q.Or([Q.Term("text", "spark"), Q.Term("text", "join"),
              Q.Phrase("text", ["hash", "join"])], minmatch=2),
        Q.Or([Q.Not(Q.Term("text", "spark")), Q.Term("text", "join")]),
        # negatively boosted child would invert the kernel ranking
        Q.Or([Q.Phrase("text", ["hash", "join"]),
              Q.Term("text", "spark", boost=-1.0)]),
        # boosted COMPOUND child: no clean strip, executor path
        Q.Or([Q.And([Q.Term("text", "hash"), Q.Term("text", "join")],
                    boost=2.0),
              Q.Term("text", "spark")]),
    ]
    for q in ineligible:
        qn = q.normalize()
        assert s._or_mixed_desc(qn) is None, q
        # and search() still answers correctly through the executor
        assert _rows(s.search(q, limit=5)) == _rows(
            s.search(q, limit=5, optimize=False)), q


def test_or_mixed_restriction_never_leaks(six):
    s = Searcher(six)
    s._or_mixed_route(CASES[0].normalize(), 10)
    assert s._within is None
    assert s._within_df is None
    # a later unrestricted query sees the full index
    full = s.search(Q.Term("text", "spark"), limit=5, optimize=False)
    assert full.count() == 5


def test_or_mixed_cap_falls_back_to_executor(six, monkeypatch):
    """A flat tie plateau can hold τ above the k-th total until a huge
    child exhausts; past _TA_MAX_K the route gives up (returns None) and
    search() answers through the executor's single action instead of
    collecting unbounded driver state."""
    import whoosh_spark.search.executor as ex

    s = Searcher(six)
    qn = CASES[0].normalize()
    # cap below the first deepened depth and pin the threshold check shut:
    # start_k=1 can never converge (τ is the children's top-1 sum), so the
    # loop must hit the cap and bail rather than spin to exhaustion
    monkeypatch.setattr(ex, "_TA_DEEPEN", 2)
    monkeypatch.setattr(ex, "_TA_MAX_K", 2)
    assert s._or_mixed_route(qn, 10, start_k=1) is None
    # the end-user path is unaffected: gate -> route -> None -> executor
    monkeypatch.setattr(ex, "_TA_MIN_LEAF_POSTINGS", 0)
    ref = _rows(s.search(CASES[0], limit=10, optimize=False))
    assert _rows(s.search(CASES[0], limit=10)) == ref


def test_or_mixed_broadcast_restriction_matches_isin(six, monkeypatch):
    """Past _TA_ISIN_MAX candidates the rescore restriction switches from
    a literal IN to a broadcast semi-join — surviving rows must be
    identical (the 100 TB plan-size path)."""
    import whoosh_spark.search.executor as ex

    s = Searcher(six)
    ref = _rows(s.search(CASES[0], limit=10, optimize=False))
    monkeypatch.setattr(ex, "_TA_ISIN_MAX", 0)  # force the join variant
    got = _rows(s._or_mixed_route(CASES[0].normalize(), 10))
    assert got == ref


def test_or_mixed_cold_concurrent_stats_exact(spark, ixparts):
    """Round-4 sf1 regression: the route's concurrent child kernels hit a
    COLD index handle — lazy avgdl/doc_count publication must be atomic or
    one thread reads avgdl == 0.0 and silently zeroes its kernel's BM25
    scores (wrong top-k, premature τ convergence). Fresh handle per run:
    nothing warmed before the route."""
    path, corpus = ixparts
    ref = None
    for _ in range(3):
        ix = open_segments(spark, path, corpus, transcript_schema())
        s = Searcher(ix)
        got = _rows(s._or_mixed_route(CASES[0].normalize(), 10))
        if ref is None:
            ref = _rows(s.search(CASES[0], limit=10, optimize=False))
        assert got == ref


def test_field_totals_concurrent_readers_agree(spark, ixparts):
    """Direct pin of the atomic-publication fix: N threads reading
    avg_field_length on a fresh handle all see the same nonzero value
    (the old code published an empty dict before the fill job ran)."""
    from concurrent.futures import ThreadPoolExecutor

    path, corpus = ixparts
    ix = open_segments(spark, path, corpus, transcript_schema())
    with ThreadPoolExecutor(max_workers=8) as pool:
        vals = list(pool.map(
            lambda _: ix.avg_field_length("text"), range(8)))
    assert len(set(vals)) == 1
    assert vals[0] > 0.0
