"""Hybrid retrieval: RRF fusion, hybrid BM25+cosine top-k, MMR re-rank,
and the group_topn collector."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whoosh_spark import query as Q
from whoosh_spark.fields import documents_schema
from whoosh_spark.indexing import build_index
from whoosh_spark.pipeline import cosine_topk
from whoosh_spark.search import Searcher, hybrid_topk, mmr_rerank, rrf_fuse

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    e.count()
    return e


@pytest.fixture(scope="module")
def searcher(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return Searcher(build_index(spark, docs, documents_schema()).persist())


# ------------------------------------------------------------------ rrf


def test_rrf_hand_case(spark):
    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(2, 0.9), (4, 0.8)], "doc_id long, score double")
    got = {r.doc_id: r.rrf for r in rrf_fuse([a, b], k=10, c=60).collect()}
    exp = {
        1: 1 / 61,
        2: 1 / 62 + 1 / 61,  # rank 2 in a, rank 1 in b
        3: 1 / 63,
        4: 1 / 62,
    }
    assert set(got) == set(exp)
    for d, v in exp.items():
        assert math.isclose(got[d], v, rel_tol=1e-12)
    # doc 2 (in both lists) fuses above everything else
    order = [r.doc_id for r in rrf_fuse([a, b], k=10).collect()]
    assert order[0] == 2


def test_rrf_weights_and_validation(spark):
    a = spark.createDataFrame([(1, 2.0)], "doc_id long, score double")
    b = spark.createDataFrame([(2, 2.0)], "doc_id long, score double")
    got = {r.doc_id: r.rrf for r in rrf_fuse([a, b], weights=[3.0, 1.0]).collect()}
    assert math.isclose(got[1], 3 / 61) and math.isclose(got[2], 1 / 61)
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1.0])


def test_rrf_rank_ties_break_by_doc_id(spark):
    # equal rounded scores -> ranks assigned in doc_id order
    a = spark.createDataFrame([(7, 1.0), (3, 1.0)], "doc_id long, score double")
    got = {r.doc_id: r.rrf for r in rrf_fuse([a], k=10).collect()}
    assert math.isclose(got[3], 1 / 61) and math.isclose(got[7], 1 / 62)


def test_hybrid_topk_matches_python_reference(spark, searcher, emb):
    q = Q.Or([Q.Term("text", "spark"), Q.Term("text", "hash")])
    queries = emb.where("vec_id = 0")
    got = hybrid_topk(searcher, q, emb, queries, k=10, n_shortlist=20)
    rows = got.collect()

    # pure-python RRF over the two shortlists, same rounding discipline
    lex = (
        searcher.compile(q).withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id")).limit(20).collect()
    )
    sem = cosine_topk(emb, queries, k=20).collect()
    fused: dict = {}
    for rank, r in enumerate(
        sorted(lex, key=lambda r: (-r.score, r.doc_id)), start=1
    ):
        fused[r.doc_id] = fused.get(r.doc_id, 0.0) + 1 / (60 + rank)
    for rank, r in enumerate(
        sorted(sem, key=lambda r: (-round(r.cosine, 4), r.vec_id)), start=1
    ):
        fused[r.vec_id] = fused.get(r.vec_id, 0.0) + 1 / (60 + rank)
    exp = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.doc_id, round(r.rrf, 10)) for r in rows] == [
        (d, round(v, 10)) for d, v in exp
    ]


# ------------------------------------------------------------------ mmr


def test_mmr_lambda1_is_cosine_order(spark, emb):
    qs = emb.where("vec_id < 2")
    exact = cosine_topk(emb, qs, k=5).orderBy("query_id", F.desc("cosine"), "vec_id").collect()
    got = mmr_rerank(emb, qs, k=5, lam=1.0, n_shortlist=20).orderBy(
        "query_id", "mmr_rank"
    ).collect()
    assert [(r.query_id, r.vec_id) for r in got] == [
        (r.query_id, r.vec_id) for r in exact
    ]
    for g, e in zip(got, exact):
        assert math.isclose(g.cosine, e.cosine, rel_tol=1e-9)


def _mmr_reference(V, qv, ids, lam, k):
    """Brute-force MMR over normalized candidate vectors."""
    Vn = V / np.linalg.norm(V, axis=1)[:, None]
    rel = Vn @ (qv / np.linalg.norm(qv))
    order = sorted(range(len(ids)), key=lambda i: (-rel[i], ids[i]))
    Vn, rel, ids = Vn[order], rel[order], [ids[i] for i in order]
    picked, max_sim = [], np.zeros(len(ids))
    alive = np.ones(len(ids), dtype=bool)
    for _ in range(min(k, len(ids))):
        obj = lam * rel - (1 - lam) * max_sim
        obj[~alive] = -np.inf
        i = int(np.argmax(obj))
        picked.append(ids[i])
        alive[i] = False
        max_sim = np.maximum(max_sim, Vn @ Vn[i])
    return picked


def test_mmr_diversifies_and_matches_reference(spark):
    # two tight clusters near the query + one off-axis doc: pure relevance
    # keeps the whole first cluster; MMR at lam=0.5 must interleave.
    rows = [
        (0, [1.0, 0.0, 0.0]),        # query
        (1, [0.99, 0.1, 0.0]),
        (2, [0.98, 0.11, 0.0]),
        (3, [0.97, 0.12, 0.0]),
        (4, [0.6, 0.8, 0.0]),
        (5, [0.59, 0.81, 0.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    qs = emb.where("vec_id = 0")
    got = (
        mmr_rerank(emb, qs, k=4, lam=0.3, n_shortlist=10)
        .orderBy("mmr_rank").collect()
    )
    V = np.array([v for i, v in rows if i != 0])
    ids = [i for i, _ in rows if i != 0]
    exp = _mmr_reference(V, np.array(rows[0][1]), ids, lam=0.3, k=4)
    assert [r.vec_id for r in got] == exp
    # the diversified list promotes the off-axis cluster ahead of the
    # remaining near-cluster docs (pure relevance order is [1, 2, 3, 4])
    assert [r.vec_id for r in got] != [1, 2, 3, 4]
    assert {4, 5} & {r.vec_id for r in got[:2]}


def test_mmr_partitioning_invariance(spark, emb):
    qs = emb.where("vec_id < 2")
    a = mmr_rerank(emb, qs, k=5, lam=0.6).orderBy("query_id", "mmr_rank").collect()
    b = (
        mmr_rerank(emb.repartition(7), qs, k=5, lam=0.6)
        .orderBy("query_id", "mmr_rank").collect()
    )
    assert [(r.query_id, r.vec_id, r.mmr_rank) for r in a] == [
        (r.query_id, r.vec_id, r.mmr_rank) for r in b
    ]


def test_mmr_lam_validation(spark, emb):
    with pytest.raises(ValueError):
        mmr_rerank(emb, emb.where("vec_id = 0"), lam=1.5)


# ------------------------------------------------------------ group_topn


def test_group_topn_n1_equals_group_best(spark, searcher):
    q = Q.Term("text", "spark")
    scored = searcher.compile(q).withColumn("score", F.round("score", 4))
    best = {(r.lang, r.doc_id) for r in searcher.group_best(scored, "lang").collect()}
    top1 = {(r.lang, r.doc_id) for r in searcher.group_topn(scored, "lang", n=1).collect()}
    assert best == top1


def test_group_topn_shape(spark, searcher):
    q = Q.Or([Q.Term("text", "spark"), Q.Term("text", "index")])
    scored = searcher.compile(q).withColumn("score", F.round("score", 4))
    rows = searcher.group_topn(scored, "lang", n=3).collect()
    per_group: dict = {}
    for r in rows:
        per_group.setdefault(r.lang, []).append(r)
    for g, rs in per_group.items():
        assert len(rs) <= 3
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # within a group: ordered by score desc then doc_id
        key = [(-r.score, r.doc_id) for r in rs]
        assert key == sorted(key)


# ------------------------------------------------------------------ rocchio


def test_rocchio_numpy_reference(spark, emb):
    from whoosh_spark.search.hybrid import rocchio_topk

    queries = emb.where("vec_id < 2")
    got = rocchio_topk(emb, queries, k=5, feedback=3).collect()

    rows = emb.collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for qid in (0, 1):
        q = vecs[qid]
        ranked = sorted(
            ((cos(q, v), i) for i, v in vecs.items() if i != qid),
            key=lambda t: (-t[0], t[1]))
        fb = [vecs[i] for _, i in ranked[:3]]
        centroid = np.sum(fb, axis=0) / len(fb)
        qq = np.round(1.0 * q + 0.75 * centroid, 6)
        rer = sorted(
            ((cos(qq, v), i) for i, v in vecs.items() if i != qid),
            key=lambda t: (-t[0], t[1]))[:5]
        exp_ids = [i for _, i in rer]
        got_q = [r.vec_id for r in sorted(
            (r for r in got if r.query_id == qid),
            key=lambda r: (-r.cosine, r.vec_id))]
        assert got_q == exp_ids, qid
        for (c_exp, i), r in zip(
                rer, sorted((r for r in got if r.query_id == qid),
                            key=lambda r: (-r.cosine, r.vec_id))):
            assert abs(r.cosine - c_exp) < 1e-9


def test_rocchio_beta0_is_cosine_topk(spark, emb):
    # beta = 0 degenerates q' to (a rounded copy of) q: same ranking as
    # the plain exact kernel — pins the whole expand/reassemble machinery
    from whoosh_spark.search.hybrid import rocchio_topk

    queries = emb.where("vec_id < 3")
    base = cosine_topk(emb, queries, k=8)
    got = rocchio_topk(emb, queries, k=8, feedback=3, beta=0.0)
    b = [(r.query_id, r.vec_id) for r in
         sorted(base.collect(), key=lambda r: (r.query_id, -r.cosine, r.vec_id))]
    g = [(r.query_id, r.vec_id) for r in
         sorted(got.collect(), key=lambda r: (r.query_id, -r.cosine, r.vec_id))]
    assert b == g


def test_rocchio_no_feedback_degrades_to_alpha_q(spark):
    # ADVICE r4: a query with ZERO feedback neighbors (corpus = just the
    # query vector itself) must degrade to q' = alpha*q, not vanish.
    from whoosh_spark.search.hybrid import rocchio_expand

    solo = spark.createDataFrame(
        [(7, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    got = rocchio_expand(solo, solo, feedback=3, alpha=1.0, beta=0.75).collect()
    assert len(got) == 1
    assert got[0].vec_id == 7
    assert list(got[0].embedding) == [1.0, 2.0, 3.0]

    # mixed frame: one query with neighbors, one without — both survive.
    corpus = spark.createDataFrame(
        [(7, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(7, [1.0, 2.0, 3.0]), (8, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: list(r.embedding)
            for r in rocchio_expand(corpus, queries, feedback=2).collect()}
    assert set(rows) == {7, 8}
    # 8 has one neighbor (7): q' = q + 0.75*[1,2,3]
    assert rows[8] == [0.75, 2.5, 2.25]
    # 7's only potential neighbor is itself (excluded): q' = q
    assert rows[7] == [1.0, 2.0, 3.0]


def test_rocchio_partitioning_invariance(spark, emb):
    from whoosh_spark.search.hybrid import rocchio_topk

    queries = emb.where("vec_id < 2")
    a = rocchio_topk(emb, queries, k=5).collect()
    b = rocchio_topk(emb.repartition(17), queries.coalesce(1), k=5).collect()
    key = lambda r: (r.query_id, r.vec_id)
    assert sorted(map(tuple, a), key=lambda t: t[:2]) == \
           sorted(map(tuple, b), key=lambda t: t[:2])
