"""Naive Bayes quality classifier: exact hand-computed model + invariances."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from whoosh_spark.pipeline.classify import nb_filter, nb_score, nb_train

DOCS = [
    (1, "spark shuffle join spark", 1),
    (2, "spark window merge", 1),
    (3, "lorem ipsum dolor lorem", 0),
    (4, "ipsum merge dolor", 0),
    (5, "", 0),  # empty -> bare prior
]


def _py_model(min_df: int = 1):
    """Pure-python NB on DOCS: the independent ground truth."""
    counts: dict[str, list[int]] = {}
    for _i, text, y in DOCS:
        for t in re.findall("[a-z0-9]+", text.lower()):
            c = counts.setdefault(t, [0, 0])
            c[0 if y else 1] += 1
    counts = {t: c for t, c in counts.items() if c[0] + c[1] >= min_df}
    tp = sum(c[0] for c in counts.values())
    tn = sum(c[1] for c in counts.values())
    v = len(counts)
    llr = {
        t: math.log((c[0] + 1) / (tp + v)) - math.log((c[1] + 1) / (tn + v))
        for t, c in counts.items()
    }
    npos = sum(y for *_x, y in DOCS)
    prior = math.log((npos + 1) / (len(DOCS) - npos + 1))
    return llr, prior


def _py_scores(llr: dict, prior: float) -> dict[int, float]:
    out = {}
    for i, text, _y in DOCS:
        toks = re.findall("[a-z0-9]+", text.lower())
        out[i] = prior + sum(llr.get(t, 0.0) for t in toks)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, y int")


def test_nb_train_matches_pure_python(spark, docs_df):
    llr, prior = _py_model()
    got = {
        r["term"]: (r["llr"], r["prior"])
        for r in nb_train(docs_df, F.col("y") == 1).collect()
    }
    assert set(got) == set(llr)
    for t, w in llr.items():
        assert got[t][0] == pytest.approx(w, abs=1e-12)
        assert got[t][1] == pytest.approx(prior, abs=1e-12)


def test_nb_score_matches_pure_python(spark, docs_df):
    llr, prior = _py_model()
    want = _py_scores(llr, prior)
    w = nb_train(docs_df, F.col("y") == 1)
    got = {r["doc_id"]: r["score"] for r in nb_score(docs_df, w).collect()}
    assert set(got) == set(want)
    for i, s in want.items():
        assert got[i] == pytest.approx(s, abs=1e-9)
    # the empty doc scores the bare prior
    assert got[5] == pytest.approx(prior, abs=1e-12)


def test_positive_docs_score_above_negative(spark, docs_df):
    w = nb_train(docs_df, F.col("y") == 1)
    got = {r["doc_id"]: r["score"] for r in nb_score(docs_df, w).collect()}
    assert min(got[1], got[2]) > max(got[3], got[4])


def test_min_df_prunes_vocabulary(spark, docs_df):
    llr2, _ = _py_model(min_df=2)
    got = {r["term"] for r in nb_train(docs_df, F.col("y") == 1, min_df=2).collect()}
    assert got == set(llr2)
    # pruning changed the totals too, not just the row set
    w2 = {
        r["term"]: r["llr"]
        for r in nb_train(docs_df, F.col("y") == 1, min_df=2).collect()
    }
    for t, v in llr2.items():
        assert w2[t] == pytest.approx(v, abs=1e-12)


def test_partitioning_invariance(spark, docs_df):
    w = nb_train(docs_df, F.col("y") == 1)
    base = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in nb_score(docs_df, w).collect()
    )
    shuf = docs_df.repartition(7)
    w7 = nb_train(shuf, F.col("y") == 1)
    got = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in nb_score(shuf, w7).collect()
    )
    assert got == base


def test_nb_filter_threshold(spark, docs_df):
    w = nb_train(docs_df, F.col("y") == 1)
    scores = {r["doc_id"]: r["score"] for r in nb_score(docs_df, w).collect()}
    thr = 0.0
    kept = {r["doc_id"] for r in nb_filter(docs_df, w, threshold=thr).collect()}
    assert kept == {i for i, s in scores.items() if s >= thr}
    # filter preserves the original columns
    cols = nb_filter(docs_df, w).columns
    assert set(cols) >= {"doc_id", "text", "y"}
