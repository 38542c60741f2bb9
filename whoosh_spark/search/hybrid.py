"""Hybrid lexical + semantic retrieval: RRF fusion and MMR re-ranking.

Composes the verified BM25 search half (search/executor.py, search/wand.py)
with the embedding-similarity kernels (pipeline/similarity.py) — the
retrieval layer a RAG / training-data pipeline puts on top of a full-text
index. Whoosh itself has no hybrid surface; these are part of the
LLM-pipeline extension the brief mandates. Published algorithms only:

- Reciprocal-rank fusion: Cormack, Clarke & Buettcher, SIGIR 2009
  ("Reciprocal rank fusion outperforms Condorcet and individual rank
  learning methods"): rrf(d) = sum_lists w_i / (c + rank_i(d)).
- Maximal marginal relevance: Carbonell & Goldstein, SIGIR 1998:
  greedily pick argmax  lam*rel(d) - (1-lam)*max_{s in S} sim(d, s).

Scale shape: both operators run on SHORTLISTS — the corpus-scale pruning
already happened inside block-max WAND / cosine_topk / IVF, which hand
over <= n_shortlist rows per query. Fusion is a union + one tiny window
+ one groupBy over O(n_lists * n_shortlist) rows; MMR is a per-query
greedy over <= n_shortlist candidate vectors executed inside ONE
applyInPandas group per query (never on the driver, never corpus-wide).
Neither touches the corpus again.

Determinism across engines (the registry discipline, entry_queries.py
module docstring): ranks are computed from scores ROUNDED to 4 decimals
with doc_id ascending as the tie-break, in both Spark and the DuckDB
oracle, so a 1-ulp ln() difference can never flip a rank at a list
boundary. The fused rrf score is a sum of exact rationals w/(c+rank) —
adjacent distinct rank-sets differ by >= ~1e-5 at c=60 while double
noise is ~1e-16, so ordering by the raw fused value is engine-stable.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "hybrid_topk", "mmr_rerank", "rocchio_expand", "rocchio_topk"]


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    c: int = 60,
    weights: Sequence[float] | None = None,
    id_col: str = "doc_id",
    score_col: str = "score",
    round_to: int = 4,
) -> DataFrame:
    """Fuse scored shortlists into one top-k by reciprocal-rank fusion.

    Each input frame is a (id_col, score_col) SHORTLIST (top-n from WAND,
    cosine_topk, ivf_topk, ...). Per list, rank = row_number ordered by
    (round(score, round_to) DESC, id ASC); fused score =
    sum over lists of weight / (c + rank); output (id_col, rrf) top-k
    ordered by (rrf DESC, id ASC).

    One union + one window partitioned by the list index (each partition
    is one bounded shortlist) + one groupBy — no corpus access. Docs
    missing from a list simply contribute nothing for it (standard RRF).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    w = list(weights) if weights is not None else [1.0] * len(rankings)
    if len(w) != len(rankings):
        raise ValueError(f"{len(w)} weights for {len(rankings)} rankings")
    tagged = [
        df.select(
            F.col(id_col),
            F.round(F.col(score_col), round_to).alias("_s"),
            F.lit(i).alias("_list"),
            F.lit(float(w[i])).alias("_w"),
        )
        for i, df in enumerate(rankings)
    ]
    un = tagged[0]
    for t in tagged[1:]:
        un = un.unionByName(t)
    rank_w = Window.partitionBy("_list").orderBy(F.desc("_s"), F.asc(id_col))
    ranked = un.withColumn("_rank", F.row_number().over(rank_w))
    fused = (
        ranked.groupBy(id_col)
        .agg(F.sum(F.col("_w") / (F.lit(float(c)) + F.col("_rank"))).alias("rrf"))
    )
    return fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)


def hybrid_topk(
    searcher,
    q,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_shortlist: int = 50,
    c: int = 60,
    weights: Sequence[float] = (1.0, 1.0),
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """BM25 + embedding-cosine hybrid search -> (doc_id, rrf) top-k.

    ``searcher.compile(q)`` supplies the lexical shortlist (corpus-scale
    pruning via the index; take top n_shortlist by the rounded-score
    discipline) and ``cosine_topk(emb, queries, n_shortlist)`` the
    semantic one (broadcast-queries kernel); ``rrf_fuse`` combines them.
    ``queries`` must be a single-row (vec_id, embedding) frame — the
    query's embedding; its vec_id is excluded as a self-match upstream
    by cosine_topk's own semantics.
    """
    from whoosh_spark.pipeline.similarity import cosine_topk

    lex = (
        searcher.compile(q)
        .withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(n_shortlist)
    )
    sem = cosine_topk(
        emb, queries, k=n_shortlist, vec_col=vec_col, id_col=vec_id_col
    ).select(F.col(vec_id_col).alias("doc_id"), F.col("cosine").alias("score"))
    return rrf_fuse([lex, sem], k=k, c=c, weights=weights)


def mmr_rerank(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    n_shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Diversified top-k by maximal marginal relevance (Carbonell &
    Goldstein 1998) -> (query_id, vec_id, mmr_rank, cosine).

    Stage 1 (corpus-scale): exact cosine_topk shortlist of n_shortlist
    candidates per query — broadcast-queries kernel, no corpus shuffle.
    Stage 2 (bounded): per query, ONE applyInPandas group holding the
    <= n_shortlist candidate vectors runs the greedy selection with
    numpy:  pick argmax  lam*rel(d) - (1-lam) * max_{s in S} cos(d, s),
    ties -> lowest vec_id (candidates are pre-sorted by (-rel, vec_id),
    so numpy's first-argmax IS the tie-break). lam=1.0 degenerates to
    pure relevance order == cosine_topk (pinned in tests AND hash-checked
    against the exact cosine oracle by the ann_mmr_lambda1 driver entry);
    the diversified config is rows-only: a greedy recurrence over the
    selected set is not expressible in one SQL query.

    ``cosine`` in the output is the plain query-candidate cosine (the
    relevance term), NOT the mixed mmr objective — so the lam=1.0 output
    is column-identical to cosine_topk.
    """
    import numpy as np

    from whoosh_spark.pipeline.similarity import cosine_topk

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    short = cosine_topk(emb, queries, k=n_shortlist, vec_col=vec_col, id_col=id_col)
    vecs = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cand = short.join(vecs, short[id_col] == vecs.vec_id).select(
        "query_id", vecs.vec_id, "cosine", "_v"
    )
    lam_f = float(lam)
    kk = int(k)

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cosine", "vec_id"], ascending=[False, True])
        ids = pdf["vec_id"].to_numpy()
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        V = np.stack(pdf["_v"].to_numpy())
        n = np.linalg.norm(V, axis=1)
        n[n == 0.0] = 1.0
        V = V / n[:, None]
        picked: list[int] = []
        max_sim = np.zeros(len(ids))
        alive = np.ones(len(ids), dtype=bool)
        for _ in range(min(kk, len(ids))):
            obj = lam_f * rel - (1.0 - lam_f) * max_sim
            obj[~alive] = -np.inf
            i = int(np.argmax(obj))  # first max = lowest vec_id tie-break
            picked.append(i)
            alive[i] = False
            max_sim = np.maximum(max_sim, V @ V[i])
        p = pdf.iloc[picked]
        return pd.DataFrame(
            {
                "query_id": p["query_id"].to_numpy(),
                "vec_id": p["vec_id"].to_numpy(),
                "mmr_rank": np.arange(1, len(picked) + 1, dtype=np.int32),
                "cosine": p["cosine"].to_numpy(),
            }
        )

    out_schema = "query_id long, vec_id long, mmr_rank int, cosine double"
    return cand.groupBy("query_id").applyInPandas(_greedy, schema=out_schema)


def rocchio_expand(
    emb: DataFrame,
    queries: DataFrame,
    feedback: int = 5,
    alpha: float = 1.0,
    beta: float = 0.75,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio 1971; Manning,
    Raghavan & Schuetze, IIR ch. 9): take each query's top-``feedback``
    cosine neighbors as assumed-relevant, and move the query toward their
    centroid —  q' = alpha*q + beta*mean(feedback vectors)  per dimension
    (no negative term: with pseudo-feedback there are no judged
    non-relevant docs; gamma = 0 is the standard setting). A query with
    zero feedback neighbors degrades to q' = alpha*q (it is kept, not
    dropped).

    Returns (id_col, vec_col) expanded query vectors, drop-in for
    :func:`whoosh_spark.pipeline.cosine_topk`'s ``queries`` side.

    Scale shape: the shortlist comes from the exact cosine kernel
    (broadcast queries x corpus scan, window top-k — or swap in ivf_topk
    upstream for the approximate tier); everything after runs on
    queries x feedback x dim rows — posexplode, ONE groupBy(query, pos)
    sum/count, join to the exploded original query, bounded array_sort
    reassembly (the group_centroids discipline: never collect whole
    vectors into one aggregation state).

    Determinism: each expanded coordinate is ROUNDED to ``round_to``
    decimals — computed as alpha*q[pos] + beta*(sum/count) in this exact
    op order — so the re-rank input is a quantized, engine- and
    partitioning-stable vector and the DuckDB oracle can rebuild q'
    bit-for-bit before scoring.
    """
    from whoosh_spark.pipeline.similarity import cosine_topk

    fb = cosine_topk(emb, queries, k=feedback, vec_col=vec_col,
                     id_col=id_col)
    fbdim = (
        fb.select("query_id", "vec_id")
        .join(emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col)), "vec_id")
        .select("query_id",
                F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("query_id", "pos")
        .agg(F.sum("col").alias("_sv"), F.count(F.lit(1)).alias("_cnt"))
    )
    qdim = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "_qx"),
    )
    # LEFT join: a query with zero feedback neighbors (e.g. the corpus
    # holds only the query vector itself) degrades to the unexpanded
    # q' = alpha*q instead of silently vanishing from the result.
    ex = qdim.join(fbdim, ["query_id", "pos"], "left").select(
        "query_id", "pos",
        F.round(
            F.lit(alpha) * F.col("_qx")
            + F.lit(beta)
            * F.coalesce(F.col("_sv") / F.col("_cnt"), F.lit(0.0)),
            round_to,
        ).alias("_x"),
    )
    return (
        ex.groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_x"))),
                lambda s: s["_x"],
            ).alias(vec_col)
        )
        .select(F.col("query_id").alias(id_col), vec_col)
    )


def rocchio_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    feedback: int = 5,
    alpha: float = 1.0,
    beta: float = 0.75,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-pass pseudo-relevance-feedback retrieval: expand each query
    with :func:`rocchio_expand`, then exact-rescore the corpus against
    the expanded vector -> (query_id, vec_id, cosine) per-query top-k
    with the shared (cosine DESC, vec_id ASC) tie discipline. The
    original query ids ride through, so self-matches stay excluded."""
    from whoosh_spark.pipeline.similarity import cosine_topk

    expanded = rocchio_expand(emb, queries, feedback=feedback, alpha=alpha,
                              beta=beta, vec_col=vec_col, id_col=id_col)
    return cosine_topk(emb, expanded, k=k, vec_col=vec_col, id_col=id_col)
