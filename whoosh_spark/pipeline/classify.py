"""Model-based quality classification (the FineWeb / DCLM filter tier).

A multinomial Naive Bayes log-likelihood-ratio classifier over document
tokens — the distributed analogue of the fastText/linear "quality
classifier" stage every large-scale training-data pipeline runs between
heuristic filtering and dedup (Penedo 2024 FineWeb §3.3, Li 2024 DCLM
§4.3 both train a linear token classifier against a gold reference set
and keep documents above a score threshold). Count-based NB is the
natural 100 TB formulation: training is ONE map-side-combined
``groupBy(term)`` over the exploded token stream, the model is a plain
``(term, llr)`` DataFrame (mergeable: counts add), and scoring is two
key shuffles with no driver-side state.

Determinism: tokenization is the same lowercased ``[a-z0-9]+`` JVM regex
the rest of the textstats tier uses; all counts are exact integers, so
the weights are reproducible bit-for-bit across partitionings up to
float-sum commutativity absorbed by the callers' round-to-4 convention.

Scale shape
-----------
- ``nb_train``: explode tokens -> groupBy(term) [one shuffle, partial
  aggregation]; class totals and vocabulary size ride a broadcast 1-row
  totals frame (the same scalar-attachment pattern as the sketches).
  ``min_df`` prunes the hapax tail BEFORE totals so the model stays
  bounded at web scale (and the SQL mirror stays exact).
- ``nb_score``: per-doc term frequencies [shuffle 1, keyed
  (doc_id, term)] -> equi-join to the weight table on ``term`` ->
  groupBy(doc_id) [shuffle 2]. Out-of-vocabulary tokens contribute 0
  (vocabulary-restricted NB); a document with no in-vocabulary tokens
  scores exactly the class prior.

No reference analogue: Whoosh has no document classifier — this is part
of the beyond-reference training-data pipeline surface (brief: "quality
scoring" family, model-based tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = "[a-z0-9]+"


def _tokens(text_col: str) -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0)


def nb_train(
    docs: DataFrame,
    positive: Column,
    text_col: str = "text",
    min_df: int = 1,
    eager: bool = True,
) -> DataFrame:
    """Train a multinomial NB token model -> (term, llr, prior).

    ``positive`` is a boolean Column marking the gold/reference class
    (e.g. ``F.col("lang") == "en"`` or membership in a curated source).
    Laplace add-one smoothing on both classes; ``llr`` is

        ln((c_pos+1)/(T_pos+V)) - ln((c_neg+1)/(T_neg+V))

    with T_* the kept-vocabulary class token totals and V the kept
    vocabulary size. ``prior`` = ln((N_pos+1)/(N_neg+1)) over documents,
    repeated on every row so the model stays a single self-contained
    DataFrame (scoring reads it back via a 1-row limit, never a
    collect).

    ``eager`` pins the count table via ``localCheckpoint`` so the totals
    aggregate and the per-term weights share ONE materialized token pass
    instead of re-running the explode+groupBy lineage twice (the same
    pattern as ``sketch.bloom_contains``); pass ``eager=False`` to stay
    fully lazy.
    """
    y = F.when(positive, F.lit(1)).otherwise(F.lit(0))
    toks = docs.select(
        y.alias("y"), F.explode(_tokens(text_col)).alias("term")
    )
    counts = (
        toks.groupBy("term")
        .agg(
            F.sum("y").alias("c_pos"),
            F.sum(F.lit(1) - F.col("y")).alias("c_neg"),
        )
        .where((F.col("c_pos") + F.col("c_neg")) >= F.lit(min_df))
    )
    if eager:
        counts = counts.localCheckpoint(eager=True)
    totals = counts.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    ndocs = docs.agg(
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1) - y).alias("n_neg"),
    )
    prior = ndocs.select(
        F.log(
            (F.col("n_pos") + F.lit(1)) / (F.col("n_neg") + F.lit(1))
        ).alias("prior")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(prior))
        .select(
            "term",
            (
                F.log(
                    (F.col("c_pos") + F.lit(1))
                    / (F.col("t_pos") + F.col("v"))
                )
                - F.log(
                    (F.col("c_neg") + F.lit(1))
                    / (F.col("t_neg") + F.col("v"))
                )
            ).alias("llr"),
            "prior",
        )
    )


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document -> (id_col, score).

    score = prior + sum over in-vocabulary tokens of tf * llr. Documents
    whose tokens are all out-of-vocabulary (or empty) score the bare
    prior — the LEFT join keeps every input row.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    part = (
        tf.join(weights.select("term", "llr"), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("llr")).alias("part"))
    )
    prior = F.broadcast(weights.select("prior").limit(1))
    return (
        docs.select(id_col)
        .join(part, id_col, "left")
        .crossJoin(prior)
        .select(
            id_col,
            (F.col("prior") + F.coalesce(F.col("part"), F.lit(0.0))).alias(
                "score"
            ),
        )
    )


def nb_filter(
    docs: DataFrame,
    weights: DataFrame,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents scoring >= threshold (the pipeline filter stage)."""
    kept = nb_score(docs, weights, text_col=text_col, id_col=id_col).where(
        F.col("score") >= F.lit(threshold)
    )
    return docs.join(kept, id_col)
