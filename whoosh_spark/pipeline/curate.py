"""End-to-end corpus curation: the composed verdict a training-data
pipeline computes per document before a run — language ID, quality score,
exact-dup canonicality, near-dup transitive-cluster canonicality
(MinHash-LSH -> connected-components sweep), and the final keep flag.

Composition, not new math: every stage is one of the already-oracled
pipeline operators, joined on doc_id. The point of shipping it composed is
the SHAPE — at 100 TB each stage is its own bounded-shuffle pass (dedup.py
and textstats.py document each one's scale story), the joins are all on
the doc-id key, and the output is a single labeled frame a training job
can filter with `WHERE keep`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_spark.pipeline.dedup import (
    dedup_sweep,
    exact_duplicates,
    minhash_dedup_pairs,
    select_canonical,
)
from whoosh_spark.pipeline.textstats import langid, quality_scores


def curation_labels(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", quality_min: float = 0.05,
                    jaccard_threshold: float = 0.8,
                    keep_best_quality: bool = False,
                    classifier_weights: DataFrame | None = None,
                    classifier_min: float = 0.0,
                    line_shape: bool = False) -> DataFrame:
    """(doc_id, lang_pred, quality, exact_canonical, cluster_id,
    cluster_canonical[, clf_score], keep) for every doc.

    keep = exact_canonical AND cluster_canonical AND quality >=
    quality_min — keep one representative per exact group and per
    near-dup cluster, drop low-quality text. Language is labeled, not
    filtered (mix decisions are downstream policy; filter on lang_pred).

    ``keep_best_quality=True`` picks each near-dup cluster's canonical by
    HIGHEST quality score (ties -> min doc_id, via
    :func:`~whoosh_spark.pipeline.dedup.select_canonical`) instead of
    min-id — the FineWeb/Dolma keep-the-best-copy rule; exact-group
    canonicals stay min-id (identical texts have identical quality).

    ``classifier_weights`` (a :func:`~whoosh_spark.pipeline.classify.
    nb_train` model) adds the model-based filter tier: a ``clf_score``
    column and ``AND clf_score >= classifier_min`` folded into keep —
    the heuristic-then-model gauntlet FineWeb/DCLM run.

    ``line_shape=True`` adds the MassiveText line-shape gate
    (:func:`~whoosh_spark.pipeline.textstats.line_shape_stats`): a
    ``shape_ok`` column ANDed into keep — another narrow map on the same
    scan, no extra shuffle beyond its doc-id join.
    """
    q = quality_scores(docs, text_col, id_col).select("doc_id", "quality")
    lid = langid(docs, text_col, id_col).select("doc_id", "lang_pred")
    ex = exact_duplicates(docs, text_col, id_col).select(
        "doc_id", F.col("is_canonical").alias("exact_canonical"))
    sweep = dedup_sweep(
        docs,
        minhash_dedup_pairs(docs, text_col=text_col,
                            threshold=jaccard_threshold, id_col=id_col),
        id_col=id_col,
    ).select("doc_id", "cluster_id",
             F.col("is_canonical").alias("cluster_canonical"))
    if keep_best_quality:
        sweep = select_canonical(
            sweep.select("doc_id", "cluster_id"), q, "quality"
        ).select("doc_id", "cluster_id",
                 F.col("is_canonical").alias("cluster_canonical"))
    out = q.join(lid, "doc_id").join(ex, "doc_id").join(sweep, "doc_id")
    keep = (F.col("exact_canonical") & F.col("cluster_canonical")
            & (F.col("quality") >= quality_min))
    cols = ["doc_id", "lang_pred", "quality", "exact_canonical",
            "cluster_id", "cluster_canonical"]
    if classifier_weights is not None:
        from whoosh_spark.pipeline.classify import nb_score

        clf = nb_score(docs, classifier_weights, text_col=text_col,
                       id_col=id_col).withColumnRenamed("score", "clf_score")
        out = out.join(clf, "doc_id")
        keep = keep & (F.col("clf_score") >= classifier_min)
        cols.append("clf_score")
    if line_shape:
        from whoosh_spark.pipeline.textstats import line_shape_stats

        shape = line_shape_stats(docs, text_col, id_col).select(
            "doc_id", F.col("keep").alias("shape_ok"))
        out = out.join(shape, "doc_id")
        keep = keep & F.col("shape_ok")
        cols.append("shape_ok")
    return out.select(*cols, keep.alias("keep"))
