"""Results-object set operations.

Reference: src/whoosh/searching.py::Results.filter/extend/upgrade/
upgrade_and_extend (~L1000-1300) — combinators over already-executed result
sets. Results here are DataFrames of (doc_id, score, ...); each combinator
returns a frame with a ``_grp`` ordering prefix so downstream
``orderBy("_grp", desc("score"), "doc_id")`` reproduces the reference's
list semantics (upgraded docs first / extended docs appended).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def results_filter(a: DataFrame, allowed: DataFrame) -> DataFrame:
    """Keep only docs also present in ``allowed`` (Results.filter)."""
    return a.join(allowed.select("doc_id"), "doc_id", "left_semi")


def results_extend(a: DataFrame, b: DataFrame) -> DataFrame:
    """a's docs followed by b's docs not already in a (Results.extend)."""
    extra = b.join(a.select("doc_id"), "doc_id", "left_anti")
    return a.withColumn("_grp", F.lit(0)).unionByName(
        extra.withColumn("_grp", F.lit(1))
    )


def results_upgrade(a: DataFrame, upgraded: DataFrame) -> DataFrame:
    """Docs of a that appear in ``upgraded`` move to the front
    (Results.upgrade); scores unchanged."""
    flag = upgraded.select("doc_id").withColumn("_in", F.lit(1))
    return (
        a.join(flag, "doc_id", "left")
        .withColumn("_grp", F.when(F.col("_in") == 1, 0).otherwise(1))
        .drop("_in")
    )


def results_upgrade_and_extend(a: DataFrame, b: DataFrame) -> DataFrame:
    """upgrade(a, b) then extend with b's unseen docs
    (Results.upgrade_and_extend)."""
    up = results_upgrade(a, b)
    extra = b.join(a.select("doc_id"), "doc_id", "left_anti").withColumn(
        "_grp", F.lit(2)
    )
    return up.unionByName(extra.select(*up.columns))


def ordered(results: DataFrame) -> DataFrame:
    cols = results.columns
    order = ([F.asc("_grp")] if "_grp" in cols else []) + [
        F.desc("score"),
        F.asc("doc_id"),
    ]
    return results.orderBy(*order)
