"""Distinct-count sketching (the brief's "novel sketch" slot): KMV —
k minimum values (Bar-Yossef et al. 2002, the bottom-k sketch).

Estimator: hash every value uniformly into [0, 1); keep the k smallest
distinct hashes; if the k-th smallest is U_(k), the distinct count is
≈ (k-1)/U_(k). The sketch is tiny (k longs), mergeable (union two
sketches, re-take the k smallest), and — unlike HyperLogLog whose
register layout is implementation-defined — EXACTLY reproducible here
because the hash is md5-derived: the driver entry can oracle-check the
estimate itself, value for value, against the same arithmetic in DuckDB.

Scale shape: one distinct shuffle on (group, hash), then TWO bounded
window passes — per (group, salt-bucket) k-min first (each partition
holds ~n_distinct/P rows), then k-min of the P·k survivors per group.
The global k smallest hashes are always a subset of the union of
per-bucket k smallest, so the two-phase pass is lossless — this is the
partial-aggregation shape a real sketch aggregator runs map-side, and
no window partition is ever unbounded in the group's cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5 prefix of 15 hex digits = 60 uniform bits, comfortably inside int64
_HASH_BITS = 60
_HASH_SPACE = float(2 ** _HASH_BITS)


def kmv_hash(col) -> "F.Column":
    """The sketch's deterministic hash: first 15 hex digits of
    md5(value-as-string) as a long in [0, 2^60)."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15),
                  16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    by: str | None = None,
) -> DataFrame:
    """The raw mergeable sketch: (<by>, sketch) where ``sketch`` is the
    sorted array of the group's k smallest distinct hashes. Ship this
    across shards/batches and combine with :func:`kmv_merge`."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    dims = [by] if by else []
    hashes = df.select(*dims, kmv_hash(col).alias("_h")).distinct()
    return (
        hashes.groupBy(*dims)
        .agg(F.slice(F.sort_array(F.collect_list("_h")), 1, k).alias("sketch"))
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int,
              by: str | None = None) -> DataFrame:
    """Merge two sketch frames (full outer on the group key): union the
    hash sets, drop duplicates, re-take the k smallest — the sketch
    algebra that makes KMV work across shards, days, or index segments
    without ever revisiting raw data."""
    dims = [by] if by else []
    if by:
        j = a.withColumnRenamed("sketch", "_sa").join(
            b.withColumnRenamed("sketch", "_sb"), on=by, how="full_outer")
    else:
        j = a.select(F.col("sketch").alias("_sa")).crossJoin(
            b.select(F.col("sketch").alias("_sb")))
    merged = F.slice(
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce("_sa", F.array().cast("array<long>")),
                    F.coalesce("_sb", F.array().cast("array<long>")),
                )
            )
        ),
        1, k,
    )
    return j.select(*dims, merged.alias("sketch"))


def kmv_estimate_from(sketch_df: DataFrame, k: int,
                      by: str | None = None) -> DataFrame:
    """(<by>, n_kept, kmv_estimate) from a sketch frame — same estimator
    as :func:`kmv_distinct`."""
    dims = [by] if by else []
    n = F.size("sketch")
    hk = F.element_at("sketch", k)
    return sketch_df.select(
        *dims,
        n.cast("long").alias("n_kept"),
        F.round(
            F.when(n < k, n.cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / hk),
            4,
        ).alias("kmv_estimate"),
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 256,
    by: str | None = None,
    num_buckets: int = 64,
) -> DataFrame:
    """KMV distinct-count per ``by`` group (or globally when ``by`` is
    None): (<by>, n_kept, kmv_estimate). When a group has fewer than
    ``k`` distinct hashes the sketch degenerates to the EXACT distinct
    count (n_kept < k and estimate == n_kept); otherwise
    estimate = (k-1) * 2^60 / h_(k).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    dims = [by] if by else []
    hashes = df.select(*dims, kmv_hash(col).alias("_h")).distinct()
    part = hashes.withColumn("_s", F.pmod("_h", F.lit(num_buckets)))
    w1 = Window.partitionBy(*dims, "_s").orderBy("_h")
    cand = (
        part.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_r", "_s")
    )
    w2 = Window.partitionBy(*dims).orderBy("_h") if by else (
        Window.partitionBy(F.lit(0)).orderBy("_h")
    )
    topk = (
        cand.withColumn("_r", F.row_number().over(w2))
        .where(F.col("_r") <= k)
    )
    est = (
        topk.groupBy(*dims)
        .agg(
            F.count("*").alias("n_kept"),
            F.max(F.when(F.col("_r") == k, F.col("_h"))).alias("_hk"),
        )
        .withColumn(
            "kmv_estimate",
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
                .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_hk")),
                4,
            ),
        )
        .drop("_hk")
    )
    return est
