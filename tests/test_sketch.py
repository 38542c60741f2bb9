"""KMV sketch: exact-below-k degeneration, accuracy, merge-losslessness."""

import pytest

from pyspark.sql import functions as F

from whoosh_spark.pipeline.sketch import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(1000).select((F.col("id") % 37).alias("v"),
                                  (F.col("id") % 2).alias("g"))
    out = {r.g: (r.n_kept, r.kmv_estimate)
           for r in kmv_distinct(df, "v", k=256, by="g").collect()}
    # every group sees all 37 values (id and id+37 differ in parity) —
    # below k, so the sketch IS the exact distinct count
    assert out[0] == (37, 37.0) and out[1] == (37, 37.0)


def test_kmv_estimate_accuracy(spark):
    true_n = 20_000
    df = spark.range(60_000).select(F.pmod(F.xxhash64("id"), F.lit(true_n)).alias("v"))
    n_distinct = df.select("v").distinct().count()
    est = kmv_distinct(df, "v", k=512).collect()[0].kmv_estimate
    assert abs(est - n_distinct) / n_distinct < 0.15  # ~1/sqrt(k) error


def test_kmv_two_phase_is_lossless(spark):
    """The salted two-phase k-min must equal a direct global k-min:
    same estimate regardless of num_buckets."""
    df = spark.range(30_000).select(F.pmod(F.xxhash64("id", F.lit(7)),
                                           F.lit(5000)).alias("v"))
    a = kmv_distinct(df, "v", k=128, num_buckets=1).collect()[0]
    b = kmv_distinct(df, "v", k=128, num_buckets=97).collect()[0]
    assert (a.n_kept, a.kmv_estimate) == (b.n_kept, b.kmv_estimate)


def test_kmv_validation(spark):
    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match=">= 2"):
        kmv_distinct(df, "v", k=1)


def test_kmv_merge_equals_whole(spark):
    """Sketch algebra: sketch(A) merged with sketch(B) must equal
    sketch(A ∪ B) — and so must the estimates — without revisiting raw."""
    from whoosh_spark.pipeline.sketch import (
        kmv_distinct, kmv_estimate_from, kmv_merge, kmv_sketch)

    whole = spark.range(40_000).select(
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(9000)).alias("v"),
        (F.col("id") % 3).alias("g"))
    a = whole.where("id % 2 = 0")
    b = whole.where("id % 2 = 1")
    merged = kmv_merge(kmv_sketch(a, "v", k=128, by="g"),
                       kmv_sketch(b, "v", k=128, by="g"), k=128, by="g")
    got = sorted((r.g, r.n_kept, r.kmv_estimate)
                 for r in kmv_estimate_from(merged, k=128, by="g").collect())
    want = sorted((r.g, r.n_kept, r.kmv_estimate)
                  for r in kmv_distinct(whole, "v", k=128, by="g").collect())
    assert got == want


def test_kmv_merge_disjoint_groups(spark):
    """full_outer merge: a group present in only one shard survives."""
    from whoosh_spark.pipeline.sketch import (
        kmv_estimate_from, kmv_merge, kmv_sketch)

    a = spark.createDataFrame([(0, 1), (0, 2)], "g long, v long")
    b = spark.createDataFrame([(1, 7)], "g long, v long")
    merged = kmv_merge(kmv_sketch(a, "v", k=8, by="g"),
                       kmv_sketch(b, "v", k=8, by="g"), k=8, by="g")
    out = {r.g: (r.n_kept, r.kmv_estimate)
           for r in kmv_estimate_from(merged, k=8, by="g").collect()}
    assert out == {0: (2, 2.0), 1: (1, 1.0)}
