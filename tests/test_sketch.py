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


# ------------------------------------------------------------------- HLL


def test_hll_accuracy(spark):
    from whoosh_spark.pipeline.sketch import hll_distinct

    df = spark.range(2000).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v", b=10).collect()[0]
    assert abs(est.hll_estimate - 2000) / 2000 < 0.05  # ~1.04/sqrt(1024)


def test_hll_linear_counting_small_range(spark):
    from whoosh_spark.pipeline.sketch import hll_distinct

    df = spark.range(20).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v", b=6).collect()[0]
    # small-range path: m*ln(m/zeros) with most registers empty
    assert est.n_buckets < 64
    assert abs(est.hll_estimate - 20) / 20 < 0.2


def test_hll_duplicates_do_not_inflate(spark):
    from whoosh_spark.pipeline.sketch import hll_distinct

    base = spark.range(500).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    dup = base.unionAll(base).unionAll(base)
    a = hll_distinct(base, "v", b=8).collect()[0]
    b = hll_distinct(dup, "v", b=8).collect()[0]
    assert (a.n_buckets, a.hll_estimate) == (b.n_buckets, b.hll_estimate)


def test_hll_partitioning_invariance(spark):
    from whoosh_spark.pipeline.sketch import hll_distinct

    df = spark.range(3000).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    a = hll_distinct(df.repartition(1), "v", b=7).collect()[0]
    b = hll_distinct(df.repartition(13), "v", b=7).collect()[0]
    assert (a.n_buckets, a.hll_estimate) == (b.n_buckets, b.hll_estimate)


def test_hll_merge_equals_whole(spark):
    from whoosh_spark.pipeline.sketch import (hll_estimate_from, hll_merge,
                                              hll_registers)

    df = spark.range(2000).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    lo, hi = df.where("substr(v, 2) < '1'"), df.where("substr(v, 2) >= '1'")
    whole = hll_estimate_from(hll_registers(df, "v", b=6), b=6).collect()[0]
    merged = hll_estimate_from(
        hll_merge(hll_registers(lo, "v", b=6), hll_registers(hi, "v", b=6)),
        b=6).collect()[0]
    assert (whole.n_buckets, whole.hll_estimate) == (
        merged.n_buckets, merged.hll_estimate)


def test_hll_grouped(spark):
    from whoosh_spark.pipeline.sketch import hll_distinct

    df = spark.range(400).select(
        (F.col("id") % 2).alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 40)).alias("v"))
    out = {r.g: r for r in hll_distinct(df, "v", b=10, by="g").collect()}
    # each parity group sees exactly 20 distinct values; with 1024
    # registers and 20 values the linear-counting path is near-exact
    for g in (0, 1):
        assert abs(out[g].hll_estimate - 20) < 1.0


def test_hll_validation(spark):
    from whoosh_spark.pipeline.sketch import hll_registers

    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="b must be"):
        hll_registers(df, "v", b=1)


# -------------------------------------------------------------- Count-min


def _words(spark):
    rows = ([("spark",)] * 70 + [("join",)] * 30 + [("hash",)] * 11
            + [("vector",)] * 3 + [("rare",)] * 1)
    return spark.createDataFrame(rows, "w string")


def test_cm_never_undercounts_and_exact_when_wide(spark):
    from whoosh_spark.pipeline.sketch import cm_estimate_from, cm_sketch

    words = _words(spark)
    truth = {r.w: r.cnt for r in
             words.groupBy("w").agg(F.count("*").alias("cnt")).collect()}
    # wide sketch: no collisions possible to matter at 5 keys x 4096 cols
    cells = cm_sketch(words, "w", depth=3, width=4096)
    est = {r.key: r.cm_estimate for r in
           cm_estimate_from(cells, list(truth) + ["absent"], 3, 4096).collect()}
    for k, t in truth.items():
        assert est[k] == t
    assert est["absent"] == 0
    # narrow sketch: collisions over-count but NEVER under-count
    cells2 = cm_sketch(words, "w", depth=2, width=4)
    est2 = {r.key: r.cm_estimate for r in
            cm_estimate_from(cells2, list(truth), 2, 4).collect()}
    for k, t in truth.items():
        assert est2[k] >= t


def test_cm_merge_equals_whole(spark):
    from whoosh_spark.pipeline.sketch import (cm_estimate_from, cm_merge,
                                              cm_sketch)

    df = spark.range(5000).select(
        F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), F.lit(700))).alias("w"))
    lo, hi = df.where("substr(w, 2)::INT < 350"), df.where("substr(w, 2)::INT >= 350")
    whole = cm_sketch(df, "w", depth=3, width=256)
    merged = cm_merge(cm_sketch(lo, "w", depth=3, width=256),
                      cm_sketch(hi, "w", depth=3, width=256))
    probe = [f"t{i}" for i in range(0, 700, 37)]
    a = sorted(cm_estimate_from(whole, probe, 3, 256).collect())
    b = sorted(cm_estimate_from(merged, probe, 3, 256).collect())
    assert a == b


def test_cm_weight_column(spark):
    from whoosh_spark.pipeline.sketch import cm_estimate_from, cm_sketch

    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 2)], "w string, n int")
    cells = cm_sketch(df, "w", depth=3, width=1024, weight="n")
    est = {r.key: r.cm_estimate for r in
           cm_estimate_from(cells, ["a", "b"], 3, 1024).collect()}
    assert est == {"a": 12, "b": 2}


def test_cm_validation(spark):
    from whoosh_spark.pipeline.sketch import cm_sketch

    df = spark.range(5).select(F.col("id").cast("string").alias("w"))
    with pytest.raises(ValueError, match="bad sketch shape"):
        cm_sketch(df, "w", depth=0, width=8)


# ------------------------------------------------- histogram quantiles


def test_hist_quantile_error_bound(spark):
    from whoosh_spark.pipeline.sketch import hist_quantiles

    df = spark.range(10_000).select((F.col("id") % 10_000 / 100.0).alias("v"))
    out = {r.q: r.est for r in
           hist_quantiles(df, "v", [0.5, 0.9, 0.99], subbits=5).collect()}
    for q, true in ((0.5, 50.0), (0.9, 90.0), (0.99, 99.0)):
        # lower-edge estimate: never above truth (+bucket granularity),
        # never more than 2^-subbits relative below it
        assert true * (1 - 2 ** -5) - 0.2 <= out[q] <= true + 0.1


def test_hist_merge_equals_whole(spark):
    from whoosh_spark.pipeline.sketch import (hist_merge, hist_quantiles_from,
                                              hist_sketch)

    df = spark.range(8_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(5000)) / 7.0).alias("v"))
    lo, hi = df.where("v < 300"), df.where("v >= 300")
    qs = [0.25, 0.5, 0.75, 0.95]
    whole = hist_quantiles_from(hist_sketch(df, "v", subbits=4), qs,
                                subbits=4).collect()
    merged = hist_quantiles_from(
        hist_merge(hist_sketch(lo, "v", subbits=4),
                   hist_sketch(hi, "v", subbits=4)),
        qs, subbits=4).collect()
    assert sorted(whole) == sorted(merged)


def test_hist_partitioning_invariance_and_negatives(spark):
    from whoosh_spark.pipeline.sketch import hist_quantiles

    df = spark.range(3_000).select((F.col("id") - 500.0).alias("v"))
    a = sorted(hist_quantiles(df.repartition(1), "v", [0.1, 0.5]).collect())
    b = sorted(hist_quantiles(df.repartition(11), "v", [0.1, 0.5]).collect())
    assert a == b
    # negatives clamp into bucket 0 => the 0.1 quantile (rank 300 of
    # 3000, inside the 500 negatives) reports the 0 lower edge
    assert a[0].est == 0.0


def test_hist_grouped(spark):
    from whoosh_spark.pipeline.sketch import hist_quantiles

    df = spark.range(2_000).select(
        (F.col("id") % 2).alias("g"),
        F.when(F.col("id") % 2 == 0, F.col("id") % 100)
        .otherwise((F.col("id") % 100) * 10.0).alias("v"))
    out = {(r.g, r.q): r.est for r in
           hist_quantiles(df, "v", [0.5], by="g", subbits=5).collect()}
    # medians an order of magnitude apart survive grouping
    assert out[(1, 0.5)] > 5 * out[(0, 0.5)]


def test_hist_validation(spark):
    from whoosh_spark.pipeline.sketch import hist_sketch

    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="subbits"):
        hist_sketch(df, "v", subbits=0)


# ----------------------------------------------------------- bloom filter


def test_bloom_no_false_negatives_even_tiny(spark):
    from whoosh_spark.pipeline.sketch import bloom_bits, bloom_contains

    keys = spark.range(400).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    # deliberately saturated filter: false positives abound, negatives never
    bits = bloom_bits(keys, "key", m_bits=256, k=3)
    probe = spark.range(800).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    res = {r.key: r.maybe_present for r in
           bloom_contains(bits, probe, "key", m_bits=256, k=3).collect()}
    assert all(res[f"k{i}"] for i in range(400))


def test_bloom_rejects_most_absent_keys_when_sized(spark):
    from whoosh_spark.pipeline.sketch import bloom_bits, bloom_contains

    keys = spark.range(500).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    bits = bloom_bits(keys, "key", m_bits=1 << 14, k=5)
    absent = spark.range(500, 1500).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"))
    res = bloom_contains(bits, absent, "key", m_bits=1 << 14, k=5)
    n_fp = res.where("maybe_present").count()
    assert n_fp <= 5  # (1-e^{-kn/m})^k ~ 5e-5 at this sizing


def test_bloom_merge_equals_whole(spark):
    from whoosh_spark.pipeline.sketch import (bloom_bits, bloom_contains,
                                              bloom_merge)

    keys = spark.range(600).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    lo, hi = keys.where("substr(key, 2)::INT < 300"), \
        keys.where("substr(key, 2)::INT >= 300")
    whole = bloom_bits(keys, "key", m_bits=2048, k=4)
    merged = bloom_merge(bloom_bits(lo, "key", m_bits=2048, k=4),
                         bloom_bits(hi, "key", m_bits=2048, k=4))
    assert sorted(r.bit for r in whole.collect()) == \
        sorted(r.bit for r in merged.collect())


def test_bloom_validation(spark):
    from whoosh_spark.pipeline.sketch import bloom_bits

    df = spark.range(5).select(F.col("id").alias("key"))
    with pytest.raises(ValueError, match="bad filter shape"):
        bloom_bits(df, "key", m_bits=1, k=0)


def test_hll_ignores_nulls_like_count_distinct(spark):
    from whoosh_spark.pipeline.sketch import hll_distinct

    base = spark.range(300).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    with_nulls = base.unionByName(
        spark.range(50).select(F.lit(None).cast("string").alias("v")))
    a = hll_distinct(base, "v", b=8).collect()[0]
    b = hll_distinct(with_nulls, "v", b=8).collect()[0]
    assert (a.n_buckets, a.hll_estimate) == (b.n_buckets, b.hll_estimate)


def test_hll_b_below_published_constants_rejected(spark):
    from whoosh_spark.pipeline.sketch import hll_registers

    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match=r"\[4, 16\]"):
        hll_registers(df, "v", b=3)


def test_hist_ignores_nulls(spark):
    from whoosh_spark.pipeline.sketch import hist_quantiles

    base = spark.range(500).select((F.lit(100.0)).alias("v"))
    with_nulls = base.unionByName(
        spark.range(500).select(F.lit(None).cast("double").alias("v")))
    a = hist_quantiles(base, "v", [0.5], subbits=5).collect()[0]
    b = hist_quantiles(with_nulls, "v", [0.5], subbits=5).collect()[0]
    # NULLs must not drag the median toward bucket 0
    assert a.est == b.est and b.est > 90.0


# --------------------------------------------------------------- set ops


def test_kmv_set_ops_exact_tier(spark):
    from whoosh_spark.pipeline import kmv_set_ops

    # below k everything degenerates to EXACT set arithmetic
    a = spark.createDataFrame([(v,) for v in range(20)], "v long")
    b = spark.createDataFrame([(v,) for v in range(10, 40)], "v long")
    r = kmv_set_ops(a, b, "v", k=256).collect()[0]
    assert r.n_union_kept == 40
    assert r.a_est == 20.0 and r.b_est == 30.0 and r.union_est == 40.0
    assert r.inter_est == 10.0
    assert abs(r.jaccard_est - round(10 / 40, 4)) < 5e-5


def test_kmv_set_ops_empty_inputs_return_zeros(spark):
    # ADVICE r4: both-empty inputs must yield ONE deterministic all-zero
    # row (no 0/0 NULLs, no empty frame), and one-empty-side degrades to
    # exact arithmetic on the other side.
    from whoosh_spark.pipeline import kmv_set_ops

    empty = spark.createDataFrame([], "v long")
    a = spark.createDataFrame([(v,) for v in range(5)], "v long")

    r = kmv_set_ops(empty, empty, "v", k=16).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.n_union_kept, r.a_est, r.b_est, r.union_est,
            r.inter_est, r.jaccard_est) == (0, 0.0, 0.0, 0.0, 0.0, 0.0)

    r = kmv_set_ops(a, empty, "v", k=16).collect()[0]
    assert r.a_est == 5.0 and r.b_est == 0.0 and r.union_est == 5.0
    assert r.inter_est == 0.0 and r.jaccard_est == 0.0


def test_kmv_set_ops_estimation_tier_accuracy(spark):
    from whoosh_spark.pipeline import kmv_set_ops

    # |A|=3000, |B|=2000 (evens in [2000,6000)), |A∩B| = evens in
    # [2000,3000) = 500, |A∪B|=4500, J=1/9
    a = spark.createDataFrame([(v,) for v in range(3000)], "v long")
    b = spark.createDataFrame([(v,) for v in range(2000, 6000, 2)], "v long")
    r = kmv_set_ops(a, b, "v", k=256).collect()[0]
    assert r.n_union_kept == 256
    # KMV relative error ~ 1/sqrt(k-1) ~ 6%; allow 4 sigma
    assert abs(r.union_est - 4500) / 4500 < 0.25
    assert abs(r.a_est - 3000) / 3000 < 0.25
    assert abs(r.jaccard_est - 500 / 4500) < 0.08
    assert abs(r.inter_est - 500) / 500 < 0.5


def test_kmv_set_ops_partitioning_invariance_and_symmetry(spark):
    from whoosh_spark.pipeline import kmv_set_ops

    a = spark.createDataFrame([(v,) for v in range(500)], "v long")
    b = spark.createDataFrame([(v,) for v in range(250, 900)], "v long")
    r1 = kmv_set_ops(a, b, "v", k=64).collect()[0]
    r2 = kmv_set_ops(a.repartition(11), b.coalesce(1), "v", k=64).collect()[0]
    assert tuple(r1) == tuple(r2)
    # union/intersection/jaccard are symmetric; a_est/b_est swap
    r3 = kmv_set_ops(b, a, "v", k=64).collect()[0]
    assert (r3.union_est, r3.inter_est, r3.jaccard_est) == \
           (r1.union_est, r1.inter_est, r1.jaccard_est)
    assert (r3.a_est, r3.b_est) == (r1.b_est, r1.a_est)


def test_kmv_set_ops_disjoint_and_identical(spark):
    from whoosh_spark.pipeline import kmv_set_ops

    a = spark.createDataFrame([(v,) for v in range(1000)], "v long")
    b = spark.createDataFrame([(v,) for v in range(5000, 6000)], "v long")
    r = kmv_set_ops(a, b, "v", k=128).collect()[0]
    assert r.inter_est == 0.0 and r.jaccard_est == 0.0
    ri = kmv_set_ops(a, a, "v", k=128).collect()[0]
    assert ri.jaccard_est == 1.0
    assert ri.inter_est == ri.union_est == ri.a_est
