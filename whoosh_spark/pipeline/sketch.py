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


# --------------------------------------------------------------------- HLL
# HyperLogLog (Flajolet et al. 2007) with the same determinism discipline
# as KMV: the register layout is md5-derived and the harmonic denominator
# is computed in EXACT integer arithmetic (sum of dyadic terms as a
# BIGINT), so the estimate is order-independent, partitioning-invariant,
# and bit-reproducible in DuckDB — the driver can oracle-check the
# ESTIMATE itself. Where KMV ships k longs per group, HLL ships <= 2^b
# (bucket, rho) rows whose merge is a plain register-wise MAX — the
# cheapest possible cross-shard / cross-day / cross-segment algebra, and
# the whole build is ONE map-side-combined groupBy (no windows, no
# distinct shuffle: duplicate values land in the same register with the
# same rho, so max() absorbs them).


def _hll_alpha(m: int) -> float:
    # Flajolet's bias-correction constants
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, b: int = 10,
                  by: str | None = None) -> DataFrame:
    """The raw mergeable sketch: (<by>, bucket, rho) for OBSERVED buckets
    (unobserved registers are implicitly 0). bucket = top ``b`` hash bits;
    rho = 1 + leading zeros of the remaining ``60-b`` bits (computed via
    the exact integer identity rho = wbits - bit_length(w) + 1 — no
    floating log2, so no cross-engine rounding edge)."""
    if not 4 <= b <= 16:
        # no published bias constant below m=16 (Flajolet 2007 tables
        # start there); estimates at m=4/8 would be uncontrolled
        raise ValueError(f"b must be in [4, 16], got {b}")
    if by in ("bucket", "rho"):
        raise ValueError(
            f"by={by!r} collides with the sketch's own output columns — "
            "rename the group column first")
    wbits = _HASH_BITS - b
    dims = [by] if by else []
    # NULLs hash to NULL and would corrupt the register frame (a
    # NULL-bucket row inflates n_buckets while contributing nothing to
    # the denominator); countDistinct ignores NULLs, so does the sketch.
    # Consequence in grouped mode: a group whose column is ENTIRELY null
    # emits NO row (groupBy().agg(countDistinct) would emit 0) — join
    # the estimate frame back against your group universe if zero rows
    # matter.
    df = df.where(F.col(col).isNotNull())
    h = kmv_hash(col)
    bucket = F.shiftrightunsigned(h, wbits).cast("int")
    w = F.pmod(h, F.lit(1 << wbits))
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*dims, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*dims, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b_df: DataFrame) -> DataFrame:
    """Register-wise max over the union — the HLL sketch algebra.
    Frames must share the same (dims..., bucket, rho) shape."""
    dims = [c for c in a.columns if c not in ("bucket", "rho")]
    return (
        a.unionByName(b_df)
        .groupBy(*dims, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_from(reg_df: DataFrame, b: int,
                      by: str | None = None) -> DataFrame:
    """(<by>, n_buckets, hll_estimate) from a register frame.

    The harmonic mean runs in exact integers: with K = wbits+1 the
    per-register term 2^(-rho) scales to the BIGINT 2^(K-rho), empty
    registers contribute 2^K each, and the total stays < 2^61 for every
    legal ``b`` — so the denominator is identical under ANY summation
    order or engine. Small-range (linear counting) correction applies
    when E <= 2.5m and empty registers exist, as published."""
    m = 1 << b
    wbits = _HASH_BITS - b
    kk = wbits + 1
    dims = [by] if by else []
    alpha = _hll_alpha(m)
    agg = reg_df.groupBy(*dims).agg(
        F.count("*").alias("n_buckets"),
        # shiftleft with a COLUMN bit count needs the SQL form (the
        # python wrapper only takes an int literal)
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {kk} - rho)"))
        .alias("_s_obs"),
    )
    s_int = F.col("_s_obs") + (F.lit(m) - F.col("n_buckets")) * F.lit(1 << kk)
    e_raw = F.lit(alpha * m * m * float(1 << kk)) / s_int.cast("double")
    zeros = (F.lit(m) - F.col("n_buckets")).cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return agg.select(
        *dims,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_distinct(df: DataFrame, col: str, b: int = 10,
                 by: str | None = None) -> DataFrame:
    """HLL distinct-count per ``by`` group (or globally): (<by>,
    n_buckets, hll_estimate). One groupBy end-to-end; ~1.04/sqrt(2^b)
    relative error on the raw path."""
    return hll_estimate_from(hll_registers(df, col, b=b, by=by), b=b, by=by)


# ---------------------------------------------------------------- Count-Min
# Count-min sketch (Cormode & Muthukrishnan 2005): fixed depth x width
# cell grid of summed weights; point estimate = min over depth rows.
# One-sided error (never under-counts), cell-wise ADDITIVE merge algebra
# (combine shards/days by summing cells), and — with md5-derived row
# hashes and integer weights — bit-exact reproducibility, so the driver
# oracle recomputes cells AND estimates identically in DuckDB. The build
# is one explode(x depth) + one map-side-combined groupBy; the sketch is
# <= depth*width rows no matter the corpus size.


def cm_hash(col, row_i: int, width: int) -> "F.Column":
    """Row ``row_i``'s column index for a value: md5-derived 60-bit hash
    of 'cm<i>:<value>' mod width."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"cm{row_i}:"), F.col(col).cast("string")
                           if isinstance(col, str) else col.cast("string"))),
            1, 15),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def cm_sketch(df: DataFrame, col: str, depth: int = 3, width: int = 1024,
              weight: str | None = None) -> DataFrame:
    """Build the sparse cell frame (row, col_idx, cell) — absent cells are
    zero. ``weight`` sums a column instead of counting occurrences."""
    if depth < 1 or width < 2:
        raise ValueError(f"bad sketch shape depth={depth} width={width}")
    wexpr = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    coords = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("row"),
                     cm_hash(col, i, width).alias("col_idx"))
            for i in range(depth)
        ])
    ).alias("_c")
    return (
        df.select(coords, wexpr.alias("_w"))
        .select("_c.row", "_c.col_idx", "_w")
        .groupBy("row", "col_idx")
        .agg(F.sum("_w").alias("cell"))
    )


def cm_merge(a: DataFrame, b_df: DataFrame) -> DataFrame:
    """Cell-wise sum over the union — the CM sketch algebra (both frames
    must share depth/width)."""
    return (
        a.unionByName(b_df)
        .groupBy("row", "col_idx")
        .agg(F.sum("cell").alias("cell"))
    )


def cm_estimate_from(cells: DataFrame, keys: list, depth: int, width: int) -> DataFrame:
    """(key, cm_estimate) for a bounded probe list: min over the depth
    rows of each key's cells (missing cell = 0). The probe frame is a
    literal explode — no driver round-trip, and the cells side stays a
    broadcastable <= depth*width rows."""
    spark = cells.sparkSession
    probes = (
        spark.range(1)
        .select(F.explode(F.array(*[F.lit(str(k)) for k in keys])).alias("key"))
        .select(
            "key",
            F.explode(F.array(*[
                F.struct(F.lit(i).alias("row"),
                         cm_hash(F.col("key"), i, width).alias("col_idx"))
                for i in range(depth)
            ])).alias("_c"),
        )
        .select("key", "_c.row", "_c.col_idx")
    )
    joined = probes.join(F.broadcast(cells), ["row", "col_idx"], "left")
    return (
        joined.groupBy("key")
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).alias("cm_estimate"))
    )


# ------------------------------------------------------- quantile histogram
# HdrHistogram-style log-bucketed quantile sketch: scale the value to an
# integer, bucket by (exponent, top ``subbits`` mantissa bits). Bucket
# assignment is PURE INTEGER arithmetic (float multiply + floor are
# IEEE-exact and identical across engines; the exponent comes from
# bit_length via bin(), not log()), so the sketch — unlike t-digest/GK,
# whose state depends on arrival order — is deterministic,
# partitioning-invariant, and exactly reproducible in DuckDB. Merge is
# bucket-wise ADD; quantile lookup walks the cumulative counts and
# reports the bucket's LOWER edge, which under-estimates by at most
# 2^-subbits relative (12.5% at subbits=3, ~3% at subbits=5). Values are
# clamped at 0 (bucket 0 holds everything <= 0).


def hist_sketch(df: DataFrame, col: str, by: str | None = None,
                scale: float = 1000.0, subbits: int = 3) -> DataFrame:
    """The raw mergeable sketch: (<by>, bucket, cnt)."""
    if not 1 <= subbits <= 8:
        raise ValueError(f"subbits must be in [1, 8], got {subbits}")
    if by in ("bucket", "cnt"):
        raise ValueError(
            f"by={by!r} collides with the sketch's own output columns — "
            "rename the group column first")
    sb = subbits
    dims = [by] if by else []
    m = F.greatest(F.floor(F.col(col).cast("double") * F.lit(float(scale)))
                   .cast("long"), F.lit(0).cast("long"))
    # NULL values must be IGNORED like every quantile aggregate does —
    # without the filter, greatest(NULL, 0) = 0 would silently pile
    # NULLs into bucket 0 and drag the quantiles down. Grouped-mode
    # consequence: an all-NULL group emits no sketch rows and hence no
    # quantile rows (percentile_approx would emit a NULL estimate) —
    # join back against your group universe if those rows matter.
    base = df.where(F.col(col).isNotNull()).select(*dims, m.alias("_m"))
    blen = F.length(F.bin(F.col("_m"))).cast("int")
    e = blen - F.lit(sb + 1)
    bucket = (
        F.when(F.col("_m") < F.lit(1 << (sb + 1)), F.col("_m"))
        .otherwise(
            F.lit(1 << (sb + 1))
            + e.cast("long") * F.lit(1 << sb)
            + F.expr(f"shiftright(_m, length(bin(_m)) - {sb + 1})")
            - F.lit(1 << sb)
        )
        .cast("long")
    )
    return (
        base.select(*dims, bucket.alias("bucket"))
        .groupBy(*dims, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def hist_merge(a: DataFrame, b_df: DataFrame) -> DataFrame:
    """Bucket-wise sum over the union — the histogram sketch algebra."""
    dims = [c for c in a.columns if c not in ("bucket", "cnt")]
    return (
        a.unionByName(b_df)
        .groupBy(*dims, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hist_quantiles_from(sketch: DataFrame, qs: list[float],
                        by: str | None = None, scale: float = 1000.0,
                        subbits: int = 3) -> DataFrame:
    """(<by>, q, est) — for each q the LOWER edge of the first bucket
    whose cumulative count reaches ceil(q * n) (the lower-quantile
    definition), scaled back to value units."""
    sb = subbits
    dims = [by] if by else []
    w_cum = (
        Window.partitionBy(*dims).orderBy("bucket")
        if by else Window.partitionBy(F.lit(0)).orderBy("bucket")
    )
    w_all = Window.partitionBy(*dims) if by else Window.partitionBy(F.lit(0))
    cum = sketch.withColumn("_cum", F.sum("cnt").over(w_cum)) \
                .withColumn("_n", F.sum("cnt").over(w_all))
    probes = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    crossed = cum.select(*dims, "bucket", "_cum", "_n", probes)
    hit = crossed.where(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
    w_first = Window.partitionBy(*dims, "q").orderBy("bucket")
    first = (
        hit.withColumn("_rn", F.row_number().over(w_first))
        .where(F.col("_rn") == 1)
    )
    b = F.col("bucket")
    e = F.floor((b - F.lit(1 << (sb + 1))) / F.lit(1 << sb)).cast("int")
    top = (b - F.lit(1 << (sb + 1)) - e.cast("long") * F.lit(1 << sb)
           + F.lit(1 << sb))
    m_lo = F.when(b < F.lit(1 << (sb + 1)), b).otherwise(
        top * F.pow(F.lit(2.0), e.cast("double")).cast("long")
    )
    return first.select(
        *dims, "q",
        (m_lo.cast("double") / F.lit(float(scale))).alias("est"),
    )


def hist_quantiles(df: DataFrame, col: str, qs: list[float],
                   by: str | None = None, scale: float = 1000.0,
                   subbits: int = 3) -> DataFrame:
    """One-shot grouped quantile estimates: (<by>, q, est)."""
    return hist_quantiles_from(
        hist_sketch(df, col, by=by, scale=scale, subbits=subbits),
        qs, by=by, scale=scale, subbits=subbits,
    )


# ------------------------------------------------------------ Bloom filter
# Classic Bloom membership filter as a SPARSE bit-position table:
# md5-derived k hashes per key, build = explode + distinct (one
# map-side-combined shuffle, <= m_bits rows no matter the corpus), merge
# = union-distinct (bitwise OR), probe = "all k positions present". No
# false negatives ever (pinned in tests); false-positive rate is the
# standard (1 - e^{-kn/m})^k. The 100 TB use: build the filter over the
# SMALL side (benchmark keys, yesterday's doc hashes), broadcast the
# <= m_bits rows, and pre-filter the huge side before an exact join —
# the decontamination / incremental-dedup pre-pass.


def bloom_hash(col, i: int, m_bits: int) -> "F.Column":
    """Hash row ``i``'s bit position for a value — ONE definition shared
    by build and probe (a lone edit to either side would silently break
    the no-false-negatives guarantee)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(f"bf{i}:"),
                                          c.cast("string"))),
                           1, 15), 16, 10).cast("long"),
        F.lit(m_bits),
    ).cast("long")


def bloom_bits(df: DataFrame, col: str, m_bits: int = 1 << 20,
               k: int = 5) -> DataFrame:
    """Build the sparse bit table: (bit,) distinct positions set."""
    if k < 1 or m_bits < 2:
        raise ValueError(f"bad filter shape m_bits={m_bits} k={k}")
    coords = F.explode(F.array(*[
        bloom_hash(col, i, m_bits) for i in range(k)
    ])).alias("bit")
    return df.select(coords).distinct()


def bloom_merge(a: DataFrame, b_df: DataFrame) -> DataFrame:
    """Bitwise OR == union-distinct of the sparse bit tables."""
    return a.unionByName(b_df).distinct()


def bloom_contains(bits: DataFrame, df: DataFrame, col: str,
                   m_bits: int = 1 << 20, k: int = 5,
                   eager: bool = True) -> DataFrame:
    """Probe a frame: adds ``maybe_present`` (true iff ALL k bit
    positions are set). The bits side broadcasts — this is the pre-join
    filter: ``df.where(...)`` on the result prunes the huge side before
    an exact verification join.

    Shape notes for scale: the k broadcast joins keep the PROBE side
    shuffle-free (the explode-then-groupBy alternative moves k x probe
    rows through an exchange — wrong side to multiply at 100 TB), and
    the bit table is pinned via ``localCheckpoint`` first so the k
    broadcasts serialize one materialized <= m_bits-row table instead of
    re-running the build lineage k times (A/B in BENCH.md; 4x on the
    bench config). ``eager=False`` skips the pin when the caller already
    persisted/checkpointed ``bits``."""
    marked = bits.withColumn("_set", F.lit(1))
    if eager:
        marked = marked.localCheckpoint(eager=True)
    out = df
    for i in range(k):
        out = (
            out.withColumn("_bit", bloom_hash(col, i, m_bits))
            .join(F.broadcast(marked).withColumnRenamed("bit", "_bit")
                  .withColumnRenamed("_set", f"_s{i}"),
                  "_bit", "left")
            .drop("_bit")
        )
    cond = None
    for i in range(k):
        c = F.col(f"_s{i}").isNotNull()
        cond = c if cond is None else (cond & c)
    return out.withColumn("maybe_present", cond).drop(
        *[f"_s{i}" for i in range(k)])


# ----------------------------------------------------- KMV set operations


def kmv_set_ops(a: DataFrame, b: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV set-operation estimates between two frames' distinct-value
    sets (Beyer et al. 2007, SIGMOD "On synopses for distinct value
    estimation" — the theta-sketch algebra Apache DataSketches
    popularized): ONE row

        (n_union_kept, a_est, b_est, union_est, inter_est, jaccard_est)

    Discipline identical to the rest of the family: the hash is
    md5-derived (:func:`kmv_hash`), so every ESTIMATE is deterministic,
    partitioning-invariant, and bit-reproducible in SQL. Semantics:

    - per-slice and union estimates: the standard KMV (k-1)*S/h_(k),
      degenerating to the EXACT count while a sketch holds < k hashes;
    - intersection: with L = the merged sketch's largest kept hash, the
      hashes <= L form a uniform sample of the union, so
      rho = |{h in BOTH kept sets, h <= L}| / n_union_kept estimates the
      Jaccard similarity and  inter_est = rho * union_est  the overlap
      cardinality — written as (c / n) * union_est in this exact order
      so the oracle mirrors it bit-for-bit. In the exact tier
      (n_union_kept < k) rho and inter_est are exact by construction.

    Scale shape: two bounded sketch builds (each ONE distinct +
    windowed bottom-k over <= k rows per bucket), then pure array ops
    over three single-row frames — the cross joins combine one row with
    one row. The sketches themselves are the mergeable artifact: ship
    per-shard/day sketches, kmv_merge them, and compare corpora without
    ever co-shuffling raw values.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    sa = kmv_sketch(a, col, k=k)
    sb = kmv_sketch(b, col, k=k)
    m = kmv_merge(sa, sb, k)
    j = (
        m.select(F.col("sketch").alias("_m"))
        .crossJoin(sa.select(F.col("sketch").alias("_sa")))
        .crossJoin(sb.select(F.col("sketch").alias("_sb")))
    )

    def est(arr: "F.Column", n: "F.Column") -> "F.Column":
        hk = F.element_at(arr, n.cast("int"))
        return (
            F.when(n < k, n.cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / hk)
        )

    n_m = F.size("_m")
    L = F.element_at("_m", n_m.cast("int"))
    c = F.size(F.filter(F.array_intersect("_sa", "_sb"),
                        lambda h: h <= L))
    union_est = est(F.col("_m"), n_m)
    # guard the 0/0 on two EMPTY inputs (n_union_kept = 0): rho and
    # inter_est are deterministically 0.0, not NULL (and not an error
    # under spark.sql.ansi.enabled).
    rho = F.when(
        n_m > 0, c.cast("double") / n_m.cast("double")
    ).otherwise(F.lit(0.0))
    return j.select(
        n_m.cast("long").alias("n_union_kept"),
        F.round(est(F.col("_sa"), F.size("_sa")), 4).alias("a_est"),
        F.round(est(F.col("_sb"), F.size("_sb")), 4).alias("b_est"),
        F.round(union_est, 4).alias("union_est"),
        F.round(rho * union_est, 4).alias("inter_est"),
        F.round(rho, 4).alias("jaccard_est"),
    )
