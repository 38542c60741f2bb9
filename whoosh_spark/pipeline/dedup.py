"""Deduplication operators for large-scale training-data pipelines.

Not part of the reference's surface (Whoosh has no dedup), but first-class
for the 100 TB use case this engine targets: exact dedup, MinHash+LSH,
SimHash, and exact n-gram Jaccard verification, all as DataFrame pipelines.

Scale design:
- Exact/normalized dedup: one hash-groupBy — Spark's partial aggregation
  makes the md5 key shuffle the only cost.
- MinHash: ONE string hash per distinct shingle (xxhash64), then 64
  universal-hash permutations ``(a_i * h + b_i) mod p`` derived
  arithmetically — never 64 string hashes. Signatures aggregate with 64
  min() columns (map-side combine), then band-bucket self-join produces
  candidates; candidates are verified with EXACT Jaccard before reporting,
  so LSH recall/precision only affects cost, never output correctness of
  reported pairs (output completeness does depend on recall — bands/rows
  default to b=16, r=4: P(candidate | J=0.8) ≈ 0.9998).
- The exact all-pairs Jaccard here is the VERIFY stage; at corpus scale it
  runs only on LSH candidates (pairs_jaccard). shingle_jaccard_pairs (full
  self-join) exists as the small-corpus oracle path and for tests.
- SimHash: 64 signed-sum aggregations over token hashes; candidate
  blocking by 16-bit chunks (pigeonhole: hamming <= 3 over 64 bits implies
  at least one of 4 chunks equal), verify with bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: products a_i * h stay < 2^62 (no bigint overflow
# since h is reduced to 31 bits first).
_P = (1 << 31) - 1
_N_HASHES = 64


def _perm_coeffs(n: int = _N_HASHES, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for universal hashing — derived from a
    fixed linear-congruential walk, no RNG state."""
    coeffs = []
    x = seed
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (_P - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _P
        coeffs.append((a, b))
    return coeffs


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of a string column (JVM-side)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - k + 1, F.lit(1))),
            lambda i: col.substr(i, F.lit(k)),
        )
    )


# ------------------------------------------------------------- exact dedup


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, group_key, n_copies, is_canonical): canonical = lowest id
    per identical-text group. One md5-key shuffle. NULL texts are never
    grouped (md5(NULL)=NULL would pool them into ONE bogus duplicate
    group); each stays its own singleton."""
    w = Window.partitionBy("group_key")
    out = (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("group_key"))
        .withColumn("n_copies", F.count("*").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.min("doc_id").over(w))
    )
    null_key = F.col("group_key").isNull()
    return out.withColumn(
        "n_copies", F.when(null_key, F.lit(1)).otherwise(F.col("n_copies"))
    ).withColumn(
        "is_canonical", F.when(null_key, F.lit(True)).otherwise(F.col("is_canonical"))
    )


def normalized_duplicates(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Exact dedup after lowercase + whitespace collapse (catches
    formatting-only copies). NULL texts stay singletons (see
    exact_duplicates)."""
    norm = F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")))
    w = Window.partitionBy("group_key")
    out = (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("group_key"))
        .withColumn("n_copies", F.count("*").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.min("doc_id").over(w))
    )
    null_key = F.col("group_key").isNull()
    return out.withColumn(
        "n_copies", F.when(null_key, F.lit(1)).otherwise(F.col("n_copies"))
    ).withColumn(
        "is_canonical", F.when(null_key, F.lit(True)).otherwise(F.col("is_canonical"))
    )


# ------------------------------------------------- exact n-gram Jaccard


def _shingle_rows(docs: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_shingles(F.col(text_col), k)).alias("s"),
    )


def shingle_jaccard_pairs(docs: DataFrame, text_col: str = "text", k: int = 5,
                          threshold: float = 0.5, id_col: str = "doc_id") -> DataFrame:
    """EXACT all-pairs k-shingle Jaccard >= threshold -> (i, j, jaccard).

    Quadratic in co-occurring docs per shingle — the oracle/verify path.
    At corpus scale, generate candidates with minhash_lsh_candidates first
    and verify only those (pairs_jaccard below).
    """
    sh = _shingle_rows(docs, text_col, id_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("n", "na"), inter["i"] == sizes["doc_id"])
        .drop("doc_id")
        .join(sizes.withColumnRenamed("n", "nb"), F.col("j") == sizes["doc_id"])
        .drop("doc_id")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard")
    )
    return out


def pairs_jaccard(docs: DataFrame, pairs: DataFrame, text_col: str = "text",
                  k: int = 5, id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard for a given (i, j) candidate frame — the scale-path
    verify stage (joins shingle SETS only for candidate docs)."""
    sets_df = docs.select(
        F.col(id_col).alias("doc_id"), char_shingles(F.col(text_col), k).alias("sh")
    )
    return (
        pairs.join(sets_df.select(F.col("doc_id").alias("i"), F.col("sh").alias("sa")), "i")
        .join(sets_df.select(F.col("doc_id").alias("j"), F.col("sh").alias("sb")), "j")
        .select(
            "i",
            "j",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------------ MinHash+LSH


def minhash_signatures(docs: DataFrame, text_col: str = "text", k: int = 5,
                       n_hashes: int = _N_HASHES, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sig: array<long>[n_hashes]) MinHash signatures."""
    coeffs = _perm_coeffs(n_hashes)
    sh = _shingle_rows(docs, text_col, id_col, k)
    # one string hash, reduced to 31 bits; permutations are arithmetic
    h = F.pmod(F.xxhash64("s"), F.lit(1 << 31))
    hashed = sh.select("doc_id", h.alias("h"))
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_P))).alias(f"h{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig")
    )


def _banded(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band, bucket) rows: hash each signature band to a bucket."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.hash(F.slice("sig", bnd * rows + 1, rows)).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_lsh_candidates(sigs: DataFrame, bands: int = 16, rows: int = 4,
                           min_bands: int = 2) -> DataFrame:
    """Band the signatures and self-join buckets -> distinct (i, j) pairs
    agreeing on at least ``min_bands`` bands.

    ``min_bands=2`` suppresses the false-candidate flood on corpora with a
    high *baseline* Jaccard (shared small vocabulary => single-band
    collisions everywhere): at J=0.3 it cuts candidates ~100x while recall
    at J>=0.8 stays ~0.999 (P(>=2 of 16 bands) with p=J^rows). The exact
    verify stage downstream makes precision exact either way — this knob
    only buys verify cost.
    """
    banded = _banded(sigs, bands, rows)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
    if min_bands <= 1:
        return pairs.distinct()
    return (
        pairs.groupBy("i", "j")
        .agg(F.count("*").alias("_nb"))
        .where(F.col("_nb") >= min_bands)
        .select("i", "j")
    )


def minhash_dedup_pairs(docs: DataFrame, text_col: str = "text", k: int = 5,
                        threshold: float = 0.8, bands: int = 16, rows: int = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH bucket-join ->
    EXACT Jaccard verify >= threshold -> (i, j, jaccard)."""
    sigs = minhash_signatures(docs, text_col, k, bands * rows, id_col)
    cand = minhash_lsh_candidates(sigs, bands, rows)
    return pairs_jaccard(docs, cand, text_col, k, id_col).where(
        F.col("jaccard") >= threshold
    )


def pairs_jaccard_cross(docs_i: DataFrame, docs_j: DataFrame, pairs: DataFrame,
                        text_col: str = "text", k: int = 5,
                        id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard for (i, j) candidates whose sides come from TWO
    corpora (i from docs_i, j from docs_j)."""
    sa = docs_i.select(F.col(id_col).alias("i"),
                       char_shingles(F.col(text_col), k).alias("sa"))
    sb = docs_j.select(F.col(id_col).alias("j"),
                       char_shingles(F.col(text_col), k).alias("sb"))
    return (
        pairs.join(sa, "i").join(sb, "j")
        .select(
            "i", "j",
            (F.size(F.array_intersect("sa", "sb"))
             / F.size(F.array_union("sa", "sb"))).alias("jaccard"),
        )
    )


def minhash_dedup_against(docs_new: DataFrame, docs_existing: DataFrame,
                          sigs_existing: DataFrame | None = None,
                          text_col: str = "text", k: int = 5,
                          threshold: float = 0.8, bands: int = 16,
                          rows: int = 4, min_bands: int = 2,
                          id_col: str = "doc_id") -> DataFrame:
    """Incremental near-dup: the continuous-ingestion shape — bucket a NEW
    batch's signatures against an EXISTING corpus's (pass
    ``sigs_existing`` = persisted minhash_signatures output to skip
    recomputing the lake side; only the new batch is shingled+hashed).
    Returns (i=new id, j=existing id, jaccard >= threshold), exact-verified.
    At 100 TB the existing side's banded buckets live as a bucketed table,
    so each ingest touches only the new batch's buckets."""
    sigs_new = minhash_signatures(docs_new, text_col, k, bands * rows, id_col)
    if sigs_existing is None:
        sigs_existing = minhash_signatures(docs_existing, text_col,
                                           k, bands * rows, id_col)
    a = _banded(sigs_new, bands, rows).alias("a")
    b = _banded(sigs_existing, bands, rows).alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")),
    ).select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
    if min_bands > 1:
        cand = (
            pairs.groupBy("i", "j").agg(F.count("*").alias("_nb"))
            .where(F.col("_nb") >= min_bands).select("i", "j")
        )
    else:
        cand = pairs.distinct()
    return pairs_jaccard_cross(docs_new, docs_existing, cand, text_col, k,
                               id_col).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------- SimHash


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """(doc_id, simhash: long) over whitespace tokens, tf-weighted.

    bit_i(doc) = 1 iff Σ_tokens tf * (±1 per token-hash bit i) > 0.
    64 conditional sums in one aggregation — map-side combined, one shuffle.

    The 64-bit token hash is md5-derived (two 32-bit halves from the first
    16 hex chars) rather than xxhash64: identical bits are reproducible in
    any engine with md5 — which gives the driver's DuckDB oracle an exact
    target — at the same one-hash-per-distinct-token cost.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"),
        )
        .where(F.col("t") != "")
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
        .withColumn("_md5", F.md5("t"))
        .withColumn("h_hi", F.conv(F.substring("_md5", 1, 8), 16, 10).cast("long"))
        .withColumn("h_lo", F.conv(F.substring("_md5", 9, 8), 16, 10).cast("long"))
    )
    bit_src = lambda i: (  # noqa: E731 — bit i lives in the lo/hi 32-bit half
        F.shiftright("h_lo" if i < 32 else "h_hi", i % 32).bitwiseAND(F.lit(1))
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(bit_src(i) == 1, F.col("tf")).otherwise(-F.col("tf"))
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseXOR(term)  # disjoint bits: xor == or
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_pairs(docs: DataFrame, text_col: str = "text", maxdist: int = 3,
                  id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= maxdist.

    Blocking: split 64 bits into 4 chunks of 16; hamming <= 3 guarantees
    one equal chunk (pigeonhole), so the self-join runs per (chunk_idx,
    chunk_value) bucket, then verifies with bit_count(xor).
    """
    if maxdist > 3:
        raise ValueError(
            "4-chunk pigeonhole blocking only guarantees recall for "
            f"maxdist <= 3, got {maxdist} (pairs differing in one bit per "
            "chunk would be silently missed)"
        )
    sh = simhash(docs, text_col, id_col)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.c", "ch.v")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= maxdist)
        .distinct()
    )


def connected_components(pairs: DataFrame, i: str = "i", j: str = "j",
                         max_iter: int = 32) -> DataFrame:
    """Transitive near-duplicate clusters from a pair list via alternating
    large-star / small-star (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") -> (node, cluster_id = component min node id).

    This is the post-LSH DEDUP SWEEP shape at 100 TB: the pair list itself
    is distributed (far too large for a driver union-find), every round is
    two joins + two aggregations over the edge frame, and the round count
    is O(log n) in the largest component size — independent of component
    DIAMETER, which is what kills naive min-label propagation on chain
    topologies (A~B~C~... pair chains are common under near-dup relations
    because similarity is not transitive).

    Round structure (both operations preserve connectivity and strictly
    shrink large components toward min-rooted stars, per the paper):
    - large-star: for each node u, connect every neighbor v > u to
      m = min(N(u) + {u});
    - small-star: direct edges hi->lo; connect every lo-neighbor and u
      itself to m = min(N_lo(u) + {u}).
    A min-rooted star graph is a fixpoint of both. Each round ends with an
    eager localCheckpoint (iterative self-joins otherwise stack lineage
    into an exponentially deep plan) and a (count, xxhash64-sum) signature;
    on signature match an EXACT set comparison confirms the fixpoint, so a
    hash collision cannot end the loop early.

    Only nodes present in ``pairs`` appear in the output; singletons are
    the caller's coalesce (see :func:`dedup_sweep`).
    """
    e = (pairs.select(F.col(i).cast("long").alias("u"),
                      F.col(j).cast("long").alias("v"))
         .where(F.col("u") != F.col("v")).distinct()
         # materialize the (possibly expensive) pair pipeline ONCE before
         # iterating — round 1 references `e` several times (sym twice,
         # mins once) and would otherwise recompute the upstream
         # LSH/shingle plan per reference
         .localCheckpoint(eager=True))
    prev_sig: tuple | None = None
    prev_e: DataFrame | None = None
    for _ in range(max_iter):
        # large-star
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("u", "mn").alias("m")))
        e = (sym.join(mins, "u").where(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .where(F.col("u") != F.col("v")).distinct())
        # small-star
        d = (e.select(F.greatest("u", "v").alias("u"),
                      F.least("u", "v").alias("v")).distinct())
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        e = (d.join(mins, "u")
             .select(F.col("v").alias("n"), "m")
             .union(mins.select(F.col("u").alias("n"), "m"))
             .where(F.col("n") != F.col("m"))
             .select(F.col("n").alias("u"), F.col("m").alias("v"))
             .distinct()
             .localCheckpoint(eager=True))
        row = e.agg(
            F.count(F.lit(1)).alias("c"),
            # decimal accumulator: int64 hash sums overflow under ANSI
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (row.c, row.h)
        if prev_sig == sig and prev_e is not None:
            if e.exceptAll(prev_e).union(prev_e.exceptAll(e)).isEmpty():
                break
        prev_sig, prev_e = sig, e
    else:
        # never return silently-unconverged labels — wrong cluster ids
        # mean wrong dedup drops. Kiveris 2014 bounds rounds at
        # O(log^2 n); the default max_iter=32 covers any realistic size,
        # so exhaustion means a bug or an absurd max_iter override.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    return e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))


def dedup_sweep(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                i: str = "i", j: str = "j") -> DataFrame:
    """Complete corpus dedup sweep: near-dup ``pairs`` -> transitive
    clusters (:func:`connected_components`) -> one labeled row per doc:
    (doc_id, cluster_id, is_canonical), canonical = the cluster's minimum
    doc_id (singletons are their own cluster). The drop set for training
    is ``is_canonical = false`` — the standard keep-one-per-cluster rule.
    One doc_id-keyed join against the cluster labels (bounded by the
    near-dup NODE count, not the corpus — AQE broadcasts it when small);
    never touches text."""
    cc = connected_components(pairs, i=i, j=j)
    return (docs.select(F.col(id_col).cast("long").alias("doc_id"))
            .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"))
            .withColumn("is_canonical",
                        F.col("doc_id") == F.col("cluster_id")))


def merge_cluster_labels(labels: DataFrame, pairs_new: DataFrame,
                         i: str = "i", j: str = "j") -> DataFrame:
    """Incremental dedup sweep: fold a new batch's near-dup pairs into an
    existing ``(doc_id, cluster_id)`` labeling WITHOUT re-clustering the
    corpus — the ingest-time shape at 100 TB, where a daily batch must not
    pay an O(corpus) connected-components pass.

    Existing labels re-enter the graph as star edges (doc -> cluster root
    carries exactly the old connectivity), but only for clusters TOUCHED
    by a new pair; untouched clusters pass through verbatim via an
    anti-join, so the CC pass is sized by the affected components plus the
    new batch. New nodes absent from ``labels`` label themselves unless a
    pair connects them. Output: (doc_id, cluster_id) for every node in
    ``labels`` plus every node in ``pairs_new`` — equal to re-running
    :func:`connected_components` over old-pairs ∪ new-pairs (old labels
    preserve old components exactly; any pair node is touched, so no
    untouched cluster can gain or lose members). Pinned against the full
    recluster in tests/test_pipeline.py.

    Pair source: :func:`minhash_dedup_against` (new-vs-existing) unioned
    with :func:`minhash_dedup_pairs` over the new batch (new-vs-new).
    """
    lab = labels.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"))
    pn = (pairs_new.select(F.col(i).cast("long").alias("i"),
                           F.col(j).cast("long").alias("j"))
          .where(F.col("i") != F.col("j")).distinct())
    touched_nodes = (pn.select(F.col("i").alias("doc_id"))
                     .union(pn.select(F.col("j").alias("doc_id"))).distinct())
    touched_clusters = (lab.join(touched_nodes, "doc_id", "left_semi")
                        .select("cluster_id").distinct())
    affected = lab.join(touched_clusters, "cluster_id", "left_semi")
    star = (affected.where(F.col("doc_id") != F.col("cluster_id"))
            .select(F.col("doc_id").alias("i"),
                    F.col("cluster_id").alias("j")))
    cc = connected_components(star.unionByName(pn))
    nodes = affected.select("doc_id").union(touched_nodes).distinct()
    relabeled = (nodes.join(cc.withColumnRenamed("node", "doc_id"),
                            "doc_id", "left")
                 .select("doc_id",
                         F.coalesce("cluster_id", F.col("doc_id"))
                         .alias("cluster_id")))
    untouched = lab.join(touched_clusters, "cluster_id", "left_anti")
    return untouched.unionByName(relabeled)


def duplicate_substring_spans(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", minlen: int = 20,
                              min_count: int = 2) -> DataFrame:
    """Exact duplicated-substring spans (the Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" exact-substring tier): every
    maximal character span whose every ``minlen``-gram occurs >= ``min_count``
    times in the corpus (within OR across docs). Output one row per span:
    (doc_id, span_start, span_end, span_len), 1-based inclusive character
    positions — the spans a training pipeline cuts before tokenization.

    Plan shape (all JVM, no Python): explode each doc into its
    ``minlen``-gram start positions (sequence+explode), key each gram by
    md5 of the actual substring, unhex'd to a fixed 16-BYTE binary key so
    the shuffle carries 16B/gram instead of the raw minlen chars; ONE
    count window partitioned by the gram key finds duplicated grams and
    keeps their positions in the same pass (a groupBy + join-back shape
    was A/B-benched 4x slower at sf0.1 — it recomputes the explode+md5
    for the probe side and pays a second exchange or a broadcast build);
    then per-doc gaps-and-islands over a (doc_id, pos) window merges
    overlapping grams (two grams at p < q overlap-or-touch iff
    q - p <= minlen) into maximal spans. Both windows partition by their
    natural key (gram / doc_id), so the whole op is two parallel
    exchanges end to end.

    At 100 TB the gram shuffle is ~(28B x chars) — that is the inherent
    cost of EXACT substring dedup (suffix-array approaches pay the same
    order); :func:`whoosh_spark.pipeline.textstats.winnow_fingerprints`
    is the sampled tier when that is too much. A pathologically
    mega-duplicated gram (one 20-gram occurring 10^9 times) hot-spots its
    window partition — every exact approach must co-locate that gram's
    occurrences; cut such boilerplate with paragraph_dedup first.
    Hash collisions: md5 over >= minlen chars; corpus-scale collision
    probability ~n^2/2^128, negligible, and the DuckDB oracle reproduces
    the same spans from the same md5'd substrings.
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    grams = (
        docs.where(F.length(t) >= minlen)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            t.alias("_t"),
            F.explode(F.sequence(F.lit(1), F.length(t) - minlen + 1)).alias("pos"),
        )
        .select(
            "doc_id", "pos",
            F.unhex(F.md5(F.substring(F.col("_t"), F.col("pos"), minlen))).alias("g"),
        )
    )
    wg = Window.partitionBy("g")
    pos = (
        grams.withColumn("_n", F.count("*").over(wg))
        .where(F.col("_n") >= min_count)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        pos.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            F.when(F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > minlen), 1).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        isl.groupBy("doc_id", "_island")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + minlen - 1).alias("span_end"))
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias("span_len"),
        )
    )


def remove_duplicate_substrings(docs: DataFrame, text_col: str = "text",
                                id_col: str = "doc_id", minlen: int = 20,
                                min_count: int = 2) -> DataFrame:
    """Cut every duplicated span (:func:`duplicate_substring_spans`) out of
    the text: (doc_id, text_clean, n_spans, dup_chars). Docs with no
    duplicated span pass through verbatim (n_spans = 0).

    The cut is one JVM ``aggregate`` over the doc's sorted span array —
    the accumulator walks a cursor through the text concatenating the
    kept gaps — so no Python touches the corpus; the spans frame joins on
    doc_id (plain equi-join, AQE broadcasts it when small).
    """
    spans = duplicate_substring_spans(docs, text_col, id_col, minlen, min_count)
    per_doc = spans.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("span_start", "span_end"))).alias("_spans"),
        F.count("*").alias("n_spans"),
        F.sum("span_len").alias("dup_chars"),
    ).withColumnRenamed("doc_id", "_sid")
    t = F.col(text_col)
    joined = docs.join(
        per_doc, F.col(id_col).cast("long") == F.col("_sid"), "left"
    )
    cut = F.aggregate(
        F.col("_spans"),
        F.struct(F.lit(1).cast("long").alias("cur"), F.lit("").alias("acc")),
        lambda a, s: F.struct(
            (s["span_end"] + 1).cast("long").alias("cur"),
            F.concat(
                a["acc"],
                F.substring(t, a["cur"].cast("int"), (s["span_start"] - a["cur"]).cast("int")),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"], F.substring(t, a["cur"].cast("int"), (F.length(t) - a["cur"] + 1).cast("int"))
        ),
    )
    return joined.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.when(F.col("_spans").isNull(), t).otherwise(cut).alias("text_clean"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
    )


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", delim: str = "\n",
                    min_count: int = 2, keep_first: bool = True) -> DataFrame:
    """Paragraph-granularity exact dedup (the Dolma / CCNet tier between
    whole-doc exact dedup and duplicate_substring_spans): split each doc
    on ``delim``, drop every occurrence of a paragraph that appears
    ``min_count``+ times corpus-wide EXCEPT the corpus-first occurrence
    (``keep_first=True``; order = (doc_id, para_idx) ascending), or drop
    ALL occurrences (``keep_first=False`` — boilerplate removal, where a
    paragraph shared by many docs is noise everywhere). Empty paragraphs
    are never dedup'd (they'd all collapse to one global "first").

    Returns (doc_id, text_clean, n_paras, n_dropped) with text_clean the
    kept paragraphs rejoined by ``delim`` in original order.

    Plan shape: posexplode -> md5 key -> ONE count+min window partitioned
    by the key (the same single-shuffle group-labeler shape as
    exact_duplicates and duplicate_substring_spans — a groupBy +
    join-back recomputes the explode for the probe side) -> groupBy
    (doc_id) reassemble via array_sort(collect_list(struct)) — no
    ordering assumption on collect_list. Paragraph keys shard the
    shuffle; empty paragraphs get a per-occurrence unique key so md5('')
    can never hot-spot one window partition; no driver collect, no
    Python on the corpus.
    """
    paras = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), delim, -1)).alias("para_idx", "para"),
    )
    keyed = paras.withColumn(
        "_h",
        F.when(F.length("para") > 0, F.md5("para")).otherwise(
            F.md5(F.concat_ws("-", F.lit("e"), "doc_id", "para_idx"))
        ),
    )
    wh = Window.partitionBy("_h")
    kept_occurrence = (
        (F.col("_first.doc_id") == F.col("doc_id"))
        & (F.col("_first.para_idx") == F.col("para_idx"))
        if keep_first
        else F.lit(False)
    )
    flagged = (
        keyed.withColumn("_n", F.count("*").over(wh))
        .withColumn("_first", F.min(F.struct("doc_id", "para_idx")).over(wh))
        .withColumn(
            "_keep",
            F.when(F.length("para") == 0, F.lit(True))
            .when(F.col("_n") < min_count, F.lit(True))
            .otherwise(kept_occurrence),
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("_keep"), F.struct("para_idx", "para")))
                ),
                lambda s: s["para"],
            ),
            delim,
        ).alias("text_clean"),
        F.count("*").cast("long").alias("n_paras"),
        F.sum(F.when(F.col("_keep"), 0).otherwise(1)).cast("long").alias("n_dropped"),
    )


def select_canonical(labels: DataFrame, scores: DataFrame,
                     score_col: str = "quality") -> DataFrame:
    """Quality-aware canonical selection: re-pick each cluster's keeper as
    the member with the HIGHEST score (ties -> min doc_id) instead of
    :func:`dedup_sweep`'s min-id rule — what production pipelines do
    (keep the longest / highest-quality copy, drop the rest).

    ``labels``: (doc_id, cluster_id) from dedup_sweep / merge_cluster_labels.
    ``scores``: (doc_id, <score_col>). Returns (doc_id, cluster_id,
    <score_col>, is_canonical) with exactly one canonical per cluster.

    Plan shape: one doc_id equi-join, then the single-shuffle window
    labeler (max score + argmin tie doc_id over the cluster key) — same
    shape as the dedup group labelers, parallel across clusters.
    """
    joined = labels.select(
        F.col("doc_id").cast("long").alias("doc_id"), "cluster_id"
    ).join(
        scores.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col(score_col)),
        "doc_id",
    )
    wc = Window.partitionBy("cluster_id")
    best = F.min(
        F.struct((-F.col(score_col)).alias("_neg"), F.col("doc_id"))
    ).over(wc)
    return joined.withColumn(
        "is_canonical",
        (best["_neg"] == -F.col(score_col)) & (best["doc_id"] == F.col("doc_id")),
    )
