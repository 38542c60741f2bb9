"""Block-max WAND top-k over the physical block store.

Re-expresses the reference's scored-search fast path — TopCollector's
block-quality pruning loop (src/whoosh/collectors.py::TopCollector ~L250,
pruning in ScoredCollector.collect_matches ~L300) driving
W3LeafMatcher.block_quality/skip_to_quality (src/whoosh/codec/whoosh3.py
~L950) with the BM25 bound from scoring.py::WeightLengthScorer
.block_quality — as a **vectorized two-phase algorithm** instead of a
doc-at-a-time iterator, because numpy batch work is the fast path in a
Python-on-Spark executor while per-doc Python iteration is the slow path.

Per segment (one applyInPandas group; segments are doc shards, so
per-segment top-k -> global top-k is exact):

1. Every candidate block carries the codec's block-max metadata:
   ``ub(block) = bm25(idf_t, max_weight, min_dl)`` — the highest score any
   posting in the block can produce (max weight + min length = reference
   block_quality).
2. **Phase 1 (seed θ):** decode the top ``seed`` blocks by ub, score their
   postings (vectorized BM25), aggregate per doc. Partial scores are lower
   bounds of true scores, so the k-th best partial is a valid pruning
   threshold θ.
3. **Prune:** block b of term t is skipped iff
   ``ub(b) + Σ_{t'≠t} term_max(t') < θ`` (term_max = max ub over the
   term's blocks). Safety: any doc appearing ONLY in pruned blocks has
   true score ≤ max over its covering blocks of (ub + Σ other term_max)
   < θ, so no top-k doc is lost.
4. **Refine:** docs seen in decoded blocks may still miss contributions
   from pruned blocks. For each such doc, bound the missing mass by the SUM
   of ub over every pruned block whose [min_doc, max_doc] range covers it
   (interval-stabbing difference array — block ranges of one term may
   overlap after a salted hot-term merge); docs whose
   partial + missing-bound ≥ θ get those blocks decoded and their scores
   completed exactly. Everything reported is therefore an EXACT BM25
   score; pruned ≡ unpruned is asserted in tests/test_segments.py
   (test_wand_pruned_equals_unpruned_equals_executor) and
   tests/test_fixture_queries.py (q22).

The Parquet scan already pruned to the query's (field, term) rows via
row-group min/max on the sorted term column — WAND here saves decode +
score work on long posting lists, exactly the role block skipping plays in
the reference (I/O seek saving), with ~(k / corpus) of the postings decoded
for hot terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_spark.indexing.segments import SegmentedIndex
from whoosh_spark.search.scoring import BM25F, bm25_np, idf as idf_fn
from whoosh_spark.util import segmented_cumsum, varint_decode


def _bm25_np(idf, tf, dl, avgdl, B, K1):
    """Same expression ORDER as scoring.score_expr so Spark-side and
    WAND-side float64 results are bit-identical."""
    return bm25_np(idf, tf, dl, avgdl, B, K1)


def _decode_rows(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode block rows -> (doc_ids, tf, dl, row_term_codes) flat arrays."""
    n_per = rows["n"].to_numpy(dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(n_per)))[:-1]
    doc = segmented_cumsum(varint_decode(b"".join(rows["doc_deltas"])), starts)
    tf = np.frombuffer(b"".join(rows["weights"]), dtype=np.float32).astype(np.float64)
    dl = np.frombuffer(b"".join(rows["dls"]), dtype=np.uint16).astype(np.float64)
    tcodes = np.repeat(rows["_tcode"].to_numpy(dtype=np.int64), n_per)
    return doc, tf, dl, tcodes


def _topk_partial(doc: np.ndarray, contrib: np.ndarray, tc: np.ndarray):
    """Aggregate contributions per doc -> (docs, scores) dense arrays.

    Contributions are summed in (doc, term-code) order, left-associative —
    the same order as the reference's matcher tree (UnionMatcher sums child
    scores in query order) and our executor's ordered fold, so pruned /
    unpruned / DataFrame paths produce bit-identical float64 scores.
    """
    order = np.lexsort((tc, doc))
    doc_s, contrib_s = doc[order], contrib[order]
    uniq, inv = np.unique(doc_s, return_inverse=True)
    sums = np.bincount(inv, weights=contrib_s)
    return uniq, sums


def _topk_partial_max(doc: np.ndarray, contrib: np.ndarray, tc: np.ndarray):
    """Per-doc MAX of contributions (DisjunctionMax semantics,
    matching/wrappers.py::DisMaxMatcher.score = max of children). IEEE max
    is order-insensitive, so no canonical fold is needed for bit-parity
    with the executor's F.max aggregate."""
    del tc
    uniq, inv = np.unique(doc, return_inverse=True)
    maxs = np.full(uniq.size, -np.inf)
    np.maximum.at(maxs, inv, contrib)
    return uniq, maxs


def make_segment_wand(terms: list[str], n_docs: int, avgdl: float, B: float,
                      K1: float, k: int, mode: str, prune: bool, seed_blocks: int,
                      deleted: np.ndarray | None = None,
                      shard_docs: int | None = None,
                      doc_range: tuple | None = None):
    """Build the per-segment applyInPandas function. Each block row arrives
    with its term's exact integer ``df`` attached (broadcast-joined from
    the terms table by wand_topk), and the kernel computes idf with the
    SAME Python ``idf_fn`` the executor/driver path uses — bit-identical
    scores with NO per-query stats round-trip job (searching.py::
    Searcher.idf memoization analogue, pushed into the one kernel action).

    Deleted doc ids arrive as MARKER ROWS (``_del_doc`` non-null) unioned
    into the segment's block rows by wand_topk — the delete set shuffles
    with the data instead of riding a driver-collected closure. They are
    masked right after decode — bounds stay valid (they only overestimate),
    results stay exact. The ``deleted`` array parameter is a test hook with
    the same semantics."""
    n_terms = len(terms)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        nonlocal_deleted = deleted
        if "_del_doc" in pdf.columns:
            dmask = pdf["_del_doc"].notna()
            if dmask.any():
                marked = np.unique(pdf.loc[dmask, "_del_doc"].to_numpy(dtype=np.int64))
                nonlocal_deleted = (
                    marked if deleted is None
                    else np.union1d(marked, deleted)
                )
                pdf = pdf[~dmask]
        if len(pdf) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        # doc-range shard bounds (horizontal WAND): the group owns exactly
        # [shard*C, (shard+1)*C); blocks straddling the boundary arrive
        # replicated and are range-filtered after decode, so every doc's
        # postings for ALL query terms are complete within one group
        shard_lo = shard_hi = None
        if shard_docs and "_shard" in pdf.columns:
            sh = int(pdf["_shard"].iloc[0])
            shard_lo, shard_hi = sh * shard_docs, (sh + 1) * shard_docs
        deleted_np = nonlocal_deleted
        tcode_map = {t: c for c, t in enumerate(terms)}
        pdf = pdf.assign(_tcode=pdf["term"].map(tcode_map))
        # idf per term from the attached exact integer df — same scalar
        # Python function as the driver path, so floats are bit-identical;
        # terms absent from this group keep idf 0 and are never scored
        idfs = np.zeros(n_terms)
        tc_col = pdf["_tcode"].to_numpy(dtype=np.int64)
        df_col = pdf["df"].to_numpy(dtype=np.int64)
        for code in np.unique(tc_col):
            idfs[code] = idf_fn(n_docs, int(df_col[tc_col == code][0]))
        ub = _bm25_np(
            idfs[pdf["_tcode"].to_numpy(dtype=np.int64)],
            pdf["max_weight"].to_numpy(dtype=np.float64),
            pdf["min_dl"].to_numpy(dtype=np.float64),
            avgdl, B, K1,
        )
        pdf = pdf.assign(_ub=ub)

        def score_rows(rows: pd.DataFrame):
            doc, tf, dl, tc = _decode_rows(rows)
            if shard_lo is not None:
                inside = (doc >= shard_lo) & (doc < shard_hi)
                doc, tf, dl, tc = doc[inside], tf[inside], dl[inside], tc[inside]
            if doc_range is not None:
                # doc-subset search ([lo, hi) slice): candidates restricted
                # AFTER decode, stats/idf stay GLOBAL (FilterMatcher
                # semantics); block bounds only overestimate, so the
                # θ-prune stays exact
                inr = (doc >= doc_range[0]) & (doc < doc_range[1])
                doc, tf, dl, tc = doc[inr], tf[inr], dl[inr], tc[inr]
            if deleted_np is not None and deleted_np.size:
                live = ~np.isin(doc, deleted_np)
                doc, tf, dl, tc = doc[live], tf[live], dl[live], tc[live]
            return doc, _bm25_np(idfs[tc], tf, dl, avgdl, B, K1), tc

        agg = _topk_partial_max if mode == "max" else _topk_partial

        if mode == "and" or not prune or len(pdf) <= seed_blocks:
            doc, contrib, tc = score_rows(pdf)
            uniq, sums = agg(doc, contrib, tc)
            if mode == "and":
                nterm = np.bincount(np.searchsorted(uniq, doc))
                keep = nterm == n_terms  # one posting per (doc, term)
                uniq, sums = uniq[keep], sums[keep]
            return _head_k(uniq, sums, k)

        # ---- phase 1: seed θ from the highest-bound blocks ----
        order = np.argsort(-pdf["_ub"].to_numpy())
        seed_idx = order[:seed_blocks]
        seed_rows = pdf.iloc[seed_idx]
        doc_s, contrib_s, tc_s = score_rows(seed_rows)
        uniq_s, sums_s = agg(doc_s, contrib_s, tc_s)
        if uniq_s.size >= k:
            theta = np.partition(sums_s, uniq_s.size - k)[uniq_s.size - k]
        else:
            theta = -np.inf

        rest_idx = order[seed_blocks:]
        rest = pdf.iloc[rest_idx]
        if mode == "max":
            # ---- max-mode prune: a block whose own bound is < θ cannot
            # raise ANY doc's max to >= θ (every contribution <= block ub),
            # so the survive test is the block bound alone and NO refine
            # pass is needed: any doc whose true max >= θ has that max in a
            # surviving block; docs whose every block was pruned are < θ
            # and θ is a lower bound on the final k-th score (>= k seed
            # docs already scored >= θ whenever pruning is armed) ----
            survive = rest["_ub"].to_numpy() >= theta
            doc_r, contrib_r, tc_r = score_rows(rest[survive])
            uniq, sums = agg(
                np.concatenate([doc_s, doc_r]),
                np.concatenate([contrib_s, contrib_r]),
                np.concatenate([tc_s, tc_r]),
            )
            return _head_k(uniq, sums, k)

        # ---- prune: term-max WAND test on the remaining blocks ----
        term_max = np.full(n_terms, 0.0)
        tc_all = pdf["_tcode"].to_numpy(dtype=np.int64)
        np.maximum.at(term_max, tc_all, pdf["_ub"].to_numpy())
        others = term_max.sum() - term_max  # Σ_{t'≠t} term_max(t')
        lhs = rest["_ub"].to_numpy() + others[rest["_tcode"].to_numpy(dtype=np.int64)]
        survive = lhs >= theta
        pruned = rest[~survive]

        # reuse the phase-1 seed decode/scores — _topk_partial lexsorts by
        # (doc, term-code) internally, so concatenation order cannot change
        # the canonical fold (bit-exact vs re-decoding the seed blocks)
        doc_r, contrib_r, tc_r = score_rows(rest[survive])
        doc_d = np.concatenate([doc_s, doc_r])
        contrib_d = np.concatenate([contrib_s, contrib_r])
        tc_d = np.concatenate([tc_s, tc_r])
        uniq, sums = _topk_partial(doc_d, contrib_d, tc_d)

        if len(pruned) and uniq.size:
            # ---- refine: complete scores that pruned blocks could raise ----
            # A term's blocks may carry OVERLAPPING [min_doc, max_doc]
            # ranges after a salted hot-term merge (salt groups repack
            # independently, segments.py::merge_segments), so a doc can fall
            # inside SEVERAL pruned blocks of one term. The missing-mass
            # bound therefore sums ub over EVERY covering block — an
            # interval-stabbing sum via a difference array over the sorted
            # doc array — never a single searchsorted hit, which would
            # under-estimate the bound and return under-scored top-k.
            # (Summing over all covering blocks only overestimates: the
            # doc's actual posting lives in exactly one of them.)
            pr = pruned.reset_index(drop=True)
            lo_all = pr["min_doc"].to_numpy(dtype=np.int64)
            hi_all = pr["max_doc"].to_numpy(dtype=np.int64)
            ub_all = pr["_ub"].to_numpy()
            start_idx = np.searchsorted(uniq, lo_all, side="left")
            end_idx = np.searchsorted(uniq, hi_all, side="right")
            diff = np.zeros(uniq.size + 1)
            np.add.at(diff, start_idx, ub_all)
            np.add.at(diff, end_idx, -ub_all)
            miss = np.cumsum(diff)[:-1]
            refine = (sums + miss >= theta) & (miss > 0)
            if refine.any():
                # decode every pruned block covering a refinable doc
                ref_docs = uniq[refine]
                s2 = np.searchsorted(ref_docs, lo_all, side="left")
                e2 = np.searchsorted(ref_docs, hi_all, side="right")
                need_blocks_mask = e2 > s2
                doc_r, contrib_r, tc_r = score_rows(pr[need_blocks_mask])
                # keep only contributions of docs already tracked (any doc
                # living solely in pruned blocks was proven < θ) and
                # RE-AGGREGATE from scratch so the (doc, term) canonical sum
                # order is preserved — incremental += would change float
                # association and break pruned ≡ unpruned bit-equality
                sel = np.isin(doc_r, uniq[refine])
                if sel.any():
                    doc_all = np.concatenate((doc_d, doc_r[sel]))
                    contrib_all = np.concatenate((contrib_d, contrib_r[sel]))
                    tc_all2 = np.concatenate((tc_d, tc_r[sel]))
                    uniq, sums = _topk_partial(doc_all, contrib_all, tc_all2)
        return _head_k(uniq, sums, k)

    return run


def _head_k(docs: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    order = np.lexsort((docs, -scores))[:k]  # (score desc, doc_id asc) — A.7
    return pd.DataFrame({"doc_id": docs[order].astype(np.int64),
                         "score": scores[order]})


def wand_topk(
    ix: SegmentedIndex,
    fieldname: str,
    terms: list[str],
    k: int = 10,
    mode: str = "or",
    prune: bool = True,
    seed_blocks: int = 16,
    weighting: BM25F | None = None,
    shard_docs: int | str | None = "auto",
    doc_range: tuple | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) for an Or/And/DisMax of terms via per-segment
    WAND. ``mode``: "or" sums matching-term scores (UnionMatcher), "and"
    keeps docs matching every term (IntersectionMatcher), "max" takes the
    per-doc maximum (wrappers.py::DisMaxMatcher, tiebreak=0) with the
    tighter single-block prune bound.

    Plan shape: blocks parquet scan pruned to the query terms (row-group
    min/max) -> shuffle by segment_id (tiny: only the query's block rows
    move) -> per-segment vectorized WAND -> global
    orderBy(score desc, doc_id asc).limit(k) over ≤ k rows per segment.

    ``shard_docs`` is the horizontal-scale knob: with it set, the group key
    becomes (segment_id, doc-range shard) so one zipfian query term can no
    longer concentrate a whole segment's blocks on one task. Shards are
    doc-DISJOINT ranges (blocks straddling a boundary replicate to both
    shards and range-filter after decode), so per-shard top-k -> global
    merge stays exact — the same argument that makes per-segment WAND
    exact, applied one level down (pinned ≡ unsharded in
    tests/test_segments.py).

    The default ``"auto"`` sizes shards to ~4 kernel groups per core with
    a 65536-doc floor: small/test corpora keep one shard per segment
    (identical plan to the unsharded path), while a big index stays
    parallel even when segment count < cores — measured at the 20M-turn
    sf1 rehearsal, a fully-merged (1-segment) index served the same WAND
    query 23.9 s -> at multi-segment speed once sharded, because per-
    segment grouping alone had collapsed the kernel onto one task
    (BENCH.md round-3 addendum). ``None`` = exactly one group per
    segment; an int pins the shard size (set ~10^7 at 10^9-doc segments).

    ``doc_range=(lo, hi)`` restricts candidates to a docnum slice (time
    window / conversation range via ``SegmentedIndex.doc_range_for``):
    whole blocks outside the slice prune on min/max metadata before the
    scan, straddling blocks filter after decode; df/idf/avgdl stay
    corpus-global (FilterMatcher semantics) and block bounds only
    overestimate, so θ-pruning stays exact (pinned vs the unpruned slice
    in tests/test_segments.py).
    """
    w = weighting or BM25F()
    if getattr(w, "use_final", False):
        raise ValueError(
            "final()-hook models are excluded from block-max pruning "
            "(non-monotone transforms invalidate block bounds, same as the "
            "reference disabling block quality under use_final) — use "
            "Searcher.search instead"
        )
    fs = ix.schema[fieldname]
    if not fs.scorable:
        raise ValueError(
            f"block-max WAND needs a scorable field; {fieldname!r} is not — "
            "use Searcher.search"
        )
    # the ONE B-resolution order (weighting.field_B > fs.B > weighting.B),
    # shared with score_expr/score_np so WAND == executor for every config
    B = w._b_for(fs)
    K1 = w.K1
    avgdl = ix.avg_field_length(fieldname)
    n = ix.doc_count
    terms = list(dict.fromkeys(terms))  # dedupe, keep order (tcode identity)
    # Per-term df rides ON the block rows via a broadcast join against the
    # terms table — the same pushed-down, row-group-pruned point read the
    # old prefetch job did, but folded into the ONE kernel action instead
    # of a separate driver round-trip job per query (the ~0.3-0.5 s/query
    # orchestration floor measured in BENCH.md "Query-side scaling").
    # Globally-missing terms simply contribute no rows: OR scores the rest,
    # AND's per-doc count == len(terms) test goes empty — same semantics
    # as the old driver-side early returns, now decided inside the plan.
    stats = ix.terms.where(
        (F.col("field") == fieldname) & F.col("term").isin(terms)
    ).select("term", "df")
    blocks = (
        ix.blocks.drop("pos_counts", "pos_vals")
        .where((F.col("field") == fieldname) & F.col("term").isin(terms))
        .join(F.broadcast(stats), "term")
    )  # WAND never reads positions; dropping pre-scan prunes the columns
    if doc_range is not None:
        # doc-subset search (time-slice / conversation-range over the
        # docnum order): whole blocks outside [lo, hi) prune on their
        # min/max metadata BEFORE the scan (row-group min/max seek), the
        # kernel range-filters straddling blocks after decode; df/idf/
        # avgdl stay corpus-global (Whoosh FilterMatcher semantics — a
        # filter restricts candidates, never re-weights)
        lo, hi = doc_range
        if lo >= hi:
            raise ValueError(f"empty doc_range {doc_range}")
        blocks = blocks.where((F.col("max_doc") >= lo) & (F.col("min_doc") < hi))
    if shard_docs == "auto":
        par = max(ix.spark.sparkContext.defaultParallelism, 1)
        # below the floor every doc lands in shard 0 anyway — skip the
        # explode/filter entirely and keep the plain per-segment plan
        shard_docs = max(-(-n // (4 * par)), 65536) if n > 65536 else None
    group_cols = ["segment_id"]
    if shard_docs:
        blocks = blocks.withColumn(
            "_shard",
            F.explode(
                F.sequence(
                    F.floor(F.col("min_doc") / shard_docs),
                    F.floor(F.col("max_doc") / shard_docs),
                )
            ),
        )
        group_cols.append("_shard")
    deleted = getattr(ix, "deleted", None)
    if deleted is not None:
        # delete ids join the per-segment shuffle as marker rows (routed by
        # the manifest doc ranges) — the set never touches the driver
        rng = ix.seg_ranges()
        marks = deleted.join(
            F.broadcast(rng),
            (F.col("doc_id") >= F.col("doc_lo")) & (F.col("doc_id") < F.col("doc_hi")),
        ).select("segment_id", F.col("doc_id").alias("_del_doc"))
        if shard_docs:
            marks = marks.withColumn(
                "_shard", F.floor(F.col("_del_doc") / shard_docs).cast("long")
            )
        data = blocks.withColumn("_del_doc", F.lit(None).cast("long")).unionByName(
            marks, allowMissingColumns=True
        )
    else:
        data = blocks
    fn = make_segment_wand(terms, n, avgdl, B, K1, k, mode, prune, seed_blocks,
                           shard_docs=shard_docs, doc_range=doc_range)
    local = data.groupBy(*group_cols).applyInPandas(fn, "doc_id long, score double")
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _decode_block_positions(pc, pv, n: int) -> tuple[np.ndarray, np.ndarray]:
    """One block's position payload -> (offsets[n+1], values) arrays.
    ``pc`` (uint16 per-posting counts) may be None for non-positional
    blocks (ID/KEYWORD fields) — those yield zero positions per posting,
    which makes every phrase chain over them empty, matching the executor's
    null-positions no-match semantics."""
    if pc is None:
        return np.zeros(int(n) + 1, dtype=np.int64), np.empty(0, dtype=np.int64)
    counts = np.frombuffer(pc, dtype=np.uint16).astype(np.int64)
    vals = varint_decode(pv) if pv else np.empty(0, dtype=np.int64)
    return np.concatenate(([0], np.cumsum(counts))), vals


def make_segment_phrase_wand(words: list[str], n_docs: int, avgdl: float,
                             B: float, K1: float, k: int, slop: int,
                             prune: bool = True,
                             shard_docs: int | None = None,
                             deleted: np.ndarray | None = None,
                             verify_chunk: int | None = None):
    """Per-segment phrase top-k kernel (see wand_phrase_topk for the plan).

    Three vectorized stages, each skipping work the reference's
    doc-at-a-time intersection+positions matcher (positional.py::Phrase ->
    SpanNear2 over W3LeafMatcher.skip_to) saves with seeks:

    1. **Candidate intersection with block-range skipping**: decode the
       RAREST word's postings first (fewest blocks); every other word's
       blocks are decoded only if their [min_doc, max_doc] range stabs a
       surviving candidate (vectorized searchsorted interval test — the
       batch form of skip_to). Candidates shrink monotonically, cheapest
       word first.
    2. **Conjunction scores**: the phrase score IS the And score (the span
       chain filters, it does not rescore — executor._c_phrase), so scores
       for all candidates come from the already-decoded tf/dl arrays,
       summed in WORD order (duplicate words contribute once per slot) with
       the same left-associative float64 fold as the executor's reduce —
       bit-identical scores.
    3. **Score-ordered positional verification with early exit**: position
       payloads are varint-decoded lazily PER BLOCK, only for blocks
       holding docs reached by the verify frontier. Candidates are checked
       in (score desc, doc asc) order in chunks; once k phrase matches
       exist and the next candidate's conjunction score cannot outrank the
       k-th match (ties resolve doc-asc, and the verify order already IS
       the final order), the remaining candidates' positions are never
       decoded. The chain test per chunk is one sorted searchsorted pass
       per word over composite (doc, position) int64 keys — the
       SpanNear2 window (prev < x <= prev + slop) with no per-doc Python
       loop in the match test.
    """
    n_slots = len(words)
    uniq_terms = list(dict.fromkeys(words))
    idf_slot_of = [uniq_terms.index(w) for w in words]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "score": pd.Series([], dtype=np.float64)})
        dele = deleted
        if "_del_doc" in pdf.columns:
            dmask = pdf["_del_doc"].notna()
            if dmask.any():
                marked = np.unique(pdf.loc[dmask, "_del_doc"].to_numpy(dtype=np.int64))
                dele = marked if dele is None else np.union1d(marked, dele)
                pdf = pdf[~dmask]
        if len(pdf) == 0:
            return empty
        shard_lo = shard_hi = None
        if shard_docs and "_shard" in pdf.columns:
            sh = int(pdf["_shard"].iloc[0])
            shard_lo, shard_hi = sh * shard_docs, (sh + 1) * shard_docs
        pdf = pdf.reset_index(drop=True)
        present = set(pdf["term"])
        if any(t not in present for t in uniq_terms):
            return empty  # AND semantics: a word absent here matches nothing
        term_rows = {t: pdf[pdf["term"] == t] for t in uniq_terms}
        idfs_u = np.array([
            idf_fn(n_docs, int(term_rows[t]["df"].iloc[0])) for t in uniq_terms
        ])

        def decode_term(rows: pd.DataFrame):
            n_per = rows["n"].to_numpy(dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(n_per)))[:-1]
            doc = segmented_cumsum(varint_decode(b"".join(rows["doc_deltas"])), starts)
            tf = np.frombuffer(b"".join(rows["weights"]), dtype=np.float32).astype(np.float64)
            dl = np.frombuffer(b"".join(rows["dls"]), dtype=np.uint16).astype(np.float64)
            rowrep = np.repeat(rows.index.to_numpy(), n_per)
            inblk = np.arange(doc.size, dtype=np.int64) - np.repeat(starts, n_per)
            return doc, tf, dl, rowrep, inblk

        # ---- stage 1: candidate intersection, cheapest word first ----
        order_terms = sorted(uniq_terms,
                             key=lambda t: int(term_rows[t]["n"].sum()))
        data: dict[str, tuple] = {}
        C = None  # sorted candidate doc ids (unique: one posting per doc/term)
        for ti, t in enumerate(order_terms):
            rows = term_rows[t]
            if C is not None:
                # block-range skipping: decode only blocks stabbing a candidate
                lo = np.searchsorted(C, rows["min_doc"].to_numpy(dtype=np.int64), side="left")
                hi = np.searchsorted(C, rows["max_doc"].to_numpy(dtype=np.int64), side="right")
                rows = rows[hi > lo]
                if len(rows) == 0:
                    return empty
            arrs = decode_term(rows)
            doc = arrs[0]
            if ti == 0:
                m = np.ones(doc.size, dtype=bool)
                if shard_lo is not None:
                    m &= (doc >= shard_lo) & (doc < shard_hi)
                if dele is not None and dele.size:
                    m &= ~np.isin(doc, dele)
            else:
                # candidate membership implies shard + delete filtering
                m = np.isin(doc, C, assume_unique=False)
            if not m.all():
                arrs = tuple(a[m] for a in arrs)
                doc = arrs[0]
            if doc.size == 0:
                return empty
            srt = np.argsort(doc)
            arrs = tuple(a[srt] for a in arrs)
            data[t] = arrs
            C = arrs[0]
        # earlier-decoded terms may still hold docs dropped by later words
        for t in uniq_terms:
            arrs = data[t]
            if arrs[0].size != C.size:
                sel = np.isin(arrs[0], C, assume_unique=True)
                data[t] = tuple(a[sel] for a in arrs)
        # every data[t][0] now equals C exactly (sorted, aligned)

        # ---- stage 2: conjunction scores, word-order left-assoc fold ----
        score = None
        for s, wd in enumerate(words):
            _, tf_t, dl_t, _, _ = data[wd]
            contrib = _bm25_np(idfs_u[idf_slot_of[s]], tf_t, dl_t, avgdl, B, K1)
            score = contrib if score is None else score + contrib

        # ---- stage 3: score-ordered positional verify, early exit ----
        vorder = np.lexsort((C, -score))
        pos_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        pc_col = pdf["pos_counts"].to_numpy()
        pv_col = pdf["pos_vals"].to_numpy()
        n_col = pdf["n"].to_numpy(dtype=np.int64)

        def keys_for(word: str, cand_idx: np.ndarray) -> np.ndarray:
            """(chunk-local doc index << 32 | position) keys, sorted."""
            _, _, _, rowrep, inblk = data[word]
            rws, ibs = rowrep[cand_idx], inblk[cand_idx]
            parts = []
            for li in range(cand_idx.size):
                r = int(rws[li])
                ent = pos_cache.get(r)
                if ent is None:
                    ent = pos_cache[r] = _decode_block_positions(
                        pc_col[r], pv_col[r], n_col[r])
                offs, vals = ent
                b = int(ibs[li])
                p = vals[offs[b]:offs[b + 1]]
                if p.size:
                    parts.append((np.int64(li) << np.int64(32)) + p)
            if not parts:
                return np.empty(0, dtype=np.int64)
            return np.sort(np.concatenate(parts))

        chunk = (C.size if not prune
                 else (verify_chunk or max(4 * k, 64)))
        matched_docs: list[np.ndarray] = []
        matched_scores: list[np.ndarray] = []
        n_matched = 0
        pos0 = 0
        base_mask = np.int64(-1) << np.int64(32)
        while pos0 < vorder.size:
            ci = vorder[pos0:pos0 + chunk]
            cur = keys_for(words[0], ci)
            for wd in words[1:]:
                if cur.size == 0:
                    break
                x = keys_for(wd, ci)
                if x.size == 0:
                    cur = x
                    break
                lo_val = np.maximum(x - slop, x & base_mask)
                lo = np.searchsorted(cur, lo_val, side="left")
                hi = np.searchsorted(cur, x - 1, side="right")
                cur = x[hi > lo]
            if cur.size:
                loc = np.unique(cur >> np.int64(32))
                hit = ci[loc]
                matched_docs.append(C[hit])
                matched_scores.append(score[hit])
                n_matched += loc.size
            pos0 += chunk
            if prune and n_matched >= k and pos0 < vorder.size:
                kth = np.concatenate(matched_scores)[k - 1]
                # verify order == final (score desc, doc asc) order: an
                # unverified candidate with score == kth has a LARGER
                # doc_id than the k-th match, so it cannot enter the top-k
                if score[vorder[pos0]] <= kth:
                    break
        if not matched_docs:
            return empty
        return _head_k(np.concatenate(matched_docs),
                       np.concatenate(matched_scores), k)

    return run


def wand_phrase_topk(
    ix: SegmentedIndex,
    fieldname: str,
    words: list[str],
    k: int = 10,
    slop: int = 1,
    prune: bool = True,
    weighting: BM25F | None = None,
    shard_docs: int | str | None = "auto",
    verify_chunk: int | None = None,
) -> DataFrame:
    """Pruned phrase top-k (doc_id, score) over the physical block store —
    the scale path for positional queries.

    The executor's phrase plan (executor._c_phrase, mirroring the
    reference's positional.py::Phrase -> SpanNear2 chain) inner-joins the
    FULL posting lists of every word and runs the position chain on every
    co-occurring doc; for a phrase of common words at corpus scale that
    decodes positions for millions of docs that can never reach the top-k.
    This kernel keeps the exact same semantics (results are bit-identical,
    pinned in tests/test_phrase_wand.py) but bounds the work three ways:
    block-range candidate skipping (only blocks of the non-rarest words
    that can contain a surviving candidate are decoded — the vectorized
    form of the reference matcher's skip_to), conjunction-score bounds
    (the phrase score is exactly the And score, so candidates are
    position-verified in score order and verification STOPS once the k-th
    best verified match dominates every remaining candidate), and lazy
    per-block position decode (position payloads — the bulk of a
    positional index — are only varint-decoded for blocks the verify
    frontier actually touches).

    Plan shape: blocks scan pruned to the phrase's terms (row-group
    min/max on the sorted term column, positions KEPT) -> broadcast-join
    per-term df -> groupBy (segment_id[, doc-range shard]) -> per-group
    kernel -> global orderBy(score desc, doc_id asc).limit(k). Shard and
    delete handling are identical to wand_topk (doc-disjoint shards with
    straddling-block replication; deletes as marker rows). Fields indexed
    without positions (phrase=False) return no matches, same as the
    executor's null-positions semantics.
    """
    w = weighting or BM25F()
    if getattr(w, "use_final", False):
        raise ValueError(
            "final()-hook models are excluded from block-max pruning — "
            "use Searcher.search instead")
    fs = ix.schema[fieldname]
    if not fs.scorable:
        raise ValueError(
            f"block-max phrase WAND needs a scorable field; {fieldname!r} "
            "is not — use Searcher.search")
    if not words:
        return ix.spark.createDataFrame([], "doc_id long, score double")
    B, K1 = w._b_for(fs), w.K1
    avgdl = ix.avg_field_length(fieldname)
    n = ix.doc_count
    uniq_terms = list(dict.fromkeys(words))
    stats = ix.terms.where(
        (F.col("field") == fieldname) & F.col("term").isin(uniq_terms)
    ).select("term", "df")
    blocks = (
        ix.blocks  # positions kept: the kernel decodes them lazily per block
        .where((F.col("field") == fieldname) & F.col("term").isin(uniq_terms))
        .join(F.broadcast(stats), "term")
    )
    if shard_docs == "auto":
        par = max(ix.spark.sparkContext.defaultParallelism, 1)
        shard_docs = max(-(-n // (4 * par)), 65536) if n > 65536 else None
    group_cols = ["segment_id"]
    if shard_docs:
        blocks = blocks.withColumn(
            "_shard",
            F.explode(F.sequence(F.floor(F.col("min_doc") / shard_docs),
                                 F.floor(F.col("max_doc") / shard_docs))),
        )
        group_cols.append("_shard")
    deleted = getattr(ix, "deleted", None)
    if deleted is not None:
        rng = ix.seg_ranges()
        marks = deleted.join(
            F.broadcast(rng),
            (F.col("doc_id") >= F.col("doc_lo")) & (F.col("doc_id") < F.col("doc_hi")),
        ).select("segment_id", F.col("doc_id").alias("_del_doc"))
        if shard_docs:
            marks = marks.withColumn(
                "_shard", F.floor(F.col("_del_doc") / shard_docs).cast("long"))
        data = blocks.withColumn("_del_doc", F.lit(None).cast("long")).unionByName(
            marks, allowMissingColumns=True)
    else:
        data = blocks
    fn = make_segment_phrase_wand(words, n, avgdl, B, K1, k, int(slop), prune,
                                  shard_docs=shard_docs,
                                  verify_chunk=verify_chunk)
    local = data.groupBy(*group_cols).applyInPandas(fn, "doc_id long, score double")
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def wand_topk_many(
    ix: SegmentedIndex,
    fieldname: str,
    queries: "dict[int, list[str]]",
    k: int = 10,
    mode: "str | dict[int, str]" = "or",
    prune: bool = True,
    seed_blocks: int = 16,
    weighting: BM25F | None = None,
    shard_docs: int | str | None = "auto",
    doc_range: tuple | None = None,
) -> DataFrame:
    """Batched WAND: an entire query SET as ONE Spark action, returning
    (query_id, doc_id, score) with per-query top-k.

    This is the reference-query-set evaluation pattern (the north rule
    grades rank-identity over a query set, and offline eval / relevance
    sweeps at 100 TB run thousands of queries against one index): serial
    per-query execution pays a ~0.8 s/query driver-orchestration floor
    that neither grows with data nor shrinks with cores (BENCH.md
    "Query-side scaling"); batching amortizes it across the whole set —
    one scan pruned to the UNION of all query terms, one shuffle, one
    kernel wave, one collect.

    Plan shape: blocks scan pruned to all queries' terms -> broadcast-join
    per-term df (stats) and the (term -> query_id) map, which REPLICATES a
    shared term's block rows per query (queries are independent top-k
    problems; sharing the scan, not the kernel) -> groupBy (query_id,
    segment_id[, doc-range shard]) -> the SAME single-query kernel per
    group (make_segment_wand, bit-identical scores by construction) ->
    per-query window top-k. Delete markers replicate per query so every
    group masks the same delete set. Per-query results are EXACTLY
    wand_topk's (pinned in tests/test_segments.py)."""
    if not queries:
        return ix.spark.createDataFrame(
            [], "query_id long, doc_id long, score double")
    w = weighting or BM25F()
    if getattr(w, "use_final", False):
        raise ValueError(
            "final()-hook models are excluded from block-max pruning — "
            "use Searcher.search instead")
    fs = ix.schema[fieldname]
    if not fs.scorable:
        raise ValueError(
            f"block-max WAND needs a scorable field; {fieldname!r} is not")
    B, K1 = w._b_for(fs), w.K1
    avgdl = ix.avg_field_length(fieldname)
    n = ix.doc_count
    queries = {int(q): list(dict.fromkeys(ts)) for q, ts in queries.items()}
    # ``mode`` may be per-query (dict) — Searcher.search_many batches a
    # heterogeneous set (Or/And/DisMax) through one call
    modes = (
        {int(q): mode.get(int(q), "or") for q in queries}
        if isinstance(mode, dict)
        else {q: mode for q in queries}
    )
    all_terms = sorted({t for ts in queries.values() for t in ts})
    stats = ix.terms.where(
        (F.col("field") == fieldname) & F.col("term").isin(all_terms)
    ).select("term", "df")
    from whoosh_spark.util import inline_rows

    qmap = inline_rows(
        ix.spark,
        [(t, q) for q, ts in queries.items() for t in ts],
        "term string, _qid long",
    )
    blocks = (
        ix.blocks.drop("pos_counts", "pos_vals")
        .where((F.col("field") == fieldname) & F.col("term").isin(all_terms))
        .join(F.broadcast(stats), "term")
        .join(F.broadcast(qmap), "term")
    )
    if doc_range is not None:
        # whole-set doc-subset evaluation (same semantics as wand_topk's
        # doc_range: pre-scan block prune + in-kernel filter, global stats)
        lo, hi = doc_range
        if lo >= hi:
            raise ValueError(f"empty doc_range {doc_range}")
        blocks = blocks.where((F.col("max_doc") >= lo) & (F.col("min_doc") < hi))
    if shard_docs == "auto":
        par = max(ix.spark.sparkContext.defaultParallelism, 1)
        shard_docs = max(-(-n // (4 * par)), 65536) if n > 65536 else None
    group_cols = ["_qid", "segment_id"]
    if shard_docs:
        blocks = blocks.withColumn(
            "_shard",
            F.explode(F.sequence(F.floor(F.col("min_doc") / shard_docs),
                                 F.floor(F.col("max_doc") / shard_docs))),
        )
        group_cols.append("_shard")
    deleted = getattr(ix, "deleted", None)
    if deleted is not None:
        rng = ix.seg_ranges()
        marks = (
            deleted.join(
                F.broadcast(rng),
                (F.col("doc_id") >= F.col("doc_lo"))
                & (F.col("doc_id") < F.col("doc_hi")),
            )
            .select("segment_id", F.col("doc_id").alias("_del_doc"))
            # every query's groups mask the same delete set
            .withColumn("_qid", F.explode(F.array(
                *[F.lit(q).cast("long") for q in queries])))
        )
        if shard_docs:
            marks = marks.withColumn(
                "_shard", F.floor(F.col("_del_doc") / shard_docs).cast("long"))
        data = blocks.withColumn(
            "_del_doc", F.lit(None).cast("long")
        ).unionByName(marks, allowMissingColumns=True)
    else:
        data = blocks

    kernels = {
        q: make_segment_wand(ts, n, avgdl, B, K1, k, modes[q], prune,
                             seed_blocks, shard_docs=shard_docs,
                             doc_range=doc_range)
        for q, ts in queries.items()
    }

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["_qid"].iloc[0])
        out = kernels[qid](pdf)
        out.insert(0, "query_id", np.int64(qid))
        return out

    local = data.groupBy(*group_cols).applyInPandas(
        run, "query_id long, doc_id long, score double")
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("doc_id")))
    return (local.withColumn("_rn", rn).where(F.col("_rn") <= k)
            .drop("_rn").orderBy("query_id", F.desc("score"), F.asc("doc_id")))
