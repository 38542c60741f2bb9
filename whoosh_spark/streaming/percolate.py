"""Query percolation: match incoming documents against a registered set
of standing queries — the INVERSE of search (alerting / routing: "which
of my saved searches does this new document satisfy?"). Whoosh has no
percolator; this is part of the streaming extension over the same engine
(the shape popularized by Elasticsearch's percolate API).

Batch kernel: analyze + index the incoming batch ONCE through the same
verified build path as the main engine (``build_index`` — mapInArrow
analyzer, postings + stats frames), then compile every standing query
against that per-batch index and union the tagged match sets into ONE
Spark action. Each compiled query is a column-expression plan over the
SHARED postings frame, so the scan is multiplexed across queries by
Catalyst instead of re-run per query. Per-micro-batch cost scales with
batch size; the rule set is the bounded side (tens to thousands of
standing queries — broadcast-sized by nature). For LARGE rule sets
(thousands+), ``percolate_indexed`` is the classical term->query
inverted index over the RULES: the rule set becomes broadcast DATA
joined onto one scored postings scan, so plan size is O(1) in the rule
count — bit-identical to ``percolate`` for flat Term/And/Or rules.

Streaming twin: ``percolate_stream`` runs the identical batch kernel
per micro-batch via ``foreachBatch`` and appends matches to a parquet
sink; streaming == batch is pinned in tests/test_percolate.py via an
availableNow run over the same rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_spark import query as Q
from whoosh_spark.fields import Schema, documents_schema
from whoosh_spark.indexing import build_index
from whoosh_spark.search import Searcher

__all__ = ["percolate", "percolate_indexed", "percolate_stream"]


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: dict[str, Q.Query],
    schema: Schema | None = None,
    with_scores: bool = True,
) -> DataFrame:
    """Match every standing query against ``docs`` ->
    (query_name, doc_id[, score]): one row per (query, matching doc).

    ``queries`` may be arbitrary compiled trees (boolean, phrase, range,
    fuzzy, ...) — the full query surface of the engine applies. Scores
    are the per-batch BM25 scores (stats are batch-local: a percolation
    batch IS the corpus for alerting purposes); pass
    ``with_scores=False`` for pure membership.
    """
    df, _ix = _percolate_with_ix(spark, docs, queries, schema, with_scores)
    return df


def _percolate_with_ix(spark, docs, queries, schema, with_scores):
    if not queries:
        return (
            spark.createDataFrame([], "query_name string, doc_id long, score double"),
            None,
        )
    # persist the analyzed frames for the duration of the multi-query
    # union — every branch shares the same postings scan
    ix = build_index(spark, docs, schema or documents_schema()).persist()
    s = Searcher(ix)
    branches = []
    for name, q in queries.items():
        scored = s.compile(q)
        cols = [F.lit(name).alias("query_name"), "doc_id"]
        if with_scores:
            cols.append(F.col("score"))
        branches.append(scored.select(*cols))
    return reduce(DataFrame.unionByName, branches), ix


def percolate_stream(
    stream_docs: DataFrame,
    queries: dict[str, Q.Query],
    out_path: str,
    checkpoint: str,
    schema: Schema | None = None,
    with_scores: bool = True,
    available_now: bool = True,
    indexed: bool = False,
    fieldname: str = "text",
    weighting=None,
):
    """Percolate a document STREAM: each micro-batch runs the same batch
    kernel and appends (query_name, doc_id[, score], _batch_id) parquet
    rows to ``out_path``. Returns the started StreamingQuery (caller
    awaits / stops). State is per-batch only — percolation is stateless
    across batches by definition, so no watermark is needed and a
    restart resumes cleanly from the checkpoint's source offsets.

    ``indexed=True`` routes each micro-batch through
    :func:`percolate_indexed` instead — the large-rule-set tier (rules
    as broadcast data, O(1) plan size): the right choice when thousands
    of standing queries watch the stream. Rule-shape limits of that tier
    apply (flat Term/And/Or/Phrase, AndNot/Require with flat b);
    ``with_scores=False`` is plan-branch-only (the indexed tier always
    scores; callers can drop the column downstream).
    """
    if indexed and not with_scores:
        raise ValueError("indexed=True always scores; drop the column "
                         "downstream or use the plan-branch tier")
    if indexed:
        # validate rule SHAPES eagerly, at start() time — the full rule
        # dict is known now, so an unsupported tree must not surface
        # later as a mid-run StreamingQueryException from the first
        # micro-batch
        for name, q in queries.items():
            _flat_rule_full(name, q.normalize(), fieldname)

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        if indexed:
            out, ix = _percolate_indexed_with_ix(
                bdf.sparkSession, bdf, queries, schema,
                fieldname=fieldname, weighting=weighting,
            )
        else:
            out, ix = _percolate_with_ix(
                bdf.sparkSession, bdf, queries, schema, with_scores
            )
        try:
            (out.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("append").parquet(out_path))
        finally:
            if ix is not None:
                ix.unpersist()  # per-batch cache; percolation is stateless

    writer = (
        stream_docs.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _flat_rule(name: str, q: Q.Query, fieldname: str):
    """Flatten one standing rule into (rows, n_required, rule_boost,
    slop) where rows = [(term, pos_in_query, leaf_boost)] and ``slop``
    is None for boolean rules or the phrase slop for Phrase rules.
    Raises ValueError for anything beyond flat Term / And-of-Terms /
    Or-of-Terms / Phrase on ``fieldname`` — complex trees belong on the
    plan-branch tier (``percolate``)."""
    def leaf(t: Q.Term, pos: int):
        if t.fieldname != fieldname:
            raise ValueError(
                f"rule {name!r}: field {t.fieldname!r} != {fieldname!r}")
        return (t.text, pos, float(t.boost))

    if isinstance(q, Q.Term):
        return [leaf(q, 0)], 1, 1.0, None
    if isinstance(q, Q.Phrase):
        if q.fieldname != fieldname:
            raise ValueError(
                f"rule {name!r}: field {q.fieldname!r} != {fieldname!r}")
        if len(set(q.words)) != len(q.words):
            # duplicate words are legal in a phrase but the term-join
            # would conflate their word slots; route through percolate()
            raise ValueError(
                f"rule {name!r}: duplicate words in a phrase rule are "
                "plan-branch-tier only; use percolate()")
        rows = [(w, i, 1.0) for i, w in enumerate(q.words)]
        return rows, len(q.words), float(q.boost), int(q.slop)
    if isinstance(q, (Q.And, Q.Or)):
        kids = q.subqueries
        if not kids or not all(isinstance(k, Q.Term) for k in kids):
            raise ValueError(
                f"rule {name!r}: percolate_indexed supports flat "
                "Term/And/Or-of-Terms rules; use percolate() for this tree")
        texts = [k.text for k in kids]
        if len(set(texts)) != len(texts):
            raise ValueError(f"rule {name!r}: duplicate terms in one rule")
        if isinstance(q, Q.Or):
            if getattr(q, "scale", None):
                raise ValueError(f"rule {name!r}: Or(scale=) unsupported here")
            n_req = max(int(getattr(q, "minmatch", 1) or 1), 1)
        else:
            n_req = len(kids)
        return [leaf(k, i) for i, k in enumerate(kids)], n_req, float(q.boost), None
    raise ValueError(
        f"rule {name!r}: {type(q).__name__} not supported by "
        "percolate_indexed; use percolate()")


def _flat_rule_full(name: str, q: Q.Query, fieldname: str):
    """Full per-rule flattening -> (pos_rows, n_required, rule_boost,
    slop, neg_terms, neg_required, req_terms, req_required). AndNot(a,
    b): a scored, doc excluded when it matches b (executor's left_anti);
    Require(a, b): doc kept only when it matches b (left_semi). b must
    itself be flat Term/And/Or (NOT a phrase — a positional b-side needs
    the plan-branch tier); AND-shaped b excludes/requires only when ALL
    its terms hit, OR-shaped when minmatch of them hit — exactly the
    compiled semantics of b as a match set. The a side may be a Phrase
    (slop carried through)."""
    if isinstance(q, (Q.AndNot, Q.Require)):
        pos_rows, n_req, a_boost, slop = _flat_rule(name, q.a.normalize(), fieldname)
        b_rows, b_req, b_boost, b_slop = _flat_rule(name, q.b.normalize(), fieldname)
        del b_boost  # b is a pure match set; its scores/boosts are unused
        if b_slop is not None:
            raise ValueError(
                f"rule {name!r}: a Phrase on the excluded/required side "
                "needs positional evaluation; use percolate()")
        b_terms = [t for t, _pos, _lb in b_rows]
        rboost = a_boost * float(q.boost)
        if isinstance(q, Q.AndNot):
            return pos_rows, n_req, rboost, slop, b_terms, b_req, [], None
        return pos_rows, n_req, rboost, slop, [], None, b_terms, b_req
    pos_rows, n_req, rboost, slop = _flat_rule(name, q, fieldname)
    return pos_rows, n_req, rboost, slop, [], None, [], None


def percolate_indexed(
    spark: SparkSession,
    docs: DataFrame,
    queries: dict[str, Q.Query],
    schema: Schema | None = None,
    fieldname: str = "text",
    weighting=None,
) -> DataFrame:
    """See :func:`_percolate_indexed_with_ix` (kernel + full doc) — this
    wrapper is the public batch surface; the per-batch index handle stays
    internal (the stream tier unpersists it after each micro-batch)."""
    df, _ix = _percolate_indexed_with_ix(
        spark, docs, queries, schema, fieldname, weighting)
    return df


def _percolate_indexed_with_ix(
    spark: SparkSession,
    docs: DataFrame,
    queries: dict[str, Q.Query],
    schema: Schema | None = None,
    fieldname: str = "text",
    weighting=None,
):
    """Large-rule-set percolation: the rule set as DATA, not plan branches.

    ``percolate`` compiles one plan branch per rule — right for tens of
    rules, but a 10,000-rule monitoring set would build a 10,000-branch
    union and choke the optimizer. This tier is the classic term->query
    inverted index over the RULES: flatten every (flat Term / And / Or)
    rule into (query_name, term, pos, leaf_boost, n_required) rows, score
    every distinct rule term over the batch postings in ONE scan (the
    executor's expanded-Or shape: literal term->idf map, per-posting
    score expression), broadcast-join the rule-term rows onto the scored
    postings, and close each (rule, doc) group with the SAME
    query-ordered left-associative score fold the executor uses — so the
    output is BIT-IDENTICAL to percolate()/Searcher.compile for these
    rule shapes (pinned in tests/test_percolate.py). Plan size is O(1)
    in the rule count; rule rows ride a broadcast.

    AND rules require all terms (a zero-df term correctly makes the rule
    unmatchable); OR rules honor ``minmatch``. ``Phrase`` rules (any
    slop/boost) ride the same broadcast with word-indexed rows: their
    positions decode only when a phrase rule exists and only ON the
    phrase rows, and the positional chain closes inside the same
    (rule, doc) group with the executor's exact ``_phrase_step`` fold —
    still O(1) plan size. ``AndNot(a, b)`` and ``Require(a, b)`` work
    when b is flat (a may be a phrase): b's terms ride the same
    broadcast as non-scoring NEGATIVE / REQUIRE rows, and the group
    filter excludes docs with >= b_required negative hits (the left_anti
    semantics) or demands >= b_required require hits (left_semi). Rules
    beyond these shapes (a phrase b-side, duplicate-word phrases,
    Or(scale=), non-flat trees) raise — route those through
    ``percolate``.
    """
    from whoosh_spark.search.scoring import BM25F

    w = weighting or BM25F()
    if getattr(w, "use_final", False):
        raise ValueError("final()-hook weightings are per-result-set; "
                         "use percolate()")
    # roles: 0 = scoring positive row, 1 = negative (AndNot.b),
    # 2 = require (Require.b); neg/req rows never contribute score.
    # Phrase rules ride the same rows with ``_slop`` set — their
    # positional chain closes inside the same (rule, doc) group.
    rows = []
    any_phrase = False
    for name, q in queries.items():
        (pos, n_req, rboost, slop, neg_terms, neg_req,
         req_terms, req_req) = _flat_rule_full(name, q.normalize(), fieldname)
        any_phrase = any_phrase or slop is not None
        for t, pos_i, lboost in pos:
            rows.append((name, t, pos_i, lboost, 0, n_req, neg_req, req_req, rboost, slop))
        for t in neg_terms:
            rows.append((name, t, -1, 0.0, 1, n_req, neg_req, req_req, rboost, slop))
        for t in req_terms:
            rows.append((name, t, -1, 0.0, 2, n_req, neg_req, req_req, rboost, slop))
    if not rows:
        return (spark.createDataFrame(
            [], "query_name string, doc_id long, score double"), None)

    ix = build_index(spark, docs, schema or documents_schema()).persist()
    fs = ix.schema[fieldname]
    avgdl = ix.avg_field_length(fieldname)
    all_terms = sorted({r[1] for r in rows})
    ix.prefetch_stats([(fieldname, t) for t in all_terms])
    idf = {}
    for t in all_terms:
        dfreq = ix.doc_frequency(fieldname, t)
        if dfreq:
            idf[t] = float(w.term_scalar(
                fs, ix.doc_count, dfreq, ix.frequency(fieldname, t)))
    if not idf:
        return (spark.createDataFrame(
            [], "query_name string, doc_id long, score double"), ix)

    # per-term idf rides INSIDE the broadcast rule rows (no literal-map
    # size ceiling: a 100k-rule set is still one small broadcast).
    # Positions decode only when some rule is a phrase.
    pcols = ["doc_id", "term", "weight", "dl"] + (
        ["positions"] if any_phrase else []
    )
    p = ix.terms_postings(fieldname, sorted(idf),
                          positions=any_phrase).select(*pcols)
    rules_df = spark.createDataFrame(
        [(n, t, q_, lb, role, nr, ngr, rqr, rb, sl, idf[t])
         for (n, t, q_, lb, role, nr, ngr, rqr, rb, sl) in rows if t in idf],
        "query_name string, term string, _q int, _lboost double, _role int, "
        "_n_required int, _neg_required int, _req_required int, "
        "_rboost double, _slop int, _idf double",
    )
    base = w.score_expr(fs, F.col("_idf"), avgdl, F.col("weight"), F.col("dl"))
    jcols = [
        "query_name", "doc_id", F.col("_q"), F.col("_role"),
        F.col("_n_required"), F.col("_neg_required"), F.col("_req_required"),
        F.col("_rboost"), F.col("_slop"),
        (base * F.col("_lboost")).alias("score"),
        # only PHRASE-rule rows carry positions into the group exchange —
        # with one phrase rule among 100k boolean rules, the boolean
        # rows' payload must not multiply by the positions size
        (F.when(F.col("_slop").isNotNull(), F.col("positions"))
         if any_phrase else F.lit(None).cast("array<int>")).alias("_pos"),
    ]
    j = p.join(F.broadcast(rules_df), "term").select(*jcols)
    # the executor's _ordered_sum: left-assoc fold in query order, so a
    # 2-term AND scores bit-identically to Searcher.compile(And([...]));
    # neg/req rows are nulled out of the fold (collect_list skips nulls)
    items = F.array_sort(
        F.collect_list(
            F.when(
                F.col("_role") == 0,
                F.struct(F.col("_q").alias("q"), F.col("score").alias("s"),
                         F.col("_pos").alias("p")),
            )
        )
    )
    n_role = lambda r: F.sum(F.when(F.col("_role") == r, 1).otherwise(0))  # noqa: E731
    grouped = (
        j.groupBy("query_name", "doc_id")
        .agg(items.alias("_items"),
             n_role(0).alias("_n"), n_role(1).alias("_neg"), n_role(2).alias("_hasreq"),
             F.first("_n_required").alias("_req"),
             F.first("_neg_required").alias("_negr"),
             F.first("_req_required").alias("_reqr"),
             F.first("_rboost").alias("_rb"),
             F.first("_slop").alias("_sl"))
    )
    fold = F.aggregate(F.col("_items"), F.lit(0.0), lambda acc, x: acc + x["s"])
    # phrase rules: close the positional chain over the word-ordered
    # items — EXACTLY the executor's _phrase_step fold (keep x in next
    # where some c in current has c < x <= c + slop), then demand a
    # surviving chain. Only evaluated when _sl is set AND all words are
    # present (the _n >= _req leg), so element_at(1) is safe.
    slop_c = F.col("_sl")
    # guarded: only computed for phrase groups with >= 1 positive item
    # (element_at(…, 1) would raise under ANSI on an empty array — a
    # neg-rows-only group of a phrase composite hits that)
    chain = F.when(
        slop_c.isNotNull() & (F.size("_items") >= 1),
        F.aggregate(
            F.slice(F.col("_items"), 2,
                    F.greatest(F.size("_items") - 1, F.lit(0))),
            F.element_at(F.col("_items"), 1)["p"],
            lambda acc, x: F.filter(
                x["p"],
                lambda v: F.exists(acc, lambda c: (v > c) & (v <= c + slop_c)),
            ),
        ),
    ).otherwise(F.lit(None).cast("array<int>"))
    phrase_ok = slop_c.isNull() | (F.size(chain) > 0)
    out = (
        grouped.where(
            (F.col("_n") >= F.col("_req"))
            & (F.col("_negr").isNull() | (F.col("_neg") < F.col("_negr")))
            & (F.col("_reqr").isNull() | (F.col("_hasreq") >= F.col("_reqr")))
        )
        .where(phrase_ok)
        .select("query_name", "doc_id",
                (fold * F.col("_rb")).alias("score"))
    )
    return out, ix
