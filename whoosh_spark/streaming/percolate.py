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
    apply (boolean trees of any depth incl. inner boost/minmatch/scale,
    Phrase, AndNot/Require with flat, Phrase, or two-level b; phrase
    sides cannot mix with deep boolean sides);
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
    slop, scale_pair) where rows = [(term, pos_in_query, leaf_boost,
    group, group_req)], ``slop`` is None for boolean rules or the phrase
    slop for Phrase rules, and ``scale_pair`` is (scale, n_children) for
    Or(scale=) coord weighting (None otherwise). Shapes beyond this
    tier no longer bounce to ``percolate()``: ``_flat_rule_full`` falls
    back to the deep-tree program path (``_deep_rule``) — the raises
    below are the FAST-PATH boundary, not the feature boundary.

    Every rule reduces to ONE uniform grouped-leaf semantics: leaves are
    numbered in DFS order; each top-level child is a GROUP, satisfied
    when the (rule, doc) pair holds >= group_req of its leaves; the rule
    matches when >= n_required groups are satisfied; a leaf contributes
    score iff its group is satisfied. Flat Term/And/Or are the 1-leaf-
    per-group special case (identical semantics and bit-identical folds
    to before), and TWO-LEVEL trees ride the same machinery:

    - And-of-(Term | Or-of-Terms)  (CNF): Or-group req = its minmatch,
      n_required = n_children — e.g. And(Or(a, b), c).
    - Or-of-(Term | And-of-Terms)  (DNF): And-group req = its size,
      n_required = minmatch — e.g. Or(And(a, b), c).

    The flat fold over contributing leaves in DFS order is bit-identical
    to the executor's nested left-assoc fold (each group's subtotal is a
    contiguous prefix-ordered run, and x + 0.0 == x for the positive
    BM25 partials) — so nested rules stay exactly percolate()-equal.
    INNER node boost/scale would break flat-fold associativity
    ((a+b)*2 != 2a+2b bitwise), so they raise; leaf Term boosts and the
    OUTER boost/scale/minmatch are fully supported. Deeper trees belong
    on the plan-branch tier (``percolate``)."""
    def leaf(t: Q.Term, pos: int, grp: int, grp_req: int):
        if t.fieldname != fieldname:
            raise ValueError(
                f"rule {name!r}: field {t.fieldname!r} != {fieldname!r}")
        return (t.text, pos, float(t.boost), grp, grp_req)

    if isinstance(q, Q.Term):
        return [leaf(q, 0, 0, 1)], 1, 1.0, None, None
    if isinstance(q, Q.Phrase):
        if q.fieldname != fieldname:
            raise ValueError(
                f"rule {name!r}: field {q.fieldname!r} != {fieldname!r}")
        # duplicate words are fine: each word SLOT is its own broadcast
        # row (distinct _q), so a duplicated term joins the same posting
        # once per slot and the positional chain still demands strictly
        # increasing positions — exactly the executor's _c_phrase joins
        rows = [(w, i, 1.0, i, 1) for i, w in enumerate(q.words)]
        return rows, len(q.words), float(q.boost), int(q.slop), None
    if isinstance(q, (Q.And, Q.Or)):
        kids = q.subqueries
        if not kids:
            raise ValueError(f"rule {name!r}: empty {type(q).__name__}")
        inner_cls = Q.Or if isinstance(q, Q.And) else Q.And
        rows, texts, qi = [], [], 0
        for gi, k in enumerate(kids):
            if isinstance(k, Q.Term):
                rows.append(leaf(k, qi, gi, 1))
                texts.append(k.text)
                qi += 1
                continue
            if not (isinstance(k, inner_cls)
                    and k.subqueries
                    and all(isinstance(g, Q.Term) for g in k.subqueries)):
                raise ValueError(
                    f"rule {name!r}: percolate_indexed supports flat rules "
                    "and two-level And-of-Ors / Or-of-Ands of Terms; use "
                    "percolate() for this tree")
            if float(k.boost) != 1.0 or getattr(k, "scale", None):
                raise ValueError(
                    f"rule {name!r}: inner-node boost/scale breaks the "
                    "flat score fold; use percolate()")
            grp_req = (max(int(getattr(k, "minmatch", 1) or 1), 1)
                       if isinstance(k, Q.Or) else len(k.subqueries))
            for g in k.subqueries:
                rows.append(leaf(g, qi, gi, grp_req))
                texts.append(g.text)
                qi += 1
        if len(set(texts)) != len(texts):
            raise ValueError(f"rule {name!r}: duplicate terms in one rule")
        scale_pair = None
        if isinstance(q, Q.Or):
            # Or(scale=s): executor coord weighting — the summed score is
            # multiplied by (1 - s) + s * matched_children / n_children
            # (executor.py::_c_or); matched children == satisfied groups
            if getattr(q, "scale", None):
                scale_pair = (float(q.scale), float(len(kids)))
            n_req = max(int(getattr(q, "minmatch", 1) or 1), 1)
        else:
            n_req = len(kids)
        return rows, n_req, float(q.boost), None, scale_pair
    raise ValueError(
        f"rule {name!r}: {type(q).__name__} not supported by "
        "percolate_indexed; use percolate()")


_DEEP_OPS = {Q.And: 1, Q.Or: 2, Q.DisjunctionMax: 3, Q.AndMaybe: 4,
             Q.AndNot: 5, Q.Require: 6}


def _deep_rule(name: str, q: Q.Query, fieldname: str):
    """Compile an ARBITRARY-DEPTH boolean rule tree into
    (leaf_rows, program): leaf_rows = [(term, q_index, leaf_boost)] and
    program = a post-order instruction list
    [(op, n, q_packed, boost, mm, scale)] a stack machine evaluates per
    (rule, doc) group inside the kernel (one F.aggregate pass over the
    broadcast program; see ``_deep_eval``).

    Node coverage — each op mirrors the executor's compile bit-for-bit
    over the group's present leaves (absent leaf == unmatched child ==
    no row in the executor's tagged union; 0.0 + x == x keeps the
    left-assoc folds identical when unmatched children are skipped):

    - op 0  Term leaf: push (present?, leaf score from the group map)
    - op 1  And: all n children sat; score = left-assoc child sum
    - op 2  Or: >= max(minmatch, 1) children sat; sum over sat children;
            optional coord  sum * ((1-s) + s*nsat/n)  (executor _c_or)
    - op 3  DisjunctionMax: >= 1 sat; max over sat children, optional
            tiebreak  max + tb*(sum - max)  (rides the scale slot)
    - op 4  AndMaybe: sat = a; score = a + (b if b sat else 0)
    - op 5  AndNot: sat = a and not b; score = a
    - op 6  Require: sat = a and b; score = a

    Every node's score is then multiplied by its boost (x * 1.0 is the
    IEEE identity, so the unconditional multiply matches the executor's
    boost==1.0 skip bitwise). Inner-node boost / Or(minmatch=, scale=) /
    DisMax(tiebreak=) are therefore fully supported at any depth — the
    r4 limitation this path removes. Duplicate terms across the tree
    are fine (each leaf is its own slot/map key). Not / Otherwise /
    positional or multi-term leaves (Phrase, ranges, wildcards) are not
    per-doc-local over present leaves and still route to
    ``percolate()``."""
    leaves: list[tuple] = []
    prog: list[tuple] = []

    def walk(node: Q.Query) -> None:
        if isinstance(node, Q.Term):
            if node.fieldname != fieldname:
                raise ValueError(
                    f"rule {name!r}: field {node.fieldname!r} != {fieldname!r}")
            qi = len(leaves)
            leaves.append((node.text, qi, float(node.boost)))
            # q_packed mirrors the kernel's (q, grp, grp_req) pack with
            # grp=0, grp_req=1 — the map key the LEAF op looks up
            prog.append((0, 0, qi * 16777216 + 1, 1.0, 0, None))
            return
        if isinstance(node, (Q.And, Q.Or, Q.DisjunctionMax)):
            kids = node.subqueries
            if not kids:
                raise ValueError(f"rule {name!r}: empty {type(node).__name__}")
            for k in kids:
                walk(k)
            mm, sc = 0, None
            if isinstance(node, Q.Or):
                mm = max(int(node.minmatch or 1), 1)
                sc = float(node.scale) if node.scale else None
            elif isinstance(node, Q.DisjunctionMax):
                sc = float(node.tiebreak) if node.tiebreak else None
            prog.append((_DEEP_OPS[type(node)], len(kids), 0,
                         float(node.boost), mm, sc))
            return
        if isinstance(node, (Q.AndMaybe, Q.AndNot, Q.Require)):
            walk(node.a)
            walk(node.b)
            prog.append((_DEEP_OPS[type(node)], 2, 0, float(node.boost),
                         0, None))
            return
        raise ValueError(
            f"rule {name!r}: {type(node).__name__} nodes are not supported "
            "in percolate_indexed rule trees; use percolate()")

    walk(q)
    return leaves, prog


def _deep_min_leaves(q: Q.Query) -> int:
    """Lower bound on the number of PRESENT leaf slots a (rule, doc)
    group must hold for the deep rule's root to possibly be satisfied.
    The kernel skips the stack-machine eval for groups below this bound
    (most groups hold 1-2 present leaves; And-rooted trees need
    several) — a pure prune: a group failing the bound can never have
    sat(root), so filtering it pre-eval changes nothing.

    Duplicate terms are safe: leaves are distinct broadcast slots, so a
    doc containing a term shared by two subtrees yields TWO items."""
    if isinstance(q, Q.Term):
        return 1
    if isinstance(q, Q.And):
        return sum(_deep_min_leaves(k) for k in q.subqueries)
    if isinstance(q, Q.Or):
        mm = max(int(q.minmatch or 1), 1)
        mins = sorted(_deep_min_leaves(k) for k in q.subqueries)
        return sum(mins[:mm])
    if isinstance(q, Q.DisjunctionMax):
        return min(_deep_min_leaves(k) for k in q.subqueries)
    if isinstance(q, (Q.AndMaybe, Q.AndNot)):
        return _deep_min_leaves(q.a)
    if isinstance(q, Q.Require):
        return _deep_min_leaves(q.a) + _deep_min_leaves(q.b)
    raise ValueError(f"unexpected deep node {type(q).__name__}")


def _flat_rule_full(name: str, q: Q.Query, fieldname: str):
    """Full per-rule flattening -> (pos_rows, n_required, rule_boost,
    slop, coord, neg_rows, neg_required, neg_slop, req_rows,
    req_required, req_slop, prog) — ``coord`` = the a-side's Or(scale=)
    (scale, n_children) pair or None. AndNot(a, b): a scored, doc excluded when it matches b
    (executor's left_anti); Require(a, b): doc kept only when it matches
    b (left_semi). b may be flat Term/And/Or OR a Phrase: AND-shaped b
    excludes/requires only when ALL its terms hit, OR-shaped when
    minmatch of them hit, Phrase b when all word slots hit AND the
    positional chain survives — exactly the compiled semantics of b as a
    match set. The a side may be a Phrase (slop carried through). b's
    rows are (term, slot) pairs so a positional b keeps word order.

    Rules the flat/grouped tier cannot shape (3+-level trees, inner
    boost/minmatch/scale/tiebreak, duplicate terms, inner
    AndNot/AndMaybe/Require/DisMax) fall back to the DEEP path: the
    whole rule — b-sides included — compiles to one post-order program
    (``_deep_rule``), ``prog`` is that instruction list, every leaf
    (scoring or not) rides a role-0 row, and the other slots are inert
    (n_required=0, boost 1.0 — the program carries all boosts). Only
    trees mixing a positional a/b side (Phrase) with a deep boolean
    side exceed both tiers and still raise -> ``percolate()``."""
    if isinstance(q, (Q.AndNot, Q.Require)):
        try:
            pos_rows, n_req, a_boost, slop, coord = _flat_rule(
                name, q.a.normalize(), fieldname)
            b_rows, b_req, b_boost, b_slop, _b_coord = _flat_rule(
                name, q.b.normalize(), fieldname)
        except ValueError:
            leaves, prog = _deep_rule(name, q, fieldname)
            pos_rows = [(t, qi, lb, 0, 1) for t, qi, lb in leaves]
            return (pos_rows, 0, 1.0, None, None,
                    [], None, None, [], None, None, prog)
        del b_boost, _b_coord  # b is a pure match set; scores/boosts/coord unused
        # b rows keep their (group, group_req) labels: the b-side match
        # predicate is the same satisfied-group count the a-side uses
        # (>= b_req groups satisfied), so TWO-LEVEL b trees ride the
        # identical machinery — the executor's left_anti/left_semi
        # compile b fully, and sat-count == its match set by the same
        # argument as the a-side
        b = [(t, pos, g, gr) for t, pos, _lb, g, gr in b_rows]
        rboost = a_boost * float(q.boost)
        if isinstance(q, Q.AndNot):
            return (pos_rows, n_req, rboost, slop, coord,
                    b, b_req, b_slop, [], None, None, None)
        return (pos_rows, n_req, rboost, slop, coord,
                [], None, None, b, b_req, b_slop, None)
    try:
        pos_rows, n_req, rboost, slop, coord = _flat_rule(name, q, fieldname)
    except ValueError:
        leaves, prog = _deep_rule(name, q, fieldname)
        pos_rows = [(t, qi, lb, 0, 1) for t, qi, lb in leaves]
        return (pos_rows, 0, 1.0, None, None,
                [], None, None, [], None, None, prog)
    return (pos_rows, n_req, rboost, slop, coord,
            [], None, None, [], None, None, None)


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
    still O(1) plan size; duplicate words are distinct slots, so they
    join the same posting once per slot like the executor's self-joins.
    ``AndNot(a, b)`` and ``Require(a, b)`` take flat OR Phrase b-sides
    (a may be a phrase): b's terms ride the same broadcast as
    non-scoring NEGATIVE / REQUIRE rows with word slots, and the group
    filter excludes docs where b matches (hit count >= b_required, plus
    b's own positional chain when b is a phrase — the left_anti
    semantics) or demands a b match (left_semi). ``Or(scale=)`` coord
    weighting rides two more broadcast columns: the group's summed score
    is multiplied by (1-s) + s*matched/n_children with the executor's
    exact expression order, still bit-identical to ``percolate()``.
    TWO-LEVEL trees ride the same grouped-leaf broadcast (see
    _flat_rule): And-of-(Term|Or-of-Terms) and Or-of-(Term|And-of-Terms)
    — each top-level child is a group with its own req, the rule matches
    on the satisfied-group count, and a leaf scores iff its group is
    satisfied, all bit-identical to ``percolate()``. ARBITRARY-DEPTH
    boolean trees — And / Or(minmatch=, scale=) / DisjunctionMax
    (tiebreak=) / AndMaybe / AndNot / Require / Term at any depth, with
    boosts on ANY node and duplicate terms allowed — compile to a
    post-order program evaluated by a stack machine inside the same
    grouped scan (``_deep_rule`` / ``deep_eval``), still O(1) plan size
    and bit-identical to ``percolate()``; the program columns are added
    to the broadcast only when a deep rule is present, so the flat-rule
    hot path is unchanged, and a min-present-leaves bound
    (``_deep_min_leaves``) skips the program eval for groups that
    cannot satisfy the root. Broadcast sizing at scale: each DEEP
    rule's program rides on its own leaf rows only (~50 B/instruction x
    leaves), so even a pathological 100k-deep-rule set stays a
    few-hundred-MB broadcast; flat rules carry a null program (1 byte).
    Only rules mixing positional sides (Phrase) with deep boolean
    sides, plus Not/Otherwise and non-Term leaves (ranges, wildcards),
    still raise — route those through ``percolate``.
    """
    from whoosh_spark.search.scoring import BM25F

    w = weighting or BM25F()
    if getattr(w, "use_final", False):
        raise ValueError("final()-hook weightings are per-result-set; "
                         "use percolate()")
    # roles: 0 = scoring positive row, 1 = negative (AndNot.b),
    # 2 = require (Require.b); neg/req rows never contribute score.
    # Phrase rules ride the same rows with ``_slop`` set — their
    # positional chain closes inside the same (rule, doc) group. A
    # phrase B-SIDE rides its role's rows with ``_nsl``/``_rsl`` set and
    # word slots in ``_q``, closing its own chain the same way.
    rows = []
    any_phrase = False
    any_deep = False
    for name, q in queries.items():
        (pos, n_req, rboost, slop, coord, neg, neg_req, neg_slop,
         req, req_req, req_slop, prog) = _flat_rule_full(
            name, q.normalize(), fieldname)
        any_phrase = any_phrase or any(
            s is not None for s in (slop, neg_slop, req_slop))
        any_deep = any_deep or prog is not None
        # deep-rule prune bound: groups holding fewer present leaf slots
        # than the root can possibly be satisfied with skip the program
        # eval entirely (and the null result filters them — a pure prune)
        minl = _deep_min_leaves(q.normalize()) if prog is not None else 0
        scale, n_children = coord if coord is not None else (None, None)
        # flat-rule fast path: when every group is a singleton with
        # req 1 (all flat Term/And/Or and Phrase rules), satisfied-group
        # count == plain row count and the grouped total == the plain
        # ordered fold — the kernel then skips the struct-accumulator
        # group scan entirely, so the 100k-flat-rule hot case pays
        # exactly the pre-grouping cost. Deep rules mark a_flat too:
        # their score/match comes from the program stack machine, so
        # the group scan must not run for them either.
        a_flat = (prog is not None
                  or (all(r[4] == 1 for r in pos)
                      and len({r[3] for r in pos}) == len(pos)))
        n_flat = (all(r[3] == 1 for r in neg)
                  and len({r[2] for r in neg}) == len(neg))
        r_flat = (all(r[3] == 1 for r in req)
                  and len({r[2] for r in req}) == len(req))
        base_cols = (n_req, neg_req, req_req, rboost, slop, neg_slop,
                     req_slop, scale, n_children, a_flat, n_flat, r_flat,
                     prog is not None, prog, minl)
        for t, pos_i, lboost, grp, grp_req in pos:
            rows.append((name, t, pos_i, lboost, 0, grp, grp_req) + base_cols)
        for t, slot, grp, grp_req in neg:
            rows.append((name, t, slot, 0.0, 1, grp, grp_req) + base_cols)
        for t, slot, grp, grp_req in req:
            rows.append((name, t, slot, 0.0, 2, grp, grp_req) + base_cols)
    if any(r[2] >= 16777216 or r[5] >= 4096 or r[6] >= 4096 for r in rows):
        # the (q, group, group_req) pack budgets 24/12/12 bits — far
        # beyond any real rule (a 4096-leaf standing query belongs on
        # the plan-branch tier anyway)
        raise ValueError("rule too large for percolate_indexed "
                         "(>16M leaves or >4095 groups/group-req); "
                         "use percolate()")
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
    # the two deep-path columns (_deep flag + the broadcast program) are
    # added ONLY when some rule actually went deep — the flat-rule hot
    # path's broadcast, agg, and plan stay byte-identical otherwise
    deep_schema = (
        ", _deep boolean, _prog array<struct<"
        "op:int,n:int,q:bigint,boost:double,mm:int,scale:double>>, "
        "_minl int"
        if any_deep else ""
    )
    rules_df = spark.createDataFrame(
        [(n, t, q_, lb, role, g, gr, nr, ngr, rqr, rb, sl, nsl, rsl, sc, nch,
          af, nf, rf) + ((dp, pg, ml) if any_deep else ()) + (idf[t],)
         for (n, t, q_, lb, role, g, gr, nr, ngr, rqr, rb, sl, nsl, rsl, sc,
              nch, af, nf, rf, dp, pg, ml) in rows if t in idf],
        "query_name string, term string, _q int, _lboost double, _role int, "
        "_grp int, _grp_req int, "
        "_n_required int, _neg_required int, _req_required int, "
        "_rboost double, _slop int, _neg_slop int, _req_slop int, "
        "_scale double, _n_children double, "
        "_aflat boolean, _nflat boolean, _rflat boolean"
        + deep_schema + ", _idf double",
    )
    base = w.score_expr(fs, F.col("_idf"), avgdl, F.col("weight"), F.col("dl"))
    # positions ride ONLY on rows whose role participates in a positional
    # chain (phrase a-side on role 0, phrase b-side on its role) — with
    # one phrase rule among 100k boolean rules, the boolean rows' payload
    # must not multiply by the positions size
    if any_phrase:
        pos_needed = (
            ((F.col("_role") == 0) & F.col("_slop").isNotNull())
            | ((F.col("_role") == 1) & F.col("_neg_slop").isNotNull())
            | ((F.col("_role") == 2) & F.col("_req_slop").isNotNull())
        )
        pos_col = F.when(pos_needed, F.col("positions"))
    else:
        pos_col = F.lit(None).cast("array<int>")
    # (q, group, group_req) PACK into one long with q in the high bits:
    # array_sort on the item struct still orders by q (q is distinct per
    # rule), the struct stays 3 fields (the collect/sort payload is the
    # kernel's hot cost — a 5-field struct measured ~2x on the 961-rule
    # A/B), and group_scan decodes g/gr only on the grouped slow path
    packed_q = (F.col("_q").cast("long") * F.lit(16777216)
                + F.col("_grp").cast("long") * F.lit(4096)
                + F.col("_grp_req").cast("long"))
    jcols = [
        "query_name", "doc_id", packed_q.alias("_q"), F.col("_role"),
        F.col("_n_required"), F.col("_neg_required"), F.col("_req_required"),
        F.col("_rboost"), F.col("_slop"), F.col("_neg_slop"),
        F.col("_req_slop"), F.col("_scale"), F.col("_n_children"),
        F.col("_aflat"), F.col("_nflat"), F.col("_rflat"),
        (base * F.col("_lboost")).alias("score"),
        pos_col.alias("_pos"),
    ]
    if any_deep:
        jcols += [F.col("_deep"), F.col("_prog"), F.col("_minl")]
    j = p.join(F.broadcast(rules_df), "term").select(*jcols)
    # the executor's _ordered_sum: left-assoc fold in query order, so a
    # 2-term AND scores bit-identically to Searcher.compile(And([...]));
    # other roles are nulled out of each list (collect_list skips nulls)
    def role_items(r):
        return F.array_sort(
            F.collect_list(
                F.when(
                    F.col("_role") == r,
                    F.struct(F.col("_q").alias("q"),
                             F.col("score").alias("s"),
                             F.col("_pos").alias("p")),
                )
            )
        )

    n_role = lambda r: F.sum(F.when(F.col("_role") == r, 1).otherwise(0))  # noqa: E731
    grouped = (
        j.groupBy("query_name", "doc_id")
        .agg(role_items(0).alias("_items"),
             role_items(1).alias("_nitems"), role_items(2).alias("_ritems"),
             n_role(0).alias("_n"), n_role(1).alias("_neg"), n_role(2).alias("_hasreq"),
             F.first("_n_required").alias("_req"),
             F.first("_neg_required").alias("_negr"),
             F.first("_req_required").alias("_reqr"),
             F.first("_rboost").alias("_rb"),
             F.first("_slop").alias("_sl"),
             F.first("_neg_slop").alias("_nsl"),
             F.first("_req_slop").alias("_rsl"),
             F.first("_scale").alias("_sc"),
             F.first("_n_children").alias("_nch"),
             F.first("_aflat").alias("_aflat"),
             F.first("_nflat").alias("_nflat"),
             F.first("_rflat").alias("_rflat"),
             *([F.first("_deep").alias("_deep"),
                F.first("_prog").alias("_prog"),
                F.first("_minl").alias("_minl")] if any_deep else []))
    )
    # grouped-leaf semantics (see _flat_rule): walk the q-sorted items
    # once (each group's leaves are a contiguous DFS run) collecting the
    # groups whose present-leaf count meets their req. Flat rules are
    # the every-leaf-its-own-group case: sat == all present leaves, so
    # every expression below reduces bit-exactly to the pre-grouped fold.
    def _pk_g(x):
        return F.shiftright(x["q"], 12) % F.lit(4096)

    def _pk_gr(x):
        return x["q"] % F.lit(4096)

    def group_scan(items_name: str):
        """ONE left-assoc pass over the q-sorted items of a role: each
        contiguous (g, gr) group closes by adding its in-order partial
        sum to the total iff its present-leaf count met its req, and
        bumping the satisfied-group count. Returns struct(total, nsat).

        Bit-exactness vs the executor's nested fold: the total is
        g1sum + g2sum + ... over satisfied groups in DFS order with each
        group partial left-assoc over its leaves — exactly the
        executor's association (0.0 + x == x for the positive BM25
        partials), and for flat rules (every leaf its own group) it
        reduces to the plain ordered sum. A single O(items) pass per
        (rule, doc) row — no per-element membership probes.
        """
        return F.aggregate(
            F.col(items_name),
            F.struct(
                F.lit(-1).cast("long").alias("g"), F.lit(0).alias("c"),
                F.lit(1).cast("long").alias("r"),
                F.lit(0.0).alias("gsum"), F.lit(0.0).alias("total"),
                F.lit(0).alias("nsat"),
            ),
            lambda acc, x: F.struct(
                _pk_g(x).alias("g"),
                F.when(_pk_g(x) == acc["g"], acc["c"] + 1)
                 .otherwise(F.lit(1)).alias("c"),
                _pk_gr(x).alias("r"),
                F.when(_pk_g(x) == acc["g"], acc["gsum"] + x["s"])
                 .otherwise(x["s"]).alias("gsum"),
                F.when(
                    (_pk_g(x) != acc["g"]) & (acc["g"] >= 0)
                    & (acc["c"] >= acc["r"]),
                    acc["total"] + acc["gsum"],
                ).otherwise(acc["total"]).alias("total"),
                F.when(
                    (_pk_g(x) != acc["g"]) & (acc["g"] >= 0)
                    & (acc["c"] >= acc["r"]),
                    acc["nsat"] + 1,
                ).otherwise(acc["nsat"]).alias("nsat"),
            ),
            lambda acc: F.struct(
                F.when((acc["g"] >= 0) & (acc["c"] >= acc["r"]),
                       acc["total"] + acc["gsum"])
                 .otherwise(acc["total"]).alias("total"),
                F.when((acc["g"] >= 0) & (acc["c"] >= acc["r"]),
                       acc["nsat"] + 1)
                 .otherwise(acc["nsat"]).alias("nsat"),
            ),
        )

    def deep_eval(items_name: str):
        """Evaluate the rule's post-order program over this (rule, doc)
        group's present leaves -> struct(sat, s). A stack machine in ONE
        F.aggregate pass over the broadcast ``_prog`` array: LEAF ops
        push (present?, leaf score) looked up in a q->score map built
        from the group's items; node ops pop their n children (the top
        n stack slots, in child order) and combine with the executor's
        exact expressions (see ``_deep_rule`` op table). Bit-exactness
        vs ``percolate()``: child sums are left-assoc in child order
        with unmatched children contributing 0.0 (the executor's tagged
        union simply lacks those rows, and 0.0 + x == x for the
        positive partials); every node multiplies by its boost (IEEE
        identity at 1.0); coord / tiebreak mirror _c_or / _c_dismax
        operand order. Cost: O(program length) array ops per (rule,
        doc) row, deep rules only — flat rules skip this column. The
        q->score map lives in its own per-row column (``_dmap``), built
        once per (rule, doc) group rather than inlined into every LEAF
        instruction (measured neutral vs the inline form — Catalyst's
        subexpression elimination already collapsed it — but the hoist
        keeps the program fold readable and the intent explicit)."""
        m = F.col("_dmap")
        stack_t = "array<struct<sat:boolean,s:double>>"

        def step(acc, ins):
            hit = F.element_at(m, ins["q"])
            push_leaf = F.concat(acc, F.array(F.struct(
                hit.isNotNull().alias("sat"),
                F.coalesce(hit, F.lit(0.0)).alias("s"))))
            n = ins["n"]
            ch = F.slice(acc, F.size(acc) - n + 1, n)
            rest = F.slice(acc, F.lit(1), F.size(acc) - n)
            csum = F.aggregate(
                ch, F.lit(0.0),
                lambda a, x: a + F.when(x["sat"], x["s"]).otherwise(F.lit(0.0)))
            nsat = F.size(F.filter(ch, lambda x: x["sat"]))
            sat1 = F.element_at(ch, 1)["sat"]
            s1 = F.element_at(ch, 1)["s"]
            sat2 = F.element_at(ch, 2)["sat"]
            s2 = F.element_at(ch, 2)["s"]
            mx = F.array_max(F.transform(
                F.filter(ch, lambda x: x["sat"]), lambda x: x["s"]))
            or_s = F.when(
                ins["scale"].isNotNull(),
                csum * ((F.lit(1.0) - ins["scale"])
                        + ins["scale"] * nsat.cast("double")
                        / n.cast("double")),
            ).otherwise(csum)
            dm_s = F.when(
                ins["scale"].isNotNull(),
                mx + ins["scale"] * (csum - mx),
            ).otherwise(mx)
            node = (
                F.when(ins["op"] == 1, F.struct(
                    (nsat == n).alias("sat"),
                    (csum * ins["boost"]).alias("s")))
                .when(ins["op"] == 2, F.struct(
                    (nsat >= ins["mm"]).alias("sat"),
                    (or_s * ins["boost"]).alias("s")))
                .when(ins["op"] == 3, F.struct(
                    (nsat >= 1).alias("sat"),
                    (dm_s * ins["boost"]).alias("s")))
                .when(ins["op"] == 4, F.struct(
                    sat1.alias("sat"),
                    ((s1 + F.when(sat2, s2).otherwise(F.lit(0.0)))
                     * ins["boost"]).alias("s")))
                .when(ins["op"] == 5, F.struct(
                    (sat1 & ~sat2).alias("sat"),
                    (s1 * ins["boost"]).alias("s")))
                .otherwise(F.struct(
                    (sat1 & sat2).alias("sat"),
                    (s1 * ins["boost"]).alias("s")))
            )
            return F.when(ins["op"] == 0, push_leaf) \
                    .otherwise(F.concat(rest, F.array(node)))

        return F.element_at(
            F.aggregate(F.col("_prog"), F.array().cast(stack_t), step), 1)

    grouped = (
        grouped
        .withColumn("_gs", F.when(~F.col("_aflat"), group_scan("_items")))
        .withColumn("_ngs", F.when(~F.col("_nflat"), group_scan("_nitems")))
        .withColumn("_rgs", F.when(~F.col("_rflat"), group_scan("_ritems")))
    )
    if any_deep:
        # the _minl guard prunes the stack-machine eval for groups that
        # cannot satisfy the rule's root (fewer present leaf slots than
        # _deep_min_leaves' bound); the null _dres then fails the match
        # predicate, which is exactly what the full eval would conclude
        deep_live = F.col("_deep") & (F.col("_n") >= F.col("_minl"))
        grouped = grouped.withColumn(
            "_dmap",
            F.when(
                deep_live,
                F.map_from_entries(
                    F.transform(F.col("_items"),
                                lambda x: F.struct(x["q"].alias("key"),
                                                   x["s"].alias("value")))),
            ),
        ).withColumn(
            "_dres", F.when(deep_live, deep_eval("_items")))
    plain_fold = F.aggregate(F.col("_items"), F.lit(0.0),
                             lambda acc, x: acc + x["s"])
    n_sat = F.when(F.col("_aflat"), F.col("_n")) \
             .otherwise(F.col("_gs")["nsat"].cast("long"))
    fold = F.when(F.col("_aflat"), plain_fold) \
            .otherwise(F.col("_gs")["total"])
    # Or(scale=) coord weighting — the executor's exact expression order:
    # sum * ((1 - scale) + scale * matched / n_children), matched =
    # count_distinct of matched children == satisfied groups. Unscaled
    # rules multiply by nothing.
    coord_fold = F.when(
        F.col("_sc").isNotNull(),
        fold * ((F.lit(1.0) - F.col("_sc"))
                + F.col("_sc") * n_sat / F.col("_nch")),
    ).otherwise(fold)

    # positional chain over word-slot-ordered items — EXACTLY the
    # executor's _phrase_step fold (keep x in next where some c in
    # current has c < x <= c + slop). Guarded: only computed for groups
    # with >= 1 item of that role (element_at(…, 1) would raise under
    # ANSI on an empty array — e.g. a neg-rows-only group).
    def chain_ok(items_name: str, slop_col):
        items = F.col(items_name)
        chain = F.when(
            slop_col.isNotNull() & (F.size(items) >= 1),
            F.aggregate(
                F.slice(items, 2, F.greatest(F.size(items) - 1, F.lit(0))),
                F.element_at(items, 1)["p"],
                lambda acc, x: F.filter(
                    x["p"],
                    lambda v: F.exists(acc, lambda c: (v > c) & (v <= c + slop_col)),
                ),
            ),
        ).otherwise(F.lit(None).cast("array<int>"))
        return slop_col.isNull() | (F.size(chain) > 0)

    phrase_ok = chain_ok("_items", F.col("_sl"))
    # b-side MATCH predicates: a flat b matches on its hit-count
    # threshold alone; a phrase b additionally demands its own surviving
    # chain. AndNot keeps docs where b does NOT match; Require keeps
    # docs where it does.
    # b matches on its satisfied-group count (== plain hit count for
    # flat/phrase b, group-aware for two-level b) plus its chain
    neg_sat = F.when(F.col("_nflat"), F.col("_neg")) \
               .otherwise(F.col("_ngs")["nsat"].cast("long"))
    req_sat = F.when(F.col("_rflat"), F.col("_hasreq")) \
               .otherwise(F.col("_rgs")["nsat"].cast("long"))
    neg_matches = (neg_sat >= F.col("_negr")) & chain_ok(
        "_nitems", F.col("_nsl"))
    req_matches = (req_sat >= F.col("_reqr")) & chain_ok(
        "_ritems", F.col("_rsl"))
    a_match = n_sat >= F.col("_req")
    score_fold = coord_fold
    if any_deep:
        # deep rules: the program's root decides match AND score; the
        # flat/grouped predicates stay untouched for everything else
        # (_req is 0 for deep rules, so the flat predicate is inert, but
        # the explicit branch keeps the deep path self-describing)
        a_match = F.when(F.col("_deep"), F.col("_dres")["sat"]) \
                   .otherwise(a_match)
        score_fold = F.when(F.col("_deep"), F.col("_dres")["s"]) \
                      .otherwise(coord_fold)
    out = (
        grouped.where(
            a_match
            & (F.col("_negr").isNull() | ~neg_matches)
            & (F.col("_reqr").isNull() | req_matches)
        )
        .where(phrase_ok)
        .select("query_name", "doc_id",
                (score_fold * F.col("_rb")).alias("score"))
    )
    return out, ix
