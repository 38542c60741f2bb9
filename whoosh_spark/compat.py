"""Drop-in-style top-level API over the Spark-native engine.

Mirrors the reference's user-facing workflow (src/whoosh/index.py::
create_in/open_dir ~L60; writing.py::IndexWriter.add_document/
update_document/commit; searching.py::Searcher.search returning Results of
Hit objects) so a user of the reference can port code with minimal edits:

    ix = compat.create_in("/path", schema, spark)
    w = ix.writer()
    w.add_document(title="...", text="...")
    w.commit()
    with_hits = ix.searcher().search("hash join", limit=10)
    with_hits[0]["title"], with_hits[0].score

Execution stays Spark-shaped underneath: ``commit()`` turns the buffered
docs into ONE micro-batch segment through the streaming indexer (analyzer
chain -> packed blocks -> atomic manifest), so a "writer" is just a tiny
client-side buffer in front of the distributed build — there is no
row-at-a-time indexing anywhere. The schema serializes to ``_schema.json``
in the index directory (the reference pickles it into the TOC), so
``open_dir`` needs no schema argument.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from whoosh_spark.fields import Schema, schema_from_dict, schema_to_dict
from whoosh_spark.indexing.segments import (
    _read_manifest,
    delete_by_term as _delete_by_term,
    open_segments,
)
from whoosh_spark.query import nodes as Q
from whoosh_spark.query.parser import QueryParser
from whoosh_spark.search import Searcher
from whoosh_spark.streaming.incremental import IncrementalIndexer, upsert_batch

_SCHEMA_FILE = "_schema.json"


def create_in(dirname: str, schema: Schema,
              spark: SparkSession | None = None) -> "CompatIndex":
    """Create a new (empty) index directory, clearing any existing index
    there (reference: index.create_in overwrites)."""
    import shutil

    spark = spark or SparkSession.getActiveSession()
    if os.path.isdir(dirname) and (
        exists_in(dirname) or os.path.exists(os.path.join(dirname, "_meta.json"))
    ):
        shutil.rmtree(dirname)
    os.makedirs(dirname, exist_ok=True)
    with open(os.path.join(dirname, _SCHEMA_FILE), "w") as f:
        json.dump(schema_to_dict(schema), f)
    IncrementalIndexer(spark, dirname, schema)  # writes the empty TOC
    return CompatIndex(spark, dirname, schema)


def open_dir(dirname: str, spark: SparkSession | None = None) -> "CompatIndex":
    """Open an existing index; the schema comes from _schema.json
    (reference: index.open_dir unpickling the stored schema)."""
    spark = spark or SparkSession.getActiveSession()
    with open(os.path.join(dirname, _SCHEMA_FILE)) as f:
        schema = schema_from_dict(json.load(f))
    return CompatIndex(spark, dirname, schema)


def exists_in(dirname: str) -> bool:
    return os.path.exists(os.path.join(dirname, _SCHEMA_FILE))


class _HitFields(dict):
    """The reference exposes stored fields as the METHOD ``Hit.fields()``;
    this facade historically exposed the attribute ``hit.fields``. A
    callable dict keeps both spellings working."""

    def __call__(self) -> dict:
        return self


class Hit:
    """One result row: stored fields + score (reference: searching.py::Hit).
    Dict-like over the stored fields (``in`` / iteration / keys / items),
    matching the reference's Hit mapping surface."""

    __slots__ = ("fields", "score", "docnum", "_qterms", "matched_terms")

    def __init__(self, fields: dict, score: float, docnum: int,
                 qterms: dict[str, set] | None = None,
                 matched_terms: list[str] | None = None):
        self.fields = _HitFields(fields)
        self.score = score
        self.docnum = docnum
        self._qterms = qterms or {}
        # terms=True surface (reference: Hit.matched_terms returns
        # (field, termbytes) pairs; here: the matched term texts)
        self.matched_terms = matched_terms

    def __getitem__(self, name):
        return self.fields[name]

    def get(self, name, default=None):
        return self.fields.get(name, default)

    def __contains__(self, name) -> bool:
        return name in self.fields

    def __iter__(self):
        return iter(self.fields)

    def __len__(self) -> int:
        return len(self.fields)

    def keys(self):
        return self.fields.keys()

    def items(self):
        return self.fields.items()

    def values(self):
        return self.fields.values()

    def highlights(self, fieldname: str, top: int = 2, fmt="upper",
                   fragmenter: str = "context") -> str:
        """Snippets of this hit's stored field for the query's terms
        (reference: Hit.highlights, searching.py ~L1400)."""
        from whoosh_spark.search.highlight import highlights as _hl

        terms = self._qterms.get(fieldname, set())
        text = self.fields.get(fieldname) or ""
        if not terms or not text:
            return ""
        return _hl(str(text), terms, top=top, fmt=fmt, fragmenter=fragmenter)

    def __repr__(self):
        return f"<Hit doc={self.docnum} score={self.score:.4f} {self.fields!r}>"


class Results(list):
    """List of Hits (reference: searching.py::Results — the commonly-used
    surface: iteration, indexing, len, scored_length, groups, docnum set
    ops, and the extend/filter/upgrade combinators)."""

    _groups: dict | None = None
    _searcher: "CompatSearcher | None" = None
    _fieldname: str | None = None

    def scored_length(self) -> int:
        return len(self)

    def is_empty(self) -> bool:
        return len(self) == 0

    def estimated_length(self) -> int:
        """reference: Results.estimated_length — here the collected length
        IS exact (the engine computed the full top-k)."""
        return len(self)

    def estimated_min_length(self) -> int:
        return len(self)

    def docs(self) -> set:
        """Docnums of the hits (reference: Results.docs)."""
        return {h.docnum for h in self}

    def items(self):
        """Yield (docnum, score) pairs (reference: Results.items)."""
        for h in self:
            yield (h.docnum, h.score)

    def fields(self, n: int) -> dict:
        """Stored fields of hit ``n`` (reference: Results.fields)."""
        return dict(self[n].fields)

    def score(self, n: int) -> float:
        return self[n].score

    def docnum(self, n: int) -> int:
        return self[n].docnum

    def has_matched_terms(self) -> bool:
        """True when the search recorded matched terms — search(terms=True)
        (reference: Results.has_matched_terms)."""
        return any(h.matched_terms is not None for h in self)

    def matched_terms(self) -> set:
        """Union of the hits' matched term texts (reference:
        Results.matched_terms returns (field, termbytes) pairs; this
        facade records the matched texts)."""
        if not self.has_matched_terms():
            raise ValueError("search was not run with terms=True")
        out: set = set()
        for h in self:
            out.update(h.matched_terms or [])
        return out

    def facet_names(self) -> list[str]:
        """Names of the groupedby facets present (reference:
        Results.facet_names)."""
        return sorted(self._groups or {})

    def key_terms(self, fieldname: str, docs: int = 10,
                  numterms: int = 5, model: str = "bo1"):
        """Key terms of the top ``docs`` hits (reference: Results.key_terms
        — delegates to Searcher.key_terms over the leading docnums)."""
        if self._searcher is None:
            raise ValueError("these Results are detached from a searcher")
        docnums = [h.docnum for h in self[:docs]]
        return self._searcher.key_terms(docnums, fieldname, numterms, model)

    # -- set-op combinators (reference: Results.extend/filter/upgrade —
    # in-place edits over the collected hit lists, driver-side by nature) --

    def extend(self, results) -> None:
        """Append hits of ``results`` not already present (reference:
        Results.extend)."""
        have = self.docs()
        super().extend(h for h in results if h.docnum not in have)

    def filter(self, results) -> None:
        """Remove hits that are NOT also in ``results`` (reference:
        Results.filter keeps the intersection; a no-op when the other set
        is empty, like the reference)."""
        if not len(results):
            return
        keep = results.docs() if isinstance(results, Results) else {
            h.docnum for h in results}
        self[:] = [h for h in self if h.docnum in keep]

    def upgrade(self, results, reverse: bool = False) -> None:
        """Re-sort so hits also present in ``results`` float to the top
        (bottom when ``reverse``) — relative order otherwise preserved
        (reference: Results.upgrade)."""
        other = results.docs() if isinstance(results, Results) else {
            h.docnum for h in results}
        inside = [h for h in self if h.docnum in other]
        outside = [h for h in self if h.docnum not in other]
        self[:] = outside + inside if reverse else inside + outside

    def upgrade_and_extend(self, results) -> None:
        """Extend with the other set's new hits, then upgrade its docs
        (reference: Results.upgrade_and_extend)."""
        self.extend(results)
        self.upgrade(results)

    def groups(self, name: str | None = None) -> dict:
        """Facet groups from ``search(groupedby=...)`` (reference:
        Results.groups ~L950): key -> docnums list (OrderedList maptype),
        count (Count), or best docnum (Best). ``name`` optional when one
        facet was requested, like the reference."""
        if not self._groups:
            raise KeyError("no groupedby facets were requested in search()")
        if name is None:
            if len(self._groups) != 1:
                raise KeyError(f"several facets present: {sorted(self._groups)}")
            return next(iter(self._groups.values()))
        return self._groups[name]


class ResultsPage(Results):
    """One page of hits (reference: searching.py::ResultsPage ~L1500):
    slice [offset : offset+pagelen] of the top pagenum*pagelen results."""

    def __init__(self, hits, pagenum: int, pagelen: int, total: int):
        self.pagenum = pagenum
        self.pagelen = pagelen
        self.offset = (pagenum - 1) * pagelen
        self.total = total
        super().__init__(hits)

    def is_last_page(self) -> bool:
        return self.offset + len(self) >= self.total


def _query_field_terms(q: "Q.Query") -> dict[str, set]:
    """field -> term texts of a query tree (feeds Hit.highlights, like the
    reference's Query.existing_terms)."""
    out: dict[str, set] = {}

    def walk(node):
        if isinstance(node, Q.Term):
            out.setdefault(node.fieldname, set()).add(node.text)
        elif isinstance(node, Q.Phrase):
            out.setdefault(node.fieldname, set()).update(node.words)
        elif isinstance(node, Q.CompoundQuery):
            for s in node.subqueries:
                walk(s)
        elif isinstance(node, Q.BinaryQuery):
            walk(node.a)
            walk(node.b)
        elif hasattr(node, "subquery"):
            walk(node.subquery)

    walk(q)
    return out


def _toc_fingerprint(path: str) -> tuple:
    """Cheap content identity of the index's commit state: the TOC body
    plus the delete/tombstone id-set file listings. Changes on every
    commit, merge, and delete — the signal behind up_to_date()/refresh()
    (the reference keys freshness on the TOC generation number; deletes
    here live OUTSIDE the TOC, so they join the fingerprint)."""
    parts: list = []
    meta = os.path.join(path, "_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            parts.append(f.read())
    for sub in ("_deletes", "_tombstones"):
        d = os.path.join(path, sub)
        if os.path.isdir(d):
            parts.append(tuple(sorted(
                (n, os.path.getsize(os.path.join(d, n)))
                for n in os.listdir(d) if not n.startswith(".")
            )))
        else:
            parts.append(None)
    return tuple(parts)


class CompatIndex:
    def __init__(self, spark: SparkSession, path: str, schema: Schema):
        self.spark = spark
        self.path = path
        self.schema = schema
        self._indexer = IncrementalIndexer(spark, path, schema)
        self._opened_at = _toc_fingerprint(path)

    # -- lifecycle (reference: Index.close/refresh/up_to_date/
    #    latest_generation/last_modified — index.py::FileIndex ~L450) -----

    def close(self) -> None:
        """No-op: the index holds no locks or handles — readers open the
        published TOC snapshot per call (the reference closes storage
        file handles here)."""

    def __enter__(self) -> "CompatIndex":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def is_empty(self) -> bool:
        """reference: Index.is_empty — no documents ever committed."""
        return self.doc_count_all() == 0

    def latest_generation(self) -> int:
        """Generation of the published term-stats tier, -1 before the
        first non-empty commit (reference: latest_generation returns the
        newest TOC gen on disk; our TOC swap republishes stats per
        commit, so the stats generation is the commit counter once the
        index is non-empty)."""
        meta = os.path.join(self.path, "_meta.json")
        if not os.path.exists(meta):
            return -1
        with open(meta) as f:
            stats = json.load(f).get("stats")
        return -1 if stats is None else int(stats["generation"])

    def last_modified(self) -> float:
        """Commit-point mtime (reference: Index.last_modified)."""
        meta = os.path.join(self.path, "_meta.json")
        return os.path.getmtime(meta) if os.path.exists(meta) else -1.0

    def up_to_date(self) -> bool:
        """True when no OTHER handle committed/deleted since this object
        opened (reference: Index.up_to_date compares generations).
        Writes through this index's own writer keep it up to date — its
        searchers/readers open the published TOC per call anyway."""
        return _toc_fingerprint(self.path) == self._opened_at

    def _mark_current(self) -> None:
        self._opened_at = _toc_fingerprint(self.path)

    def refresh(self) -> "CompatIndex":
        """Re-opened view of the current commit state (reference:
        Index.refresh returns an up-to-date version of the index)."""
        return open_dir(self.path, self.spark)

    # -- writing --------------------------------------------------------

    def writer(self) -> "CompatWriter":
        return CompatWriter(self)

    def delete_by_term(self, fieldname: str, text: str) -> int:
        ix = self._open()
        if ix is None:
            return 0
        n = _delete_by_term(self.spark, ix, fieldname, str(text))
        self._mark_current()
        return n

    # -- reading --------------------------------------------------------

    def _stored_docs(self) -> DataFrame | None:
        docs_dir = os.path.join(self.path, "docs")
        if not os.path.isdir(docs_dir):
            return None
        return self.spark.read.parquet(docs_dir)

    def _open(self):
        docs = self._stored_docs()
        if docs is None:
            return None
        return open_segments(self.spark, self.path, docs, self.schema)

    def searcher(self, weighting=None) -> "CompatSearcher":
        return CompatSearcher(self, weighting)

    def reader(self) -> "CompatReader":
        """reference: Index.reader() -> IndexReader."""
        return CompatReader(self)

    def doc_count(self) -> int:
        """Undeleted docs (reference: doc_count). Counted via live_docs()
        (anti-joined against the delete set AND merge tombstones) rather
        than subtracting the raw delete-set size — delete ids that are not
        live docs (arbitrary ids handed to delete_docs, or ids present in
        both deletes and tombstones during the merge crash window) must
        not make the count too low."""
        ix = self._open()
        if ix is None:
            return 0
        if ix.deleted is None and ix.tombstones is None:
            return ix.doc_count
        return ix.live_docs().count()

    def doc_count_all(self) -> int:
        ix = self._open()
        return 0 if ix is None else ix.doc_count

    def field_length(self, fieldname: str) -> int:
        """Total token count of one field (reference: Index.field_length)."""
        return self.reader().field_length(fieldname)

    def optimize(self) -> None:
        """Merge all segments, expunging deletes (reference: Index.optimize)."""
        from whoosh_spark.indexing.segments import merge_segments

        merge_segments(self.spark, self.path)
        self._mark_current()


class CompatWriter:
    """Buffered writer: add/update calls accumulate client-side, commit()
    ships ONE micro-batch through the distributed build (reference:
    IndexWriter semantics — nothing is visible until commit; BufferedWriter
    is the same idea with periodic auto-commits)."""

    def __init__(self, index: CompatIndex):
        self.index = index
        self._adds: list[dict] = []
        self._add_frames: list[DataFrame] = []
        self._updates: list[dict] = []
        self._deletes: list[tuple[str, str]] = []
        self._committed = False

    def __enter__(self) -> "CompatWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        """``with ix.writer() as w:`` — commit on clean exit, cancel when
        the block raised (reference: writing.py::IndexWriter.__exit__)."""
        if exc_type is not None:
            self.cancel()
        elif not self._committed:
            self.commit()

    def add_document(self, **fields) -> None:
        self._adds.append(fields)

    def add_dataframe(self, df: DataFrame) -> None:
        """Bulk ingest: index a whole DataFrame as this commit's batch —
        the migration path at corpus scale (the reference's analog is
        MpWriter fan-out over add_document; here the frame goes straight
        through the distributed build, no driver round-trip). Columns must
        cover the schema's indexed fields; extras are ignored."""
        missing = [c for c in self.index.schema.names() if c not in df.columns]
        if missing:
            raise ValueError(f"dataframe lacks schema columns: {missing}")
        self._add_frames.append(df.select(*self.index.schema.names()))

    def update_document(self, **fields) -> None:
        """Upsert by the schema's unique fields (reference:
        IndexWriter.update_document ~L520)."""
        if not self.index.schema.unique_fields():
            raise ValueError("update_document needs a unique field in the schema")
        self._updates.append(fields)

    def delete_by_term(self, fieldname: str, text: str) -> None:
        self._deletes.append((fieldname, str(text)))

    def cancel(self) -> None:
        self._adds, self._updates, self._deletes = [], [], []
        self._add_frames = []
        self._committed = True

    def _next_batch_id(self) -> int:
        done = _read_manifest(self.index.path)
        ids = [
            int(m["lineage"]["batch_id"])
            for m in done.values()
            if m.get("lineage", {}).get("source") == "stream-batch"
        ] + [
            int(b)
            for m in done.values()
            for b in m.get("lineage", {}).get("merged_batch_ids", [])
        ]
        return max(ids, default=-1) + 1

    def _frame(self, rows: list[dict]) -> DataFrame:
        cols = self.index.schema.names()
        pdf = pd.DataFrame([{c: r.get(c) for c in cols} for r in rows])
        return self.index.spark.createDataFrame(pdf)

    def commit(self) -> None:
        if self._committed:
            raise ValueError("writer already committed")
        self._committed = True
        for fieldname, text in self._deletes:
            self.index.delete_by_term(fieldname, text)
        batch_id = self._next_batch_id()
        if self._updates:
            upsert_batch(
                self.index._indexer,
                self._frame(self._updates),
                batch_id,
                self.index.schema.unique_fields(),
            )
            batch_id += 1
        adds = self._frame(self._adds) if self._adds else None
        for frame in self._add_frames:
            adds = frame if adds is None else adds.unionByName(frame)
        if adds is not None:
            self.index._indexer.append_batch(adds, batch_id)
        self.index._mark_current()


class CompatSearcher:
    def __init__(self, index: CompatIndex, weighting=None):
        self.index = index
        self._six = index._open()
        self._searcher = (
            None if self._six is None else Searcher(self._six, weighting)
        )
        self._opened_at = _toc_fingerprint(index.path)

    # -- lifecycle (reference: Searcher.close/up_to_date; ``with
    #    ix.searcher() as s:`` is the reference's canonical idiom) --------

    def close(self) -> None:
        """No-op: the searcher's frames are lazy views over the TOC
        snapshot taken at construction (the reference releases its reader
        here)."""

    def __enter__(self) -> "CompatSearcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def up_to_date(self) -> bool:
        """True when nothing committed/deleted since this searcher opened
        (reference: Searcher.up_to_date)."""
        return _toc_fingerprint(self.index.path) == self._opened_at

    def _default_field(self) -> str:
        texts = self.index.schema.text_fields()
        return texts[0].name if texts else self.index.schema.names()[0]

    def search(self, q: "Q.Query | str", limit: int | None = 10,
               terms: bool = False, unlimited: bool = False,
               groupedby: str | None = None, maptype: str = "list",
               **kw) -> Results:
        """Accepts a Query tree or a query STRING (parsed with the default
        QueryParser over the first TEXT field, the reference's common
        idiom). Returns Results of Hits with every stored field attached.
        ``terms=True`` additionally records which query terms matched each
        hit (reference: search(terms=True) -> Hit.matched_terms).

        ``filter=`` / ``mask=`` (Query or doc_id DataFrame) pass straight
        to the engine's FilterCollector analogue (restrict / exclude
        without rescoring). ``groupedby="field"`` attaches facet groups
        over ALL matches — read them with ``Results.groups()``;
        ``maptype`` picks the reference's sorting maptype: ``"list"``
        (OrderedList docnums), ``"count"``, or ``"best"``. Like the
        reference, group contents are driver-side values — at corpus scale
        use the engine's ``group_counts/group_ordered`` DataFrames.

        ``limit=None`` materializes EVERY matching doc as a driver-side
        Hit — on a corpus-scale index a broad query would OOM the driver
        through this facade, so it requires the explicit ``unlimited=True``
        opt-in. For full result sets at scale, use the engine Searcher
        (``whoosh_spark.search.executor.Searcher.search(q, limit=None)``)
        which returns a lazy DataFrame instead."""
        if limit is None and not unlimited:
            raise ValueError(
                "compat search(limit=None) collects the full match set to "
                "the driver; pass unlimited=True to opt in, or use the "
                "engine Searcher's DataFrame API for corpus-scale results"
            )
        if self._searcher is None:
            return Results()
        if isinstance(q, str):
            q = QueryParser(self._default_field(), self.index.schema).parse(q)
        top = self._searcher.search(q, limit=limit, **kw)
        # keep only the join key + score: a sortedby search also returns
        # its key columns, which would collide with the stored-field join
        top = top.select("doc_id", "score")
        stored = self._searcher.with_stored_fields(top, *self.index.schema.names())
        if terms:
            # bounded to the collected hits (within=top), not every match
            stored = stored.join(
                self._searcher.matched_terms(q, within=top)
                .withColumnRenamed("terms", "_mt"),
                "doc_id", "left",
            )
        rows = stored.orderBy(*_order_cols(kw)).collect()
        names = self.index.schema.names()
        qterms = _query_field_terms(q)
        res = Results(
            Hit({c: r[c] for c in names}, float(r["score"]), int(r["doc_id"]),
                qterms,
                list(r["_mt"] or []) if terms else None)
            for r in rows
        )
        if groupedby:
            res._groups = {groupedby: self._facet_groups(
                q, groupedby, maptype, kw.get("filter"), kw.get("mask"))}
        res._searcher = self
        return res

    def _facet_groups(self, q: "Q.Query", groupedby: str, maptype: str,
                      filter=None, mask=None) -> dict:
        s = self._searcher
        if maptype == "count":
            rows = s.group_counts(q, groupedby, filter=filter, mask=mask).collect()
            return {r[groupedby]: int(r["count"]) for r in rows}
        scored = s._apply_filter_mask(s.compile(q), filter, mask)
        if maptype == "best":
            rows = s.group_best(scored, groupedby).collect()
            return {r[groupedby]: int(r["doc_id"]) for r in rows}
        if maptype != "list":
            raise ValueError(f"maptype must be 'list', 'count' or 'best': {maptype!r}")
        rows = s.group_ordered(scored, groupedby).collect()
        return {r[groupedby]: [int(d) for d in r["doc_ids"]] for r in rows}

    def search_page(self, q: "Q.Query | str", pagenum: int,
                    pagelen: int = 10, **kw) -> ResultsPage:
        """Page ``pagenum`` (1-based) of the results (reference:
        Searcher.search_page ~L700): top pagenum*pagelen computed
        distributed, the page sliced driver-side — same shape as the
        reference's offset slicing over the top-n heap."""
        if pagenum < 1:
            raise ValueError("pagenum must be >= 1")
        if isinstance(q, str):
            q = QueryParser(self._default_field(), self.index.schema).parse(q)
        hits = self.search(q, limit=pagenum * pagelen, **kw)
        # total = full match count (reference: len(Results) is the total
        # hit count, which is what is_last_page keys on); the count's plan
        # drops the top-k sort (EliminateSorts under an aggregate)
        total = len(hits)
        if len(hits) == pagenum * pagelen and self._searcher is not None:
            # the count query goes to the engine searcher, which does not
            # know compat-only kwargs like terms=
            engine_kw = {k: v for k, v in kw.items() if k != "terms"}
            total = self._searcher.search(q, limit=None, **engine_kw).count()
        off = (pagenum - 1) * pagelen
        return ResultsPage(hits[off:off + pagelen], pagenum, pagelen, total)

    def corrector(self, fieldname: str,
                  spelling_words: "DataFrame | None" = None) -> "CompatCorrector":
        """reference: Searcher.corrector(field) -> Corrector.suggest(...).

        ``spelling_words``: a (term, total_weight) surface-word frame
        (``search.aux.build_spell_words`` output) — the reference's
        ``spelling=True`` word graph, so a STEMMED field's corrector
        suggests real words instead of stems."""
        return CompatCorrector(self, fieldname, spelling_words)

    def correct_query(self, q: "Q.Query | str", fieldname: str | None = None):
        """Rewrite unknown terms to their best lexicon suggestion
        (reference: Searcher.correct_query ~L800; returns the corrected
        query tree)."""
        from whoosh_spark.search.aux import correct_query as _cq

        if isinstance(q, str):
            q = QueryParser(self._default_field(), self.index.schema).parse(q)
        if self._six is None:
            return q
        return _cq(self._six, q, fieldname or self._default_field())

    def key_terms(self, docnums: list[int], fieldname: str,
                  numterms: int = 5, model: str = "bo1") -> list[tuple[str, float]]:
        """reference: Searcher.key_terms(docnums, fieldname, numterms)."""
        from whoosh_spark.search.aux import key_terms as _kt

        if self._six is None or not docnums:
            return []
        from whoosh_spark.util import inline_rows

        # literal frame, not createDataFrame (~1 s of py4j round-trips);
        # large docnum lists fall back to one serialized batch
        ids = inline_rows(self.index.spark,
                          [(int(d),) for d in docnums], "doc_id long")
        rows = _kt(self._six, ids, fieldname, numterms, model).collect()
        return [(r["term"], float(r["score"])) for r in rows]

    def explain(self, q, docnum: int) -> "list[tuple[str, str, float]]":
        """Per-leaf (field, term, score) contributions for one hit — the
        Lucene-style explain surface restricted to leaf terms
        (engine: Searcher.score_breakdown; beyond-reference). Accepts a
        query string like :meth:`search`; rows sum to the doc's And/Or
        total under the searcher's weighting."""
        if isinstance(q, str):
            q = QueryParser(self._default_field(), self.index.schema).parse(q)
        if self._searcher is None:
            return []
        rows = self._searcher.score_breakdown(q, docnum).collect()
        return [(r["field"], r["term"], float(r["score"])) for r in rows]

    def more_like(self, docnum: int, fieldname: str, limit: int = 10,
                  numterms: int = 5) -> Results:
        """reference: Searcher.more_like(docnum, fieldname) — key terms of
        the doc fed back as an Or query, seed doc excluded."""
        from whoosh_spark.search.aux import more_like_this as _mlt

        if self._searcher is None:
            return Results()
        top = _mlt(self._searcher, int(docnum), fieldname, limit=limit,
                   numterms=numterms)
        stored = self._searcher.with_stored_fields(top, *self.index.schema.names())
        rows = stored.orderBy(*_order_cols({})).collect()
        names = self.index.schema.names()
        res = Results(
            Hit({c: r[c] for c in names}, float(r["score"]), int(r["doc_id"]))
            for r in rows
        )
        res._searcher = self
        return res

    def suggest(self, fieldname: str, text: str, limit: int = 5,
                maxdist: int = 2, prefix: int = 0) -> list[str]:
        """reference: Searcher.suggest — shorthand for
        corrector(fieldname).suggest(text, ...)."""
        return self.corrector(fieldname).suggest(
            text, limit=limit, maxdist=maxdist, prefix=prefix)

    def refresh(self) -> "CompatSearcher":
        return CompatSearcher(self.index, None if self._searcher is None
                              else self._searcher.weighting)

    # -- reader passthroughs (reference: Searcher proxies its reader) --

    def reader(self) -> "CompatReader":
        """reference: Searcher.reader()."""
        return CompatReader(self.index)

    def doc_frequency(self, fieldname: str, text: str) -> int:
        return 0 if self._six is None else self._six.doc_frequency(fieldname, str(text))

    def frequency(self, fieldname: str, text: str) -> float:
        return 0.0 if self._six is None else self._six.frequency(fieldname, str(text))

    def lexicon(self, fieldname: str) -> list[str]:
        return [] if self._six is None else self._six.lexicon(fieldname)

    def idf(self, fieldname: str, text: str) -> float:
        """reference: Searcher.idf — ln(N/(df+1))+1 with N = doc_count_all
        (SURVEY A.5; the same scoring.idf the ranking paths use, so a
        user's printed idf agrees with the scores)."""
        from whoosh_spark.search.scoring import idf as _idf

        if self._six is None:
            return _idf(0, 0)
        return _idf(self._six.doc_count, self.doc_frequency(fieldname, text))

    def doc_count(self) -> int:
        return self.index.doc_count()

    def doc_count_all(self) -> int:
        return self.index.doc_count_all()

    def document_number(self, **kw) -> int | None:
        """reference: Searcher.document_number — first matching docnum."""
        doc = searcher_document(self, _with_docnum=True, **kw)
        return None if doc is None else doc["_docnum"]

    def documents(self, **kw):
        """Yield every stored doc matching the field values (reference:
        Searcher.documents) — streamed via toLocalIterator, filters pushed
        into the stored-docs scan; no full collect."""
        docs = self.index._stored_docs()
        if docs is None:
            return
        for k, v in kw.items():
            docs = docs.where(docs[k] == v)
        names = self.index.schema.names()
        for r in docs.toLocalIterator():
            yield {c: r[c] for c in names if c in r.__fields__}

    def document_numbers(self, **kw):
        """Yield every docnum matching the field values (reference:
        Searcher.document_numbers) — same pushed-down scan as documents(),
        projected to the id column only."""
        docs = self.index._stored_docs()
        if docs is None:
            return
        for k, v in kw.items():
            docs = docs.where(docs[k] == v)
        for r in docs.select("doc_id").toLocalIterator():
            yield int(r["doc_id"])


class TermInfo:
    """Per-term statistics (reference: reading.py::TermInfo). The weight /
    df / id-range numbers come straight off the index's pushed-down
    lexicon row (build-time stats, NOT masked by lazy deletes — the
    reference's TermInfo is likewise static per segment); min/max field
    length probe the term's postings lazily on first call."""

    def __init__(self, reader: "CompatReader", fieldname: str, text: str,
                 row):
        self._reader = reader
        self._fieldname = fieldname
        self._text = text
        self._row = row
        self._lens: tuple[int, int] | None = None

    def weight(self) -> float:
        """Total weight of the term across all docs."""
        return float(self._row["total_weight"])

    def doc_frequency(self) -> int:
        return int(self._row["df"])

    def max_weight(self) -> float:
        """Highest per-doc weight (the block-max WAND bound's source)."""
        return float(self._row["max_weight"])

    def min_id(self) -> int:
        return int(self._row["min_doc"])

    def max_id(self) -> int:
        return int(self._row["max_doc"])

    def _lengths(self) -> tuple[int, int]:
        if self._lens is None:
            from pyspark.sql import functions as F

            row = _first(
                self._reader._ix.term_postings(
                    self._fieldname, self._text, positions=False)
                .agg(F.min("dl").alias("lo"), F.max("dl").alias("hi"))
            )
            lo = 0 if row is None or row["lo"] is None else int(row["lo"])
            hi = 0 if row is None or row["hi"] is None else int(row["hi"])
            self._lens = (lo, hi)
        return self._lens

    def min_length(self) -> int:
        """Shortest field length among docs containing the term
        (quantized, like every dl — SURVEY A.4)."""
        return self._lengths()[0]

    def max_length(self) -> int:
        return self._lengths()[1]

    def __repr__(self):
        return (f"<TermInfo {self._fieldname}:{self._text!r} "
                f"df={self.doc_frequency()} w={self.weight():.1f}>")


class CompatReader:
    """IndexReader facade (reference: reading.py::IndexReader — the
    read-side surface a porting user hits most: lexicon / term stats /
    field lengths / stored fields / term vectors), mapped onto the
    engine's DataFrames.

    Driver-materialization contract matches the reference: methods that
    return Python values bring back only vocabulary-sized (lexicon,
    most_*_terms), expansion-sized (expand_prefix), or single-doc-sized
    (stored_fields, vector, doc_field_length) data; ``all_stored_fields``
    and ``all_doc_ids`` stream via ``toLocalIterator`` (one partition in
    memory at a time, never a full collect). Corpus-scale scans belong on
    the engine's DataFrame API (``InvertedIndex.postings/.terms``)."""

    def __init__(self, index: CompatIndex):
        self.index = index
        self._ix = index._open()

    # -- lifecycle ------------------------------------------------------

    def close(self) -> None:
        """No-op (reference: IndexReader.close releases file handles)."""

    def __enter__(self) -> "CompatReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def generation(self) -> int:
        """reference: IndexReader.generation — the TOC generation this
        reader's snapshot came from."""
        return self.index.latest_generation()

    def indexed_field_names(self) -> list[str]:
        """Names of the fields that carry postings (reference:
        IndexReader.indexed_field_names)."""
        return [fs.name for fs in self.index.schema.indexed_fields()]

    # -- vocabulary -------------------------------------------------------

    def lexicon(self, fieldname: str) -> list[str]:
        """All terms of one field, sorted (reference: IndexReader.lexicon)."""
        return [] if self._ix is None else self._ix.lexicon(fieldname)

    def term_info(self, fieldname: str, text: str) -> TermInfo:
        """Stats of one term (reference: IndexReader.term_info) — ONE
        pushed-down lexicon point lookup; raises ``KeyError`` for an
        unindexed term like the reference's TermNotFound."""
        from pyspark.sql import functions as F

        row = None if self._ix is None else _first(
            self._ix.terms.where(
                (F.col("field") == fieldname) & (F.col("term") == str(text))
            )
        )
        if row is None:
            raise KeyError(f"term not in index: {fieldname}:{text!r}")
        return TermInfo(self, fieldname, str(text), row)

    def first_id(self, fieldname: str, text: str) -> int:
        """Lowest LIVE docnum containing the term (reference:
        IndexReader.first_id goes through the matcher, which skips
        deleted docs). Without deletes this is the lexicon row's min_doc
        — zero posting decode; with deletes, one masked posting probe."""
        from pyspark.sql import functions as F

        if self._ix is None:
            raise KeyError(f"term not in index: {fieldname}:{text!r}")
        if getattr(self._ix, "deleted", None) is None and \
                getattr(self._ix, "tombstones", None) is None:
            return self.term_info(fieldname, text).min_id()
        row = _first(
            self._ix.term_postings(fieldname, str(text), positions=False)
            .agg(F.min("doc_id").alias("lo"))
        )
        if row is None or row["lo"] is None:
            raise KeyError(f"term not in index: {fieldname}:{text!r}")
        return int(row["lo"])

    def postings(self, fieldname: str, text: str):
        """Yield (docnum, weight) docnum-ascending for one term
        (reference: IndexReader.postings returns the leaf matcher; this
        facade streams the rows via toLocalIterator — df-sized, block
        -pruned decode, deletes masked like a matcher)."""
        if self._ix is None:
            raise KeyError(f"term not in index: {fieldname}:{text!r}")
        rows = (
            self._ix.term_postings(fieldname, str(text), positions=False)
            .select("doc_id", "weight").orderBy("doc_id").toLocalIterator()
        )
        for r in rows:
            yield (int(r["doc_id"]), float(r["weight"]))

    def iter_field(self, fieldname: str, prefix: str = ""):
        """Yield (termtext, TermInfo) term-ascending for one field
        (reference: IndexReader.iter_field) — streamed off the sorted
        lexicon; the prefix predicate pushes into the scan."""
        if self._ix is None:
            return
        from pyspark.sql import functions as F

        t = self._ix.terms.where(F.col("field") == fieldname)
        if prefix:
            t = t.where(F.col("term").startswith(prefix))
        for r in t.orderBy("term").toLocalIterator():
            yield (r["term"], TermInfo(self, fieldname, r["term"], r))

    def iter_prefix(self, fieldname: str, prefix: str):
        """reference: IndexReader.iter_prefix."""
        return self.iter_field(fieldname, prefix=prefix)

    def iter_from(self, fieldname: str, text: str):
        """Yield (termtext, TermInfo) from ``text`` onward (reference:
        IndexReader.iter_from) — a >= range predicate on the sorted
        lexicon, row-group pruned."""
        if self._ix is None:
            return
        from pyspark.sql import functions as F

        t = self._ix.terms.where(
            (F.col("field") == fieldname) & (F.col("term") >= str(text)))
        for r in t.orderBy("term").toLocalIterator():
            yield (r["term"], TermInfo(self, fieldname, r["term"], r))

    def __contains__(self, pair) -> bool:
        """``(fieldname, text) in reader`` (reference: IndexReader
        .__contains__) — one pushed-down point lookup, LRU-cached."""
        fieldname, text = pair
        if self._ix is None:
            return False
        return self._ix.doc_frequency(fieldname, str(text)) > 0

    def all_terms(self):
        """Yield (fieldname, text) sorted (reference: IndexReader
        .all_terms). Whole-index vocabulary — streamed, not collected."""
        if self._ix is None:
            return
        it = (self._ix.terms.select("field", "term")
              .orderBy("field", "term").toLocalIterator())
        for r in it:
            yield (r["field"], r["term"])

    def expand_prefix(self, fieldname: str, prefix: str) -> list[str]:
        """Terms starting with ``prefix`` (reference: IndexReader
        .expand_prefix) — the predicate pushes into the sorted terms
        parquet; only the expansion rows reach the driver."""
        if self._ix is None:
            return []
        pdf = self._ix.expand_terms(fieldname, like=str(prefix))
        return list(pdf["term"])

    # -- stats --------------------------------------------------------------

    def doc_count(self) -> int:
        return self.index.doc_count()

    def doc_count_all(self) -> int:
        return self.index.doc_count_all()

    def doc_frequency(self, fieldname: str, text: str) -> int:
        return 0 if self._ix is None else self._ix.doc_frequency(fieldname, str(text))

    def frequency(self, fieldname: str, text: str) -> float:
        return 0.0 if self._ix is None else self._ix.frequency(fieldname, str(text))

    def field_length(self, fieldname: str) -> int:
        """Total token count of one field (reference: IndexReader
        .field_length — exact, unlike the quantized per-doc lengths)."""
        if self._ix is None:
            return 0
        return int(round(self._ix.field_totals.get(fieldname, 0.0)))

    def _dl_agg(self, fieldname: str, agg):
        if self._ix is None:
            return 0
        from pyspark.sql import functions as F

        row = _first(
            self._ix.postings.where(F.col("field") == fieldname)
            .agg(agg(F.col("dl")).alias("v"))
        )
        return 0 if row is None or row["v"] is None else int(row["v"])

    def min_field_length(self, fieldname: str) -> int:
        """Quantized, like the reference (lengths roundtrip through
        length_to_byte/byte_to_length — SURVEY A.4)."""
        from pyspark.sql import functions as F

        return self._dl_agg(fieldname, F.min)

    def max_field_length(self, fieldname: str) -> int:
        from pyspark.sql import functions as F

        return self._dl_agg(fieldname, F.max)

    def doc_field_length(self, docnum: int, fieldname: str, default: int = 0) -> int:
        """Per-doc quantized field length (reference: IndexReader
        .doc_field_length) — doc-filtered posting probe, one row back."""
        if self._ix is None:
            return default
        from pyspark.sql import functions as F

        row = _first(
            self._ix.postings.where(
                (F.col("field") == fieldname) & (F.col("doc_id") == int(docnum))
            ).select("dl")
        )
        return default if row is None else int(row["dl"])

    def most_frequent_terms(self, fieldname: str, number: int = 5,
                            prefix: str = "") -> list[tuple[float, str]]:
        """(weight, text) by total weight desc (reference: IndexReader
        .most_frequent_terms' nlargest) — delegates to the engine's lazy
        DataFrame top-k (InvertedIndex.most_frequent_terms), only
        ``number`` rows back."""
        if self._ix is None:
            return []
        rows = self._ix.most_frequent_terms(
            fieldname, int(number), prefix).collect()
        return [(float(r["freq"]), r["term"]) for r in rows]

    def most_distinctive_terms(self, fieldname: str, number: int = 5,
                               prefix: str = "") -> list[tuple[float, str]]:
        """(score, text) with score = weight * ln(N/df) (reference:
        IndexReader.most_distinctive_terms' tf-idf) — delegates to
        InvertedIndex.most_distinctive_terms; oracle-checked via the
        registry's most_distinctive_terms entry."""
        if self._ix is None:
            return []
        rows = self._ix.most_distinctive_terms(
            fieldname, int(number), prefix).collect()
        return [(float(r["score"]), r["term"]) for r in rows]

    # -- documents ------------------------------------------------------

    def stored_fields(self, docnum: int) -> dict | None:
        """Stored fields of one doc (reference: IndexReader.stored_fields)."""
        docs = self.index._stored_docs()
        if docs is None:
            return None
        row = _first(docs.where(docs["doc_id"] == int(docnum)))
        if row is None:
            return None
        names = self.index.schema.names()
        return {c: row[c] for c in names if c in row.__fields__}

    def all_stored_fields(self):
        """Yield every live doc's stored fields (reference: IndexReader
        .all_stored_fields) — streamed partition-by-partition."""
        if self._ix is None:
            return
        names = self.index.schema.names()
        for r in self._ix.live_docs().toLocalIterator():
            yield {c: r[c] for c in names if c in r.__fields__}

    def all_doc_ids(self):
        """Yield live doc ids (reference: IndexReader.all_doc_ids)."""
        if self._ix is None:
            return
        for r in self._ix.live_docs().select("doc_id").toLocalIterator():
            yield int(r["doc_id"])

    def vector(self, docnum: int, fieldname: str) -> list[tuple[str, float]]:
        """Term vector as (term, weight), term-sorted (reference:
        IndexReader.vector's matcher, driver-side) — doc-filtered posting
        probe, vector-sized result."""
        if self._ix is None:
            return []
        rows = self._ix.vector(int(docnum), fieldname).collect()
        return [(r["term"], float(r["weight"])) for r in rows]

    def has_vector(self, docnum: int, fieldname: str) -> bool:
        """True when vector() would return terms for this doc (reference:
        IndexReader.has_vector checks the field's vector format; here
        every indexed field reconstructs vectors from postings, so this
        is a one-row doc-filtered probe)."""
        if self._ix is None or fieldname not in {
                fs.name for fs in self.index.schema.indexed_fields()}:
            return False
        return _first(self._ix.vector(int(docnum), fieldname)) is not None

    # -- deletions (reference: IndexReader.is_deleted/has_deletions —
    #    lazy doc-id sets filtered at read time, SegmentReader ~L300) ----

    def has_deletions(self) -> bool:
        """True when any doc was deleted and not yet expunged by a merge
        (reference: IndexReader.has_deletions)."""
        return self.deleted_count() > 0

    def deleted_count(self) -> int:
        return self.index.doc_count_all() - self.index.doc_count()

    def is_deleted(self, docnum: int) -> bool:
        """Point probe of the (broadcast-sized) delete/tombstone id sets
        (reference: IndexReader.is_deleted)."""
        if self._ix is None:
            return False
        from pyspark.sql import functions as F

        for idset in (getattr(self._ix, "deleted", None),
                      getattr(self._ix, "tombstones", None)):
            if idset is not None and _first(
                    idset.where(F.col("doc_id") == int(docnum))) is not None:
                return True
        return False


class CompatCorrector:
    """reference: spelling.py::ReaderCorrector (suggest from the lexicon,
    ranked distance asc then frequency desc); with ``words`` it is the
    GraphCorrector analogue — suggestions from the spelling=True
    surface-word graph instead of the (possibly stemmed) lexicon."""

    def __init__(self, searcher: CompatSearcher, fieldname: str,
                 words: "DataFrame | None" = None):
        self.searcher = searcher
        self.fieldname = fieldname
        self.words = words

    def suggest(self, word: str, limit: int = 5, maxdist: int = 2,
                prefix: int = 0) -> list[str]:
        from whoosh_spark.search.aux import suggest as _suggest

        six = self.searcher._six
        if six is None:
            return []
        rows = _suggest(six, self.fieldname, word, limit=limit,
                        maxdist=maxdist, prefix=prefix,
                        words=self.words).collect()
        return [r["term"] for r in rows]


def _order_cols(search_kw: dict):
    """Ordering for the collected result rows: the stored-fields join does
    not preserve the engine's sort, so re-apply it — sortedby key columns
    (string names; they exist on the joined frame since every stored field
    is attached) or the default (score desc, doc_id asc) heap key."""
    from pyspark.sql import functions as F

    sortedby = search_kw.get("sortedby")
    if sortedby is not None:
        keys = [sortedby] if isinstance(sortedby, str) else list(sortedby)
        if not all(isinstance(k, str) for k in keys):
            raise TypeError("compat search(sortedby=...) takes column name strings")
        rev = search_kw.get("reverse", False)
        return [F.desc(k) if rev else F.asc(k) for k in keys] + [F.asc("doc_id")]
    return [F.desc("score"), F.asc("doc_id")]


def _first(df: DataFrame):
    rows = df.limit(1).collect()
    return rows[0] if rows else None


def searcher_document(searcher: "CompatSearcher", _with_docnum: bool = False,
                      **kw) -> dict | None:
    """Fetch one stored document by field values (reference:
    searching.py::Searcher.document ~L450). Filters push into the stored
    docs scan."""
    ix = searcher.index
    docs = ix._stored_docs()
    if docs is None:
        return None
    for k, v in kw.items():
        docs = docs.where(docs[k] == v)
    row = _first(docs)
    if row is None:
        return None
    out = {c: row[c] for c in ix.schema.names() if c in row.__fields__}
    if _with_docnum:
        out["_docnum"] = int(row["doc_id"])
    return out


CompatSearcher.document = searcher_document
