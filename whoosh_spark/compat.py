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


class Hit:
    """One result row: stored fields + score (reference: searching.py::Hit)."""

    __slots__ = ("fields", "score", "docnum", "_qterms", "matched_terms")

    def __init__(self, fields: dict, score: float, docnum: int,
                 qterms: dict[str, set] | None = None,
                 matched_terms: list[str] | None = None):
        self.fields = fields
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
    surface: iteration, indexing, len, scored_length, groups)."""

    _groups: dict | None = None

    def scored_length(self) -> int:
        return len(self)

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


class CompatIndex:
    def __init__(self, spark: SparkSession, path: str, schema: Schema):
        self.spark = spark
        self.path = path
        self.schema = schema
        self._indexer = IncrementalIndexer(spark, path, schema)

    # -- writing --------------------------------------------------------

    def writer(self) -> "CompatWriter":
        return CompatWriter(self)

    def delete_by_term(self, fieldname: str, text: str) -> int:
        ix = self._open()
        if ix is None:
            return 0
        return _delete_by_term(self.spark, ix, fieldname, str(text))

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

    def optimize(self) -> None:
        """Merge all segments, expunging deletes (reference: Index.optimize)."""
        from whoosh_spark.indexing.segments import merge_segments

        merge_segments(self.spark, self.path)


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


class CompatSearcher:
    def __init__(self, index: CompatIndex, weighting=None):
        self.index = index
        self._six = index._open()
        self._searcher = (
            None if self._six is None else Searcher(self._six, weighting)
        )

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

    def corrector(self, fieldname: str) -> "CompatCorrector":
        """reference: Searcher.corrector(field) -> Corrector.suggest(...)"""
        return CompatCorrector(self, fieldname)

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
        return Results(
            Hit({c: r[c] for c in names}, float(r["score"]), int(r["doc_id"]))
            for r in rows
        )

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

    # -- vocabulary -------------------------------------------------------

    def lexicon(self, fieldname: str) -> list[str]:
        """All terms of one field, sorted (reference: IndexReader.lexicon)."""
        return [] if self._ix is None else self._ix.lexicon(fieldname)

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


class CompatCorrector:
    """reference: spelling.py::ReaderCorrector (suggest from the lexicon,
    ranked distance asc then frequency desc)."""

    def __init__(self, searcher: CompatSearcher, fieldname: str):
        self.searcher = searcher
        self.fieldname = fieldname

    def suggest(self, word: str, limit: int = 5, maxdist: int = 2,
                prefix: int = 0) -> list[str]:
        from whoosh_spark.search.aux import suggest as _suggest

        six = self.searcher._six
        if six is None:
            return []
        rows = _suggest(six, self.fieldname, word, limit=limit,
                        maxdist=maxdist, prefix=prefix).collect()
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
