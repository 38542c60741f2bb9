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

    __slots__ = ("fields", "score", "docnum")

    def __init__(self, fields: dict, score: float, docnum: int):
        self.fields = fields
        self.score = score
        self.docnum = docnum

    def __getitem__(self, name):
        return self.fields[name]

    def get(self, name, default=None):
        return self.fields.get(name, default)

    def __repr__(self):
        return f"<Hit doc={self.docnum} score={self.score:.4f} {self.fields!r}>"


class Results(list):
    """List of Hits (reference: searching.py::Results — the commonly-used
    surface: iteration, indexing, len, scored_length)."""

    def scored_length(self) -> int:
        return len(self)


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

    def doc_count(self) -> int:
        """Undeleted docs (reference: doc_count)."""
        ix = self._open()
        if ix is None:
            return 0
        n = ix.doc_count
        if ix.deleted is not None:
            n -= ix.deleted.count()
        return n

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
        self._updates: list[dict] = []
        self._deletes: list[tuple[str, str]] = []
        self._committed = False

    def add_document(self, **fields) -> None:
        self._adds.append(fields)

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
        if self._adds:
            self.index._indexer.append_batch(self._frame(self._adds), batch_id)


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
               **kw) -> Results:
        """Accepts a Query tree or a query STRING (parsed with the default
        QueryParser over the first TEXT field, the reference's common
        idiom). Returns Results of Hits with every stored field attached."""
        if self._searcher is None:
            return Results()
        if isinstance(q, str):
            q = QueryParser(self._default_field(), self.index.schema).parse(q)
        top = self._searcher.search(q, limit=limit, **kw)
        stored = self._searcher.with_stored_fields(top, *self.index.schema.names())
        rows = stored.orderBy(*_order_cols(top)).collect()
        names = self.index.schema.names()
        return Results(
            Hit({c: r[c] for c in names}, float(r["score"]), int(r["doc_id"]))
            for r in rows
        )

    def refresh(self) -> "CompatSearcher":
        return CompatSearcher(self.index, None if self._searcher is None
                              else self._searcher.weighting)


def _order_cols(top: DataFrame):
    from pyspark.sql import functions as F

    return [F.desc("score"), F.asc("doc_id")]


def _first(df: DataFrame):
    rows = df.limit(1).collect()
    return rows[0] if rows else None


def searcher_document(searcher: "CompatSearcher", **kw) -> dict | None:
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
    return {c: row[c] for c in ix.schema.names() if c in row.__fields__}


CompatSearcher.document = searcher_document
