"""Index build: docs DataFrame -> postings / doclens / terms / stats.

Spark-first re-expression of the reference write path
(src/whoosh/writing.py::SegmentWriter.add_document ~L600 ->
externalsort.py::SortingPool -> codec/whoosh3.py::W3FieldWriter):

- The analyzer chain runs as a **vectorized pandas stage inside
  ``mapInPandas``** and emits postings *already aggregated per (doc, term)*
  — i.e. map-side combine happens in the Arrow batch, so the exploded
  token stream never hits a (doc_id, term) shuffle. The only wide stage in
  a build is the groupBy(field, term) for the term-stats table (and an
  optional term-bucket repartition when persisting the physical index).
- Doc lengths are **denormalized into each posting row** (``dl`` = the
  byte-quantized-then-decoded token count the reference scorer uses, see
  util.length_to_byte). Whoosh looks lengths up per doc at score time; at
  100 TB a postings-doclens join on doc_id would be a second giant shuffle,
  so we pay one small int per posting instead and never join.
- Exact per-field length totals (for avgdl) fall out of
  ``sum(weight)`` — total tokens == total term frequency.

Scale notes: the per-(field,term) stats aggregation benefits from Spark's
partial aggregation; zipfian hot terms skew the *stats* reducer only (a few
longs per term), not the postings themselves, which stay doc-partitioned
until the physical layout stage (see indexing/segments.py for the salted
term shuffle + hot-term block splitting).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whoosh_spark.analysis import postings_frame
from whoosh_spark.fields import FieldSpec, Schema
from whoosh_spark.util import quantized_length_np

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
        T.StructField("dl", T.LongType(), True),  # quantized length; null for unscorable fields
    ]
)


def _text_postings_generator(field_spec: FieldSpec, doc_id_col: str):
    """Build the mapInPandas function for one TEXT field.

    Emits per-(doc, term) rows with tf weights, renumbered positions and the
    quantized doc length — all computed vectorized in the Arrow batch.
    """
    name = field_spec.name
    spec = field_spec.analyzer
    boost = float(field_spec.field_boost)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pf = postings_frame(pdf[name], spec)
            if len(pf) == 0:
                continue
            doc_ids = pdf[doc_id_col].to_numpy()
            # raw per-row length = sum of tf per row; vectorized via groupby
            raw_len = pf.groupby("row")["weight"].transform("sum").to_numpy()
            dl = quantized_length_np(raw_len.astype(np.int64))
            yield pd.DataFrame(
                {
                    "field": name,
                    "term": pf["term"],
                    "doc_id": doc_ids[pf["row"].to_numpy()],
                    "weight": pf["weight"] * boost,
                    "positions": pf["positions"],
                    "dl": dl,
                }
            )

    return gen


@dataclass
class InvertedIndex:
    """Logical index handle: the reference's Index+IndexReader surface
    (src/whoosh/index.py::FileIndex, reading.py::IndexReader) as DataFrames."""

    spark: SparkSession
    schema: Schema
    docs: DataFrame  # the stored-fields table (D9): join back by doc_id
    postings: DataFrame  # (field, term, doc_id, weight, positions, dl)
    terms: DataFrame  # (field, term, df, total_weight, max_weight, min_doc, max_doc)
    doc_count: int  # doc_count_all — BM25F idf uses ALL docs (SURVEY A.5)
    field_totals: dict[str, float]  # exact token totals per field (for avgdl)
    doc_id_col: str = "doc_id"
    _lexicon_cache: pd.DataFrame | None = dc_field(default=None, repr=False)

    # -- reader/stats API (reference: src/whoosh/reading.py::IndexReader) --

    def avg_field_length(self, field_name: str) -> float:
        """avgdl = exact field_length_total / doc_count_all
        (reference: searching.py::Searcher.avg_field_length ~L280)."""
        if self.doc_count == 0:
            return 0.0
        return self.field_totals.get(field_name, 0.0) / self.doc_count

    def _lexicon(self) -> pd.DataFrame:
        """Driver-side lexicon stats cache. The lexicon is tiny relative to
        postings (distinct terms, a few columns); the reference memoizes idf
        per (field, term) the same way (searching.py::Searcher.idf ~L300).
        For truly huge lexicons, use term_stats() which point-filters."""
        if self._lexicon_cache is None:
            self._lexicon_cache = self.terms.toPandas().set_index(["field", "term"])
        return self._lexicon_cache

    def doc_frequency(self, field_name: str, term: str) -> int:
        lex = self._lexicon()
        try:
            return int(lex.loc[(field_name, term), "df"])
        except KeyError:
            return 0

    def frequency(self, field_name: str, term: str) -> float:
        lex = self._lexicon()
        try:
            return float(lex.loc[(field_name, term), "total_weight"])
        except KeyError:
            return 0.0

    def lexicon(self, field_name: str) -> list[str]:
        lex = self._lexicon()
        if field_name not in lex.index.get_level_values(0):
            return []
        return sorted(lex.loc[field_name].index.tolist())

    def expand_terms(self, field_name: str, like=None, rlike=None, between=None,
                     fuzzy=None) -> pd.DataFrame:
        """Lexicon expansion for Prefix/Wildcard/TermRange/Fuzzy queries
        (reference: query/terms.py::MultiTerm._btexts ~L150). Returns a
        pandas frame (term, df) — the lexicon is small, scanning it is cheap
        relative to postings (SURVEY §4.1 'MultiTerm expansion')."""
        lex = self._lexicon().reset_index()
        lex = lex[lex["field"] == field_name]
        t = lex["term"]
        if like is not None:  # SQL LIKE 'p%' == prefix
            lex = lex[t.str.startswith(like)]
        if rlike is not None:
            lex = lex[t.str.fullmatch(rlike).fillna(False)]
        if between is not None:
            lo, hi, lo_excl, hi_excl = between
            if lo is not None:
                lex = lex[t > lo if lo_excl else t >= lo]
            if hi is not None:
                t2 = lex["term"]
                lex = lex[t2 < hi if hi_excl else t2 <= hi]
        if fuzzy is not None:
            word, maxdist, prefixlength = fuzzy
            t2 = lex["term"]
            if prefixlength:
                lex = lex[t2.str.startswith(word[:prefixlength])]
            from whoosh_spark.util import levenshtein_np

            lex = lex[levenshtein_np(lex["term"].to_numpy(), word) <= maxdist]
        return lex[["term", "df"]]

    def persist(self) -> "InvertedIndex":
        self.postings = self.postings.persist()
        self.terms = self.terms.persist()
        return self


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    schema: Schema,
    doc_id_col: str = "doc_id",
) -> InvertedIndex:
    """Build the logical inverted index from a docs DataFrame.

    ``docs`` must already carry a dense ``doc_id`` (use
    indexing.docids.assign_doc_ids for the transcript parity ordering).
    """
    parts: list[DataFrame] = []
    for fs in schema.text_fields():
        src = docs.select(doc_id_col, fs.name)
        parts.append(src.mapInPandas(_text_postings_generator(fs, doc_id_col), POSTINGS_SCHEMA))
    for fs in schema.indexed_fields():
        if fs.kind == "text":
            continue
        col = F.col(fs.name).cast("string")
        if fs.kind == "keyword":
            # space-separated terms, weight 1 each occurrence
            src = docs.select(
                F.lit(fs.name).alias("field"),
                F.explode(F.split(col, r"\s+")).alias("term"),
                F.col(doc_id_col).alias("doc_id"),
            ).where(F.col("term") != "")
            part = (
                src.groupBy("field", "term", "doc_id")
                .agg(F.count("*").cast("double").alias("weight"))
                .withColumn("positions", F.lit(None).cast(T.ArrayType(T.IntegerType())))
                .withColumn("dl", F.lit(None).cast("long"))
            )
        else:  # id / boolean: whole value = one term (IDTokenizer)
            part = docs.where(col.isNotNull() & (col != "")).select(
                F.lit(fs.name).alias("field"),
                col.alias("term"),
                F.col(doc_id_col).alias("doc_id"),
                F.lit(1.0).alias("weight"),
                F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("positions"),
                F.lit(None).cast("long").alias("dl"),
            )
        parts.append(part)

    postings = parts[0]
    for p in parts[1:]:
        postings = postings.unionByName(p)

    terms = postings.groupBy("field", "term").agg(
        F.count("*").alias("df"),
        F.sum("weight").alias("total_weight"),
        F.max("weight").alias("max_weight"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )

    doc_count = docs.count()
    totals_rows = (
        postings.where(F.col("field").isin([fs.name for fs in schema.text_fields()]))
        .groupBy("field")
        .agg(F.sum("weight").alias("total_len"))
        .collect()
    )
    field_totals = {r["field"]: float(r["total_len"]) for r in totals_rows}

    return InvertedIndex(
        spark=spark,
        schema=schema,
        docs=docs,
        postings=postings,
        terms=terms,
        doc_count=doc_count,
        field_totals=field_totals,
        doc_id_col=doc_id_col,
    )
