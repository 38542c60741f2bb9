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

import threading
from dataclasses import dataclass, field as dc_field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whoosh_spark.analysis import postings_arrays
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


def _postings_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("field", pa.string(), False),
            pa.field("term", pa.string(), False),
            pa.field("doc_id", pa.int64(), False),
            pa.field("weight", pa.float64(), False),
            pa.field("positions", pa.list_(pa.int32()), True),
            pa.field("dl", pa.int64(), True),
        ]
    )


def _postings_record_batch(texts, doc_ids, spec, name, boost, arrow_schema):
    """Analyze one batch slice and emit its postings RecordBatch (None if
    it produced no postings) — the ONE body shared by the single-spec and
    the language-routed generators, so the two build paths cannot drift.

    Emits per-(doc, term) rows with tf weights, renumbered positions and
    the quantized doc length. Everything stays in numpy/Arrow — the
    positions list column is built zero-copy from (values, offsets), so
    no per-token Python object ever exists on the hot path (north rule:
    vectorized pandas/Arrow UDFs only).
    """
    import pyarrow as pa

    arrs = postings_arrays(texts, spec)
    if len(arrs) == 0:
        return None
    # raw per-row token count -> quantized dl, broadcast to groups
    # (token_counts, not weight: field length is boost-independent)
    raw_len = np.zeros(len(texts), dtype=np.int64)
    np.add.at(raw_len, arrs.row, arrs.token_counts())
    dl = quantized_length_np(raw_len)[arrs.row]
    n = len(arrs)
    return pa.RecordBatch.from_arrays(
        [
            pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(n, dtype=np.int32)), pa.array([name])
            ).cast(pa.string()),
            pa.array(arrs.term, type=pa.string()),
            pa.array(doc_ids[arrs.row], type=pa.int64()),
            pa.array(arrs.weight * boost if boost != 1.0 else arrs.weight),
            pa.ListArray.from_arrays(
                pa.array(arrs.offsets, type=pa.int32()),
                pa.array(arrs.positions_flat, type=pa.int32()),
            ),
            pa.array(dl, type=pa.int64()),
        ],
        schema=arrow_schema,
    )


def _text_postings_generator(field_spec: FieldSpec, doc_id_col: str):
    """Build the mapInArrow function for one TEXT field (see
    :func:`_postings_record_batch` for the emit contract)."""
    import pyarrow as pa

    name = field_spec.name
    spec = field_spec.analyzer
    boost = float(field_spec.field_boost)
    arrow_schema = _postings_arrow_schema()

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column(batch.schema.get_field_index(name)).to_pandas()
            doc_ids = batch.column(batch.schema.get_field_index(doc_id_col)).to_numpy(
                zero_copy_only=False
            )
            rb = _postings_record_batch(texts, doc_ids, spec, name, boost,
                                        arrow_schema)
            if rb is not None:
                yield rb

    return gen


def _text_postings_generator_multilang(field_spec: FieldSpec, doc_id_col: str):
    """mapInArrow function for a MULTILANG_TEXT field: per-row analyzer
    routing on the field's language column (fields.py::MULTILANG_TEXT).

    Rows are grouped by language value INSIDE each Arrow batch and each
    group runs the same vectorized kernel with its language's spec — one
    sub-batch per (batch, language), no per-language scan, no shuffle
    beyond the plain TEXT build's. Unknown / NULL / unbundled languages
    fall back to the field's default spec (never a mid-build raise: a
    web-scale corpus always carries codes you did not plan for). Spec
    resolution is memoized per worker; each language's stemmer keeps its
    own LRU via analysis._stemmer_for.
    """
    import pyarrow as pa

    name = field_spec.name
    lang_col = field_spec.lang_col
    default_spec = field_spec.analyzer
    boost = float(field_spec.field_boost)
    explicit = (dict(field_spec.lang_specs)
                if field_spec.lang_specs is not None else None)
    arrow_schema = _postings_arrow_schema()
    memo: dict = {}

    def _spec_for(lang: str):
        sp = memo.get(lang)
        if sp is None:
            if explicit is not None:
                sp = explicit.get(lang, default_spec)
            else:
                from whoosh_spark.analysis import LANGUAGE

                try:
                    sp = LANGUAGE(lang) if lang else default_spec
                except NotImplementedError:
                    sp = default_spec
            memo[lang] = sp
        return sp

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column(batch.schema.get_field_index(name)).to_pandas()
            doc_ids = batch.column(batch.schema.get_field_index(doc_id_col)).to_numpy(
                zero_copy_only=False
            )
            langs = (
                batch.column(batch.schema.get_field_index(lang_col))
                .to_pandas().fillna("").astype(str)
            )
            for lv in sorted(langs.unique()):
                mask = (langs == lv).to_numpy()
                rb = _postings_record_batch(
                    texts[mask].reset_index(drop=True), doc_ids[mask],
                    _spec_for(lv), name, boost, arrow_schema,
                )
                if rb is not None:
                    yield rb

    return gen


def _jvm_analyzer_eligible(spec) -> bool:
    """True when the analyzer chain is the plain tokenize → lowercase →
    stop/minsize → renumber shape with every advanced stage off — the
    shape the JVM fast path reproduces exactly (for ASCII text)."""
    from whoosh_spark.analysis import AnalyzerSpec

    plain = AnalyzerSpec(
        pattern=spec.pattern, lowercase=spec.lowercase,
        stoplist=spec.stoplist, minsize=spec.minsize, maxsize=spec.maxsize,
    )
    return spec == plain and spec.lowercase


def _text_postings_jvm(field_spec: FieldSpec, doc_id_col: str, docs: DataFrame) -> DataFrame:
    """Pure-JVM postings for a plain-chain TEXT field
    (``build_index(analyzer_engine="jvm")``).

    Same output contract as :func:`_text_postings_generator` and pinned
    EXACTLY equal to it on ASCII corpora (tests/test_jvm_analyzer.py):
    per-(doc, term) rows, renumbered positions, byte-quantized dl
    (``F.bround`` = numpy rint's HALF_EVEN; equality exhaustive over the
    full 0..68000 length domain).

    Shape: tokenize/filter in whole-stage codegen, posexplode, then ONE
    (doc_id, term) hash aggregate (count + sort_array(collect_list(pos))
    — ObjectHashAggregate combines map-side, so the exchange carries
    posting rows, not raw tokens). Measured A/B at 2M turns local[32],
    warm: the tokenize+combine stage alone runs 2.1 s vs 4.5 s Arrow,
    but END-TO-END build incl. the shared terms-stats aggregate lands at
    PARITY (4.2–4.8 s vs 4.5–4.6 s — within host variance; BENCH.md).
    Two candidate JVM shapes were measured and the all-HOF zero-shuffle
    variant LOST by 4× (20 s: per-element lambda evaluation beats
    codegen out of the plan), so this one ships. What the engine buys is
    therefore not single-box speed: (a) executors need NO Python
    workers (a pyspark-less serving/ingest tier can build), and (b) a
    fully independent reimplementation of the analyzer that is pinned
    BIT-EXACT against the Python chain — a standing cross-validation of
    the tokenizer/stoplist/renumber/quantize semantics. Trade-off: the
    Arrow build has NO wide stage at all, while this path shuffles the
    postings once — on a network-bound cluster that exchange is the
    bottleneck the default avoids, so Arrow stays the default.

    ASCII caveat (the other reason it's opt-in): JVM ``lower()`` and
    Java regex ``\\w`` differ from Python ``str.lower()``/``re`` on
    unicode edges (dotted İ, ß, non-Latin word chars). The default
    engine keeps the Python chain per SURVEY's unicode-parity note.
    """
    import math as _math

    from whoosh_spark.util import BYTE_TO_LENGTH

    name = field_spec.name
    spec = field_spec.analyzer
    boost = float(field_spec.field_boost)
    ln_base = _math.log(1.0325)

    toks = F.regexp_extract_all(F.lower(F.col(name)), F.lit(spec.pattern), 0)
    stop = sorted(spec.stoplist) if spec.stoplist else []

    def _keep(t):
        cond = F.length(t) >= F.lit(int(spec.minsize))
        if spec.maxsize is not None:
            cond = cond & (F.length(t) <= F.lit(int(spec.maxsize)))
        if stop:
            cond = cond & ~t.isin(*stop)
        return cond

    kept = F.filter(toks, _keep)
    raw_len = F.size(kept)
    # length_to_byte: bround(ln(len/8+1)/ln(1.0325)) clamped [0, 255],
    # 0 for empty, 255 from 68000 — then decode through the exact table
    byte = F.when(raw_len <= 0, F.lit(0)).when(
        raw_len >= 68000, F.lit(255)
    ).otherwise(
        F.least(
            F.lit(255),
            F.bround(
                F.log(raw_len.cast("double") / F.lit(8.0) + F.lit(1.0))
                / F.lit(ln_base)
            ).cast("int"),
        )
    )
    dl = F.element_at(
        F.array(*[F.lit(int(v)) for v in BYTE_TO_LENGTH]), byte + 1
    ).cast("long")

    ex = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        dl.alias("_dl"),
        F.posexplode(kept).alias("_p", "_term"),
    )
    weight = F.count("*").cast("double")
    if boost != 1.0:
        weight = weight * F.lit(boost)
    return (
        ex.groupBy("doc_id", "_term")
        .agg(
            weight.alias("weight"),
            F.sort_array(F.collect_list("_p")).alias("positions"),
            F.first("_dl").alias("dl"),
        )
        .select(
            F.lit(name).alias("field"),
            F.col("_term").alias("term"),
            "doc_id",
            "weight",
            "positions",
            "dl",
        )
    )


@dataclass
class InvertedIndex:
    """Logical index handle: the reference's Index+IndexReader surface
    (src/whoosh/index.py::FileIndex, reading.py::IndexReader) as DataFrames."""

    spark: SparkSession
    schema: Schema
    docs: DataFrame  # the stored-fields table (D9): join back by doc_id
    postings: DataFrame  # (field, term, doc_id, weight, positions, dl)
    terms: DataFrame  # (field, term, df, total_weight, max_weight, min_doc, max_doc)
    doc_id_col: str = "doc_id"
    _doc_count: int | None = dc_field(default=None, repr=False)
    _field_totals: dict[str, float] | None = dc_field(default=None, repr=False)
    _lexicon_cache: dict | None = dc_field(default=None, repr=False)  # (field, term) -> (df, cf) LRU
    # Lazy-stat initialization guard: concurrent kernel submits (the TA
    # route's per-child pool, build_segments' concurrent actions) may hit a
    # cold handle from several threads at once — each lazy stat publishes
    # atomically AFTER its job completes, never a partially-built value.
    _stats_lock: "threading.Lock" = dc_field(
        default_factory=lambda: threading.Lock(), repr=False)

    # -- reader/stats API (reference: src/whoosh/reading.py::IndexReader) --

    @property
    def doc_count(self) -> int:
        """doc_count_all — BM25F idf uses ALL docs (SURVEY A.5). Lazy: one
        count of the docs table, memoized for the life of the index handle."""
        if self._doc_count is None:
            with self._stats_lock:
                if self._doc_count is None:
                    self._doc_count = self.docs.count()
        return self._doc_count

    @property
    def field_totals(self) -> dict[str, float]:
        """Exact per-field token totals (for avgdl): sum(weight) over the
        materialized postings — total tf == total tokens. One tiny job.

        Posting weights carry field_boost (Whoosh: weight = tf * boost), but
        field_length_total is a RAW token count in the reference, and per-doc
        dl is stored unboosted — so divide the boost back out to keep
        dl/avgdl in the same unit for BM25 length normalization.

        Published ATOMICALLY after the job completes (build local, assign
        once, double-checked under ``_stats_lock``): a second thread — the
        TA route's concurrent child kernels were the real-world caller —
        must never observe a half-built dict, which would read as
        avgdl == 0.0 and silently zero every BM25 score on that thread
        (the round-4 sf1 regression caught exactly this)."""
        if self._field_totals is None:
            with self._stats_lock:
                if self._field_totals is None:
                    totals: dict[str, float] = {}
                    plain = [fs.name for fs in self.schema.text_fields()
                             if fs.analyzer.delimited_boost is None]
                    if plain:
                        rows = (
                            self.postings.where(F.col("field").isin(plain))
                            .groupBy("field")
                            .agg(F.sum("weight").alias("total_len"))
                            .collect()
                        )
                        for r in rows:
                            boost = float(self.schema[r["field"]].field_boost)
                            totals[r["field"]] = float(r["total_len"]) / (boost or 1.0)
                    for fs in self.schema.text_fields():
                        # DelimitedAttributeFilter is the one stage whose
                        # per-token boosts make sum(weight) != token count
                        # (every other stage emits boost 1.0 or resets) —
                        # recount exactly from the stored docs, as the
                        # reference's field_length_total is a raw token
                        # count accumulated at write
                        if fs.analyzer.delimited_boost is not None:
                            totals[fs.name] = self._exact_token_total(fs)
                    self._field_totals = totals
        return self._field_totals

    def _exact_token_total(self, fs) -> float:
        """Exact raw token count of one text field, recomputed from the
        stored docs via the same analyzer chain the build ran. Tombstoned
        docs (expunged by a merge) are excluded so totals drop when a
        merge rewrites the postings, while lazily-deleted docs still
        count — the reference's field_length_total semantics under
        deletion vs optimize."""
        import pandas as pd

        from whoosh_spark.analysis import analyze_series

        spec = fs.analyzer

        @F.pandas_udf("long")
        def _nlens(texts: pd.Series) -> pd.Series:
            return pd.Series(analyze_series(texts, spec).lengths())

        base = self.docs
        tomb = getattr(self, "tombstones", None)
        if tomb is not None:
            base = base.join(
                F.broadcast(tomb.select(F.col("doc_id").alias(self.doc_id_col))),
                self.doc_id_col, "left_anti")
        row = base.select(F.sum(_nlens(F.col(fs.name))).alias("t")).first()
        return float(row["t"] or 0.0)

    def avg_field_length(self, field_name: str) -> float:
        """avgdl = exact field_length_total / doc_count_all
        (reference: searching.py::Searcher.avg_field_length ~L280)."""
        if self.doc_count == 0:
            return 0.0
        return self.field_totals.get(field_name, 0.0) / self.doc_count

    # -- per-term stats: pushed-down point lookups + a bounded driver LRU --
    # The full lexicon NEVER materializes on the driver (a 10^8-10^9-term
    # lexicon at 100 TB would OOM it before the first query). Point filters
    # reach the sorted terms_global parquet (row-group min/max pruning, the
    # ordered-term-dictionary seek) and only the requested rows come back;
    # the LRU mirrors the reference's per-(field, term) idf memoization
    # (searching.py::Searcher.idf ~L300).

    _STATS_CACHE_MAX = 262_144

    def _stats_cache(self) -> dict:
        if self._lexicon_cache is None:
            with self._stats_lock:
                if self._lexicon_cache is None:
                    self._lexicon_cache = {}
        return self._lexicon_cache

    def prefetch_stats(self, pairs: "list[tuple[str, str]]") -> None:
        """Resolve every (field, term) of a query in ONE filtered job and
        fill the LRU — compile() calls this so an n-term query costs one
        lookup job, not n."""
        cache = self._stats_cache()
        todo = [k for k in dict.fromkeys(tuple(p) for p in pairs) if k not in cache]
        if not todo:
            return
        from functools import reduce

        cond = reduce(
            lambda a, b: a | b,
            [((F.col("field") == f) & (F.col("term") == t)) for f, t in todo],
        )
        rows = (
            self.terms.where(cond)
            .select("field", "term", "df", "total_weight")
            .collect()
        )
        found = {
            (r["field"], r["term"]): (int(r["df"]), float(r["total_weight"]))
            for r in rows
        }
        for key in todo:
            self._stats_put(key, found.get(key, (0, 0.0)))

    def _stats_put(self, key, val) -> None:
        cache = self._stats_cache()
        while len(cache) >= self._STATS_CACHE_MAX:
            cache.pop(next(iter(cache)))  # FIFO eviction is enough here
        cache[key] = val

    def term_stats(self, field_name: str, term: str) -> tuple[int, float]:
        """(df, collection frequency) of one term — cached point lookup;
        absent terms cache as (0, 0.0)."""
        key = (field_name, term)
        cache = self._stats_cache()
        if key not in cache:
            self.prefetch_stats([key])
        return cache[key]

    def doc_frequency(self, field_name: str, term: str) -> int:
        return self.term_stats(field_name, term)[0]

    def frequency(self, field_name: str, term: str) -> float:
        return self.term_stats(field_name, term)[1]

    def lexicon(self, field_name: str) -> list[str]:
        """All terms of one field, sorted (reference: IndexReader.lexicon).
        Deliberately collects — callers want the list; bounded by the
        single-field vocabulary, and NOT on any query compile path."""
        rows = self.terms.where(F.col("field") == field_name).select("term").collect()
        return sorted(r["term"] for r in rows)

    def most_frequent_terms(self, field_name: str, number: int = 5,
                            prefix: str = "") -> DataFrame:
        """Top ``number`` terms by total weight (reference:
        reading.py::IndexReader.most_frequent_terms) -> DataFrame
        (term, freq), ties broken term-ascending. Lazy: one filtered pass
        over the terms table + TakeOrderedAndProject — never the full
        lexicon on the driver."""
        t = self.terms.where(F.col("field") == field_name)
        if prefix:
            t = t.where(F.col("term").startswith(prefix))
        return (t.select("term", F.col("total_weight").alias("freq"))
                .orderBy(F.desc("freq"), F.asc("term")).limit(number))

    def most_distinctive_terms(self, field_name: str, number: int = 5,
                               prefix: str = "") -> DataFrame:
        """Top ``number`` terms by tf-idf score = total_weight *
        log(doc_count / df) (reference: reading.py::IndexReader.
        most_distinctive_terms) -> DataFrame (term, score). Same lazy
        top-k shape as most_frequent_terms."""
        t = self.terms.where(F.col("field") == field_name)
        if prefix:
            t = t.where(F.col("term").startswith(prefix))
        n = float(self.doc_count)
        score = F.col("total_weight") * F.log(F.lit(n) / F.col("df"))
        return (t.select("term", score.alias("score"))
                .orderBy(F.desc("score"), F.asc("term")).limit(number))

    def expand_terms(self, field_name: str, like=None, rlike=None, between=None,
                     fuzzy=None, isin=None) -> pd.DataFrame:
        """Lexicon expansion for Prefix/Wildcard/TermRange/Fuzzy queries
        (reference: query/terms.py::MultiTerm._btexts ~L150) as a SPARK
        filter on the terms table — prefix/range predicates push into the
        sorted terms parquet (row-group pruned), and only the expansion
        rows (query-vocabulary-sized) reach the driver as a pandas frame.
        ``rlike`` must arrive anchored (\\A...\\Z) for full-match semantics."""
        t = self.terms.where(F.col("field") == field_name)
        col = F.col("term")
        if isin is not None:  # explicit candidate list (Variations)
            t = t.where(col.isin([str(x) for x in isin]))
        if like is not None:  # prefix
            t = t.where(col.startswith(like))
        if rlike is not None:
            t = t.where(col.rlike(rlike))
        if between is not None:
            lo, hi, lo_excl, hi_excl = between
            if lo is not None:
                t = t.where(col > lo if lo_excl else col >= lo)
            if hi is not None:
                t = t.where(col < hi if hi_excl else col <= hi)
        if fuzzy is not None:
            word, maxdist, prefixlength = fuzzy
            if prefixlength:
                t = t.where(col.startswith(word[:prefixlength]))
            t = t.where(F.levenshtein(col, F.lit(word)) <= int(maxdist))
        pdf = t.select("term", "df", "total_weight").toPandas()
        return pdf.sort_values("term").reset_index(drop=True)

    # -- posting access points (overridden by the physical SegmentedIndex,
    # which filters packed BLOCK rows before decoding — mapInArrow is a
    # predicate-pushdown barrier, so the term filter must be routed here
    # rather than applied on top of the postings view) --

    def term_postings(self, fieldname: str, term: str,
                      positions: bool = False) -> DataFrame:
        """Posting rows of one (field, term) — the leaf matcher scan
        (reference: codec W3LeafMatcher via reading.py::SegmentReader
        .postings ~L350). ``positions`` is a hint for the physical index
        (skip decoding position payloads); the logical postings frame
        carries them either way."""
        return self.postings.where((F.col("field") == fieldname) & (F.col("term") == term))

    def terms_postings(self, fieldname: str, terms: list[str],
                       positions: bool = False) -> DataFrame:
        """Posting rows of an expanded term set (Prefix/Wildcard/Fuzzy/...)."""
        return self.postings.where(
            (F.col("field") == fieldname) & F.col("term").isin(list(terms))
        )

    def vector(self, doc_id: int, field_name: str) -> DataFrame:
        """Term vector of one document — forward-index read (reference:
        reading.py::IndexReader.vector ~L400), recomputed from postings
        (SURVEY D13 option b: no stored forward index; the posting scan is
        doc_id-filtered so only matching blocks/rows are decoded)."""
        return (
            self.postings.where(
                (F.col("field") == field_name) & (F.col("doc_id") == doc_id)
            )
            .select("term", "weight")
            .orderBy("term")
        )

    def pairs_postings(self, pairs: list[tuple[str, str]]) -> DataFrame:
        from functools import reduce

        cond = reduce(
            lambda a, b: a | b,
            [((F.col("field") == f) & (F.col("term") == t)) for f, t in pairs],
        )
        return self.postings.where(cond)

    def terms_df_postings(self, fieldname: str, terms_df: DataFrame) -> DataFrame:
        """Postings for every (fieldname, t) where t comes from a DataFrame
        column named ``term`` — the distributed analogue of pairs_postings
        for data-originated term sets (an upsert batch's unique-field
        values, a dedup sweep's keys): the values never pass through the
        driver. terms_df is broadcast (batch-sized by contract)."""
        return self.postings.where(F.col("field") == fieldname).join(
            F.broadcast(terms_df.select("term").distinct()), "term"
        )

    def live_docs(self) -> DataFrame:
        """Docs visible to Every/Not (deletion-aware in SegmentedIndex;
        the logical index has no delete set)."""
        return self.docs

    def persist(self) -> "InvertedIndex":
        from pyspark import StorageLevel

        if self.postings.storageLevel == StorageLevel.NONE:
            self.postings = self.postings.persist()
        if self.terms.storageLevel == StorageLevel.NONE:
            self.terms = self.terms.persist()
        return self

    def unpersist(self) -> "InvertedIndex":
        """Release cached frames (e.g. after a per-micro-batch percolation
        index has been fully consumed)."""
        self.postings = self.postings.unpersist()
        self.terms = self.terms.unpersist()
        return self


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    schema: Schema,
    doc_id_col: str = "doc_id",
    materialize: bool = True,
    analyzer_engine: str = "arrow",
) -> InvertedIndex:
    """Build the logical inverted index from a docs DataFrame.

    ``docs`` must already carry a dense ``doc_id`` (use
    indexing.docids.assign_doc_ids for the transcript parity ordering).

    With ``materialize`` (default), the postings frame is cached so the
    analyzer chain runs exactly ONCE — the terms stats, field totals and
    every query then read the materialized postings instead of re-running
    tokenization per action. (The 100 TB analogue is writing postings to the
    segment store — indexing/segments.py — and reading back; in-session we
    use the block cache.) Pass ``materialize=False`` to keep the build fully
    lazy, e.g. when immediately handing postings to a streaming sink.
    """
    if analyzer_engine not in ("arrow", "jvm"):
        raise ValueError(f"analyzer_engine must be 'arrow' or 'jvm', got {analyzer_engine!r}")
    parts: list[DataFrame] = []
    for fs in schema.text_fields():
        if fs.lang_col:
            # MULTILANG_TEXT: per-row analyzer routing — needs the lang
            # column in the batch; the JVM engine can't express per-row
            # dispatch, so routed fields always take the Arrow path
            src = docs.select(doc_id_col, fs.name, fs.lang_col)
            parts.append(src.mapInArrow(
                _text_postings_generator_multilang(fs, doc_id_col),
                POSTINGS_SCHEMA))
            continue
        src = docs.select(doc_id_col, fs.name)
        if analyzer_engine == "jvm":
            # opt-in whole-stage-codegen path (ASCII parity; see
            # _text_postings_jvm docstring). Fields whose chain the JVM
            # path can't express keep the Arrow engine — mixing engines
            # per field is fine, the output contract is identical.
            if _jvm_analyzer_eligible(fs.analyzer):
                parts.append(_text_postings_jvm(fs, doc_id_col, docs))
                continue
        parts.append(src.mapInArrow(_text_postings_generator(fs, doc_id_col), POSTINGS_SCHEMA))

    # All ID/BOOLEAN fields in ONE scan: per row, an array of (field, term)
    # structs, exploded once — n fields must not cost n passes over 10^12 rows.
    id_specs = [fs for fs in schema.indexed_fields() if fs.kind in ("id", "boolean")]
    if id_specs:
        entries = F.array(
            *[
                F.struct(
                    F.lit(fs.name).alias("field"),
                    F.col(fs.name).cast("string").alias("term"),
                )
                for fs in id_specs
            ]
        )
        part = (
            docs.select(F.col(doc_id_col).alias("doc_id"), F.explode(entries).alias("e"))
            .where(F.col("e.term").isNotNull() & (F.col("e.term") != ""))
            .select(
                F.col("e.field").alias("field"),
                F.col("e.term").alias("term"),
                "doc_id",
                F.lit(1.0).alias("weight"),
                F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("positions"),
                F.lit(None).cast("long").alias("dl"),
            )
        )
        parts.append(part)

    for fs in schema.indexed_fields():
        if fs.kind != "keyword":
            continue
        col = F.col(fs.name).cast("string")
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
        parts.append(part)

    postings = parts[0]
    for p in parts[1:]:
        postings = postings.unionByName(p)
    if materialize:
        postings = postings.persist()

    terms = postings.groupBy("field", "term").agg(
        F.count("*").alias("df"),
        F.sum("weight").alias("total_weight"),
        F.max("weight").alias("max_weight"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )

    return InvertedIndex(
        spark=spark,
        schema=schema,
        docs=docs,
        postings=postings,
        terms=terms,
        doc_id_col=doc_id_col,
    )
