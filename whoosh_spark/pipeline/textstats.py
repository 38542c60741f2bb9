"""Text analysis for training-data curation: language ID, quality scoring,
token counting, winnowing fingerprints, Gopher-style repetition filters,
cross-corpus benchmark decontamination (winnowing-sampled AND exact
13-gram), PII redaction, unigram-LM scoring, and the corpus mixture
report.

Every operator here is deterministic arithmetic with an exact DuckDB SQL
mirror (entry_queries registers them against the driver's oracle), and
everything except the fingerprint rolling hash is pure JVM column
expressions in whole-stage codegen. Regex patterns use explicit ASCII
classes ([A-Za-z0-9]) — Java and RE2 regex engines agree on those, while
\\w unicode semantics differ between engines.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from whoosh_spark.analysis import STOP_WORDS

# ------------------------------------------------------------ token counts

WORD_RE = "[A-Za-z0-9]+"
# BPE-ish pre-tokenizer: letter runs | single digits | single punctuation
BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, word_tokens, bpe_tokens, n_chars)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, " "), lambda x: x != ""))
    words = F.size(F.regexp_extract_all(t, F.lit(WORD_RE), 0))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_RE), 0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        words.alias("word_tokens"),
        bpe.alias("bpe_tokens"),
        F.length(t).alias("n_chars"),
    )


# ---------------------------------------------------------- quality score


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + one composite score in [0, 1].

    Features mirror common corpus-curation filters (length band, stopword
    ratio, alpha ratio, mean word length band); the composite is a fixed
    weighted product so it is reproducible in SQL.
    """
    t = F.col(text_col)
    words = F.regexp_extract_all(F.lower(t), F.lit("[a-z0-9]+"), 0)
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    n_stop = F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x)))
    n_alpha = F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]"), 0))
    mean_wl = F.when(n_words > 0,
                     F.aggregate(words, F.lit(0), lambda a, x: a + F.length(x))
                     / n_words).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(F.length(t) > 0, n_alpha / F.length(t)).otherwise(F.lit(0.0))
    len_ok = F.when((n_words >= 10) & (n_words <= 100000), F.lit(1.0)).otherwise(F.lit(0.2))
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    stop_ok = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    score = F.round(len_ok * wl_ok * stop_ok * alpha_ratio, 4)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        score.alias("quality"),
    )


# ------------------------------------------------------------- language ID

# Tiny per-language function-word profiles (top function words). A real
# pipeline would plug in fastText/CLD — this is the deterministic n-gram
# heuristic tier that needs no model artifact.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "on",
           "with", "as", "at", "this", "but", "from", "by", "are", "was", "be"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "auf", "sich", "auch", "es", "im", "für", "dem",
           "wird", "sind"),
    "fr": ("le", "la", "les", "et", "de", "des", "est", "un", "une", "du",
           "dans", "que", "qui", "pour", "pas", "sur", "au", "avec", "ce",
           "il"),
    "es": ("el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "no", "para", "se", "su", "al", "lo", "como"),
}


def langid(docs: DataFrame, text_col: str = "text",
           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax function-word hit ratio,
    deterministic tiebreak by profile order en > de > fr > es."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    n = F.size(words)
    ratios = {}
    for lang, profile in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in profile])
        hits = F.size(F.filter(words, lambda x: F.array_contains(arr, x)))
        ratios[lang] = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
    best_score = F.greatest(*ratios.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_PROFILES)):  # earlier profiles win ties
        pred = F.when(ratios[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("und"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        F.round(best_score, 4).alias("lang_score"),
    )


# ------------------------------------------------- winnowing fingerprints

FP_MOD = 1_000_000_007
FP_BASE = 31


def winnow_fingerprints(docs: DataFrame, text_col: str = "text", k: int = 8,
                        window: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints -> (doc_id, fp) exploded.

    k-gram rolling hash h(s) = fold((a*31 + code(c)) % 1e9+7) over the
    k chars (left fold), then the minimum hash of every ``window``
    consecutive k-grams, deduplicated — the standard winnowing scheme
    (Schleimer et al., SIGMOD'03), reproducible exactly in SQL.

    Vectorized: per Arrow batch, ONE (k x positions) numpy pass computes
    all k-gram hashes, sliding_window_view takes window minima.
    """
    import pyarrow as pa

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            texts = batch.column(batch.schema.get_field_index(text_col)).to_pylist()
            out_ids: list[np.ndarray] = []
            out_fps: list[np.ndarray] = []
            for did, txt in zip(ids, texts):
                txt = txt or ""
                codes = np.frombuffer(txt.encode("utf-8", "replace"), dtype=np.uint8).astype(
                    np.int64
                )
                npos = codes.size - k + 1
                if npos <= 0:
                    continue
                h = np.zeros(npos, dtype=np.int64)
                for i in range(k):
                    h = (h * FP_BASE + codes[i : i + npos]) % FP_MOD
                if npos >= window:
                    wmin = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
                else:
                    wmin = np.array([h.min()])
                fps = np.unique(wmin)
                out_ids.append(np.full(fps.size, did, dtype=np.int64))
                out_fps.append(fps)
            if not out_ids:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_ids), type=pa.int64()),
                    pa.array(np.concatenate(out_fps), type=pa.int64()),
                ],
                names=["doc_id", "fp"],
            )

    return docs.select(id_col, text_col).mapInArrow(gen, "doc_id long, fp long")


def fingerprint_overlap_pairs(docs: DataFrame, text_col: str = "text",
                              k: int = 8, window: int = 4,
                              min_common: int = 5,
                              id_col: str = "doc_id") -> DataFrame:
    """Doc pairs sharing >= min_common winnowing fingerprints (plagiarism /
    near-dup detection via inverted fingerprint index)."""
    fps = winnow_fingerprints(docs, text_col, k, window, id_col)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= min_common)
    )


def contamination_pairs(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", k: int = 8, window: int = 4,
                        min_common: int = 5, id_col: str = "doc_id",
                        bench_id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: (corpus_id, bench_id, common) for pairs
    sharing >= min_common winnowing fingerprints ACROSS two corpora — the
    eval-contamination sweep every training run does before touching the
    data. Same fingerprint scheme as :func:`winnow_fingerprints`, so a
    shared substring of ~k+window chars yields shared prints.

    Scale shape: the benchmark side is small by nature (eval sets), so its
    fingerprint frame BROADCASTS — the 100 TB corpus is fingerprinted in
    one mapInArrow pass and hash-joined in place; no self-join, no shuffle
    of corpus fingerprints. Contrast fingerprint_overlap_pairs, which
    self-joins within one corpus.
    """
    cfp = winnow_fingerprints(corpus, text_col, k, window, id_col)
    bfp = (winnow_fingerprints(benchmark, text_col, k, window, bench_id_col)
           .withColumnRenamed("doc_id", "bench_id"))
    return (cfp.join(F.broadcast(bfp), "fp")
            .groupBy(F.col("doc_id").alias("corpus_id"), "bench_id")
            .agg(F.count("*").alias("common"))
            .where(F.col("common") >= min_common))


# ------------------------------------------------- repetition (Gopher-style)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
    Models", appendix A1.1 — the duplicate-text heuristics every
    training-data pipeline runs), simplified to deterministic
    overlap-counted arithmetic so an exact SQL mirror exists:

    - ``dup_word_frac``: 1 - distinct/total words (whitespace-lowercase
      tokenization, the repeated-token load of the doc)
    - ``top_bigram`` / ``top_bigram_frac``: the most frequent word bigram
      (ties -> lexicographically smallest) and the fraction of the
      whitespace-normalized text's characters its occurrences cover
    - ``dup_trigram_frac``: fraction of normalized characters covered by
      occurrences of trigrams appearing >= 2 times (occurrences counted
      independently; Gopher's overlap dedup is not reproducible in SQL)

    Scale shape: one words split per doc (JVM codegen), n-gram counts via
    explode -> groupBy(doc_id, gram) with map-side partial aggregation —
    the only shuffles, keyed fine-grained so hot docs don't skew. No
    Python in the plan.
    """
    t = F.col(text_col)
    words = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        words.alias("w"),
    ).select(
        "doc_id", "w",
        F.size("w").alias("n_words"),
        F.length(F.concat_ws(" ", F.col("w"))).alias("norm_len"),
    )

    def grams(n: int) -> Column:
        # contiguous word n-grams as space-joined strings; empty when the
        # doc has < n words (sequence() would otherwise run descending)
        return F.when(
            F.col("n_words") >= n,
            F.transform(
                F.sequence(F.lit(0), F.col("n_words") - n),
                lambda i: F.concat_ws(
                    " ", *[F.get("w", i + off) for off in range(n)]),
            ),
        ).otherwise(F.array().cast("array<string>"))

    stats = base.select(
        "doc_id", "n_words", "norm_len",
        F.when(
            F.col("n_words") > 0,
            (F.col("n_words") - F.size(F.array_distinct("w")))
            / F.col("n_words"),
        ).otherwise(F.lit(0.0)).alias("dup_word_frac"),
    )

    from pyspark.sql import Window

    bg = (base.select("doc_id", F.explode(grams(2)).alias("g"))
          .groupBy("doc_id", "g").count())
    top_w = Window.partitionBy("doc_id").orderBy(F.desc("count"), F.asc("g"))
    top_bg = (bg.withColumn("_rn", F.row_number().over(top_w))
              .where(F.col("_rn") == 1)
              .select("doc_id", F.col("g").alias("top_bigram"),
                      F.col("count").alias("_cnt")))

    tg_dup = (base.select("doc_id", F.explode(grams(3)).alias("g"))
              .groupBy("doc_id", "g").count()
              .where(F.col("count") >= 2)
              .groupBy("doc_id")
              .agg(F.sum(F.col("count") * F.length("g")).alias("_dupchars")))

    return (stats
            .join(top_bg, "doc_id", "left")
            .join(tg_dup, "doc_id", "left")
            .select(
                "doc_id", "n_words", "dup_word_frac", "top_bigram",
                # overlap-counted coverage can exceed the text length
                # ("a a a" counts the shared middle twice) — cap at 1.0 to
                # keep fraction semantics
                F.when(
                    F.col("norm_len") > 0,
                    F.least(
                        F.lit(1.0),
                        F.coalesce(
                            F.col("_cnt") * F.length("top_bigram"), F.lit(0))
                        / F.col("norm_len")),
                ).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
                F.when(
                    F.col("norm_len") > 0,
                    F.least(
                        F.lit(1.0),
                        F.coalesce(F.col("_dupchars"), F.lit(0))
                        / F.col("norm_len")),
                ).otherwise(F.lit(0.0)).alias("dup_trigram_frac"),
            ))


# ------------------------------------------------------- mixture report


def mixture_report(docs: DataFrame, by: "tuple[str, ...]" = ("lang", "source"),
                   text_col: str = "text") -> DataFrame:
    """Corpus mixture report: per-stratum doc / whitespace-token / char
    totals plus each stratum's token share of the corpus — the table a
    training-mix plan is drawn from, and the input to
    :func:`whoosh_spark.pipeline.sampling.stratified_sample` quotas.

    One groupBy with map-side combine over the corpus; the share window
    runs on the already-aggregated stratum frame (tiny by construction).
    """
    t = F.col(text_col)
    toks = F.size(F.filter(F.split(t, " "), lambda x: x != ""))
    agg = (docs.select(*by, toks.alias("_t"), F.length(t).alias("_c"))
           .groupBy(*by)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("_t").alias("tokens"),
                F.sum("_c").alias("chars")))
    from pyspark.sql import Window

    w = Window.partitionBy()
    return agg.select(
        *by, "n_docs", "tokens", "chars",
        F.round(F.col("tokens") / F.sum("tokens").over(w), 6)
        .alias("token_share"))


# ------------------------------------------------------------ PII redaction

# ASCII-only patterns chosen to parse identically in Java regex (Spark)
# and RE2 (DuckDB/most scrubbers) — no lookaround, no unicode classes.
PII_PATTERNS: "tuple[tuple[str, str], ...]" = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               patterns: "tuple[tuple[str, str], ...]" = PII_PATTERNS
               ) -> DataFrame:
    """PII scrubbing: (doc_id, text_redacted, n_redactions) with every
    pattern occurrence replaced by its placeholder, applied in order —
    the standard pre-training scrub stage. Pure JVM ``regexp_replace``
    chain in whole-stage codegen (no Python, no shuffle); patterns are
    ASCII-only so Java and RE2 engines agree (module note above).
    ``n_redactions`` counts matches BEFORE replacement, summed across
    patterns on the progressively-redacted text (so an email's digits are
    not double-counted by the phone pattern)."""
    t = F.col(text_col)
    out = t
    n = F.lit(0)
    for pat, repl in patterns:
        n = n + F.size(F.regexp_extract_all(out, F.lit(pat), 0))
        out = F.regexp_replace(out, pat, repl)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        out.alias("text_redacted"),
        n.cast("int").alias("n_redactions"),
    )


def _word_ngram_keys(df: DataFrame, n: int, text_col: str, id_col: str,
                     out_id: str) -> DataFrame:
    """Distinct md5 keys of the lowercase word n-grams of each doc."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    return (
        df.select(F.col(id_col).cast("long").alias(out_id), words.alias("_w"))
        .where(F.size("_w") >= n)
        .select(
            out_id,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_w") - n + 1),
                    lambda i: F.md5(F.array_join(F.slice(F.col("_w"), i, n), " ")),
                )
            ).alias("g"),
        )
        .distinct()
    )


def exact_ngram_contamination(corpus: DataFrame, benchmark: DataFrame,
                              n: int = 13, text_col: str = "text",
                              id_col: str = "doc_id",
                              bench_id_col: str = "doc_id") -> DataFrame:
    """GPT-3/PaLM-style EXACT decontamination: (corpus_id, bench_id,
    n_shared) for every corpus doc sharing at least one exact lowercase
    word ``n``-gram (default 13, the GPT-3 value) with a benchmark doc;
    ``n_shared`` counts the distinct shared n-grams.

    The exact complement to the winnowing-based
    :func:`contamination_pairs`: no sampling, so a single verbatim
    13-word overlap is guaranteed to flag. Same scale shape — n-grams are
    md5-keyed (32B each, not n words), per-doc DISTINCT bounds a doc's
    keys by its length, the benchmark side is eval-set-sized and
    BROADCASTS, so the corpus is swept in one pass with no self-join and
    no corpus-side shuffle beyond the per-doc distinct.
    """
    cg = _word_ngram_keys(corpus, n, text_col, id_col, "corpus_id")
    bg = _word_ngram_keys(benchmark, n, text_col, bench_id_col, "bench_id")
    return (
        cg.join(F.broadcast(bg), "g")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Corpus-trained unigram LM score per doc — the deterministic tier of
    CCNet-style perplexity filtering (no model artifact): (doc_id,
    n_tokens, mean_logprob) with mean_logprob = mean over token instances
    of ln(C(token)/T), C = corpus count, T = total tokens. Low (very
    negative) = rare-token-heavy docs (gibberish, encoding damage); high =
    function-word soup. Empty docs score 0.0 by convention.

    Plan shape: explode tokens -> ONE count window partitioned by term
    (the single-shuffle group-labeler shape; a groupBy + join-back
    re-shuffles the token stream a second time) -> groupBy(doc) mean.
    The corpus total still derives from a tiny distinct-term aggregate.
    Token counts could be reused from an index lexicon when one exists;
    this op stays standalone so curation does not require building an
    index first.
    """
    from pyspark.sql import Window

    toks = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
            ).alias("term"),
        )
    )
    counts = toks.groupBy("term").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    scored = (
        toks.withColumn("c", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("t"))), 4).alias("mean_logprob"),
        )
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("mean_logprob", F.lit(0.0)).alias("mean_logprob"),
        )
    )


def bigram_logprob(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lam: float = 0.7) -> DataFrame:
    """Corpus-trained interpolated-bigram LM score per doc — one tier above
    :func:`unigram_logprob` toward CCNet's KenLM filter, still with no
    model artifact: (doc_id, n_bigrams, mean_logprob) where mean_logprob =
    mean over bigram instances of ln(lam * C(w1 w2)/C(w1) +
    (1-lam) * C(w2)/T). Backoff to the unigram term keeps unseen-history
    mass nonzero without add-k tables. Docs with < 2 tokens score 0.0.

    Plan shape: bigrams derive JVM-side from the token array (transform
    over sequence — no second regex pass, no Python); bigram counts come
    from ONE count window partitioned by (w1, w2) — the single-shuffle
    group-labeler shape (a groupBy + join-back re-shuffles the bigram
    stream a second time; A/B at sf0.1: 1.57 -> 1.00 s); unigram counts
    are one groupBy then equi-joins on w1/w2 — no broadcast assumption,
    a 100 TB vocabulary outgrows one; final groupBy(doc) mean.
    Arithmetic is written in the exact order the DuckDB oracle mirrors
    (lam * (c12/c1) + (1-lam) * (c2/t)) so the rounded mean is
    bit-comparable.
    """
    from pyspark.sql import Window

    toks_arr = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"), toks_arr.alias("_w"))
    uni = (
        base.select(F.explode("_w").alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
    )
    total = uni.agg(F.sum("c").alias("t"))
    # sequence(1, size-1) guarded: Spark's sequence DESCENDS when start >
    # stop, so size < 2 must yield an empty array, not [1, 0, ...]
    idx = F.when(F.size("_w") >= 2, F.sequence(F.lit(1), F.size("_w") - 1)) \
           .otherwise(F.array().cast("array<int>"))
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.struct(
                F.element_at("_w", i).alias("w1"),
                F.element_at("_w", i + 1).alias("w2"),
            ))
        ).alias("_bg"),
    ).select("doc_id", F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    scored = (
        bigrams
        .withColumn("c12", F.count("*").over(Window.partitionBy("w1", "w2")))
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(
                F.lit(lam) * (F.col("c12") / F.col("c1"))
                + F.lit(1.0 - lam) * (F.col("c2") / F.col("t"))
            )), 4).alias("mean_logprob"),
        )
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("mean_logprob", F.lit(0.0)).alias("mean_logprob"),
        )
    )


# ------------------------------------------------- DSIR importance weights


def _dsir_features(docs: DataFrame, text_col: str, id_col: str,
                   buckets: int, salt: str) -> DataFrame:
    """(doc_id, b, cnt): hashed word unigram+bigram bucket counts — the
    feature map of Xie et al. 2023 (DSIR). Bucket = first 32 md5 bits of
    salt:feature mod ``buckets`` (same hash convention as
    pipeline/sampling.py so DuckDB mirrors it exactly)."""
    toks_arr = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"), toks_arr.alias("_w"))
    idx = F.when(F.size("_w") >= 2, F.sequence(F.lit(1), F.size("_w") - 1)) \
           .otherwise(F.array().cast("array<int>"))
    feats = base.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("_w"),
                F.transform(idx, lambda i: F.concat_ws(
                    " ", F.element_at("_w", i), F.element_at("_w", i + 1))),
            )
        ).alias("feat"),
    )
    b = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col("feat"))), 1, 8), 16, 10)
        .cast("long") % buckets
    )
    return feats.select("doc_id", b.alias("b")).groupBy("doc_id", "b") \
        .agg(F.count("*").alias("cnt"))


def dsir_logweights(docs: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    buckets: int = 4096, alpha: float = 1.0,
                    salt: str = "dsir") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
    log importance weights: score every raw doc by how target-like its
    hashed-ngram bucket profile is. (doc_id, n_feats, log_weight) with
    log_weight = sum_b cnt_b * (ln p_target(b) - ln p_raw(b)), bucket
    distributions add-alpha smoothed: p(b) = (c_b + alpha)/(T + alpha*B).
    Select by ordering on log_weight desc (deterministic top-k) or via
    Gumbel-top-k for the sampled variant.

    Plan shape: feature bucket counts are one explode + groupBy per side;
    both distributions collapse to <= ``buckets`` rows, so they join back
    BROADCAST by construction (the whole point of hashing: corpus-size
    vocabulary -> fixed-size table). One final groupBy(doc). Scales to any
    corpus: nothing but the B-row tables leaves its input partition twice.
    """
    raw_f = _dsir_features(docs, text_col, id_col, buckets, salt)
    tgt_f = _dsir_features(target, text_col, id_col, buckets, salt)
    raw_dist = raw_f.groupBy("b").agg(F.sum("cnt").alias("cr"))
    tgt_dist = tgt_f.groupBy("b").agg(F.sum("cnt").alias("ct"))
    raw_tot = raw_dist.agg(F.sum("cr").alias("tr"))
    tgt_tot = tgt_dist.agg(F.sum("ct").alias("tt"))
    ab = float(alpha) * buckets
    scored = (
        raw_f
        .join(F.broadcast(raw_dist), "b")
        .join(F.broadcast(tgt_dist), "b", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.round(F.sum(
                F.col("cnt") * (
                    F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(float(alpha)))
                          / (F.col("tt") + F.lit(ab)))
                    - F.log((F.col("cr") + F.lit(float(alpha)))
                            / (F.col("tr") + F.lit(ab)))
                )
            ), 4).alias("log_weight"),
        )
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_gumbel_topk(docs: DataFrame, target: DataFrame, n: int,
                     text_col: str = "text", id_col: str = "doc_id",
                     buckets: int = 4096, alpha: float = 1.0,
                     beta: float = 1.0, salt: str = "dsirg") -> DataFrame:
    """The RESAMPLING step of DSIR: draw ``n`` docs without replacement
    with probability proportional to importance weight^(1/beta), via the
    Gumbel-top-k trick made deterministic — gumbel noise derives from the
    doc's md5 (u = (h32 + 0.5) / 2^32, g = -ln(-ln(u))), so the "sample"
    is reproducible under any partitioning or cluster size, same contract
    as the other samplers. beta tempers the weights (beta -> inf degrades
    to uniform; beta -> 0 to deterministic top-k by weight).

    Output: (doc_id, log_weight, gumbel_score) sorted by (rounded score
    desc, doc_id), limit n. log_weight is the rounded-4 output of
    :func:`dsir_logweights`, so the score arithmetic is reproducible
    cross-engine.

    Plan shape: dsir_logweights' plan + one global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort).
    """
    w = dsir_logweights(docs, target, text_col, id_col, buckets, alpha)
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                          F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("double")
    )
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    g = -F.log(-F.log(u))
    scored = w.select(
        "doc_id", "log_weight",
        F.round(F.col("log_weight") / F.lit(float(beta)) + g, 4).alias("gumbel_score"),
    )
    return scored.orderBy(F.desc("gumbel_score"), F.asc("doc_id")).limit(n)


# HTML boilerplate removal: the CommonCrawl-style extraction pre-pass.
# Patterns deliberately avoid backreferences (RE2 has none) and stay
# ASCII, so the Java and RE2 engines agree and the driver entry can
# mirror the exact chain in DuckDB.
_HTML_STRIP_PATTERNS = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]+>",
)
_HTML_ENTITIES = (
    # &amp; must decode LAST: escaped markup like '&amp;lt;' means the
    # literal text '&lt;' and must NOT double-unescape into '<'
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
)


def line_shape_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", max_bullet_frac: float = 0.9,
                     max_ellipsis_frac: float = 0.3,
                     max_symbol_ratio: float = 0.1) -> DataFrame:
    """MassiveText line-shape document filters (Rae et al. 2021 A1.1 —
    the Gopher doc-removal rules not covered by :func:`repetition_stats`
    or :func:`quality_scores`) -> (doc_id, n_lines, bullet_line_frac,
    ellipsis_line_frac, symbol_word_ratio, keep).

    Published rules: remove a doc when more than 90% of its lines start
    with a bullet ("-", "*", "•"), more than 30% end with an ellipsis
    ("..." or "…"), or the symbol-to-word ratio exceeds 0.1 for EITHER
    the hash symbol or the ellipsis (per-symbol thresholds, so
    ``symbol_word_ratio`` reports the max of the two ratios — a doc
    under 0.1 on each symbol passes even if the sum exceeds it). Lines
    are trimmed and empty lines ignored; ``keep`` applies the thresholds
    to the UNROUNDED fractions (reported values are rounded to 4
    decimals). A narrow all-JVM map — no shuffle, no Python — like the
    rest of the quality tier."""
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike("^[-*•]")))
    n_ell = F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)$")))
    words = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_sym_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
    )
    bullet_frac = F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0))
    ell_frac = F.when(n_lines > 0, n_ell / n_lines).otherwise(F.lit(0.0))
    sym_ratio = F.when(
        words > 0, F.greatest(n_hash / words, n_sym_ell / words)
    ).otherwise(F.lit(0.0))
    keep = (
        (bullet_frac <= float(max_bullet_frac))
        & (ell_frac <= float(max_ellipsis_frac))
        & (sym_ratio <= float(max_symbol_ratio))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_lines.cast("int").alias("n_lines"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ell_frac, 4).alias("ellipsis_line_frac"),
        F.round(sym_ratio, 4).alias("symbol_word_ratio"),
        keep.alias("keep"),
    )


def dedup_lines(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Within-document duplicate-line removal -> (doc_id, text_clean,
    n_lines, n_kept): keep the FIRST occurrence of each line (compared
    trimmed), preserve order, pass blank lines through untouched (they
    are separators, not content). The boilerplate-line cleanup step
    (repeated nav bars / footers inside one page) RefinedWeb/Dolma-style
    pipelines run before cross-doc dedup; :func:`repetition_stats`
    MEASURES the duplicate-line load, this removes it.

    Doc-local index-aware higher-order functions — a narrow map with NO
    shuffle; the per-doc prefix scan is O(lines²), fine at real line
    counts (a 10k-line outlier is ~10^8 cheap JVM comparisons; for
    adversarial inputs the explode -> row_number-per-(doc, line) ->
    re-aggregate shape trades this for a shuffle)."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda x, i: (F.trim(x) == "")
        | ~F.exists(F.slice(lines, 1, i), lambda y: F.trim(y) == F.trim(x)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
    )


_C4_TERMINAL_RE = r'[.!?"]$'


def c4_line_filter(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_words: int = 5,
                   min_kept_lines: int = 3) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the
    published C4 heuristics) -> (doc_id, text_clean, n_lines, n_kept,
    has_lorem, has_brace, keep).

    Line rules (a line survives iff ALL hold, after trimming):
    ends in a terminal punctuation mark (``. ! ? "``), has at least
    ``min_words`` whitespace-separated words, and does not contain the
    word "javascript" (case-insensitive). Doc rules: ``keep`` is true
    iff at least ``min_kept_lines`` lines survive AND the raw text has
    neither "lorem ipsum" (case-insensitive) nor a curly bracket
    (``{`` or ``}``).

    Entirely JVM higher-order functions over the split line array —
    a narrow map with NO shuffle and no Python, so a 100 TB crawl
    cleans at scan speed; downstream stages filter on ``keep``.
    """
    lines = F.split(F.col(text_col), "\n")
    trimmed = F.transform(lines, lambda x: F.trim(x))

    def _line_ok(x):
        return (
            (x != "")
            & x.rlike(_C4_TERMINAL_RE)
            & (F.size(F.split(x, r"\s+")) >= int(min_words))
            & ~F.contains(F.lower(x), F.lit("javascript"))
        )

    kept = F.filter(trimmed, _line_ok)
    low = F.lower(F.col(text_col))
    has_lorem = F.contains(low, F.lit("lorem ipsum"))
    has_brace = F.contains(F.col(text_col), F.lit("{")) | F.contains(
        F.col(text_col), F.lit("}")
    )
    n_kept = F.size(kept)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(lines).cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ((n_kept >= int(min_kept_lines)) & ~has_lorem & ~has_brace).alias("keep"),
    )


def strip_html(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """HTML/boilerplate removal: (doc_id, text_clean, n_clean_chars) —
    script/style blocks and comments dropped whole, remaining tags
    replaced by spaces (so ``a<br>b`` keeps a word boundary), the six
    common entities decoded, whitespace collapsed and trimmed. Pure JVM
    ``regexp_replace``/``replace`` chain in whole-stage codegen: no
    Python, no shuffle — the narrow map every crawl-extraction pipeline
    runs before tokenization."""
    t = F.col(text_col)
    for pat in _HTML_STRIP_PATTERNS:
        t = F.regexp_replace(t, pat, " ")
    for ent, ch in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        t.alias("text_clean"),
        F.length(t).cast("int").alias("n_clean_chars"),
    )


def chunk_text(docs: DataFrame, size: int, overlap: int = 0,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character-window chunking for RAG / embedding pipelines:
    (doc_id, chunk_idx, begin, chunk_text) — windows of ``size`` chars
    starting every ``size - overlap`` chars, last window ragged, empty
    docs emit no rows. A doc-local explode: NO shuffle at all (narrow
    1->N map), chunk count = ceil(max(len - overlap, 1) / stride), so a
    100 TB corpus chunks at scan speed and downstream ops key on
    (doc_id, chunk_idx)."""
    if size <= 0 or not 0 <= overlap < size:
        raise ValueError(f"need size > overlap >= 0, got {size}/{overlap}")
    stride = size - overlap
    ln = F.length(F.col(text_col))
    n_chunks = F.ceil(
        F.greatest(ln - F.lit(overlap), F.lit(1)) / F.lit(stride)
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    out = docs.where(ln > 0).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"), idx
    )
    begin = F.col("chunk_idx").cast("long") * F.lit(stride)
    return out.select(
        "doc_id",
        "chunk_idx",
        begin.alias("begin"),
        F.substring(F.col("_t"), (begin + 1).cast("int"), size)
        .alias("chunk_text"),
    )

# ------------------------------------------------- collocation extraction


def collocations(docs: DataFrame, text_col: str = "text",
                 min_count: int = 5, top_n: int = 50) -> DataFrame:
    """Corpus-level collocation extraction: Dunning (1993) log-likelihood
    ratio + PMI over adjacent token pairs -> the top ``top_n`` rows
    (w1, w2, c12, pmi, llr) ordered by rounded llr DESC, ties (w1, w2).

    The contingency table is built from bigram-event margins (row = count
    of bigrams whose FIRST word is w1, col = count whose SECOND word is
    w2, N = total bigram instances), so rows and columns sum to N exactly
    and every cell is a nonnegative integer:

        k11 = c12           k12 = c1x - c12
        k21 = cx2 - c12     k22 = N - c1x - cx2 + c12

    llr = 2 * (xlx(k11)+xlx(k12)+xlx(k21)+xlx(k22)
               - xlx(c1x)-xlx(N-c1x) - xlx(cx2)-xlx(N-cx2) + xlx(N))
    with xlx(x) = x*ln(x), xlx(0) = 0 — the numerically stable entropy
    form; pmi = ln(c12 * N / (c1x * cx2)). Both are written in this exact
    order so the DuckDB oracle is bit-comparable after round(…, 4), and
    the output ranks by the ROUNDED llr with a total (w1, w2) tie-break,
    so ordering is engine- and partitioning-independent.

    Plan shape (the 100 TB contract): bigrams derive doc-local from the
    token array (transform over sequence — no second regex pass, no
    Python); the ONLY corpus-sized shuffle is the map-side-combined
    groupBy(w1, w2); margins and N are second-stage aggregates over the
    already-reduced pair table (vocab²-bounded, in practice ≪ corpus);
    min_count prunes before the margin joins; the final ordering is a
    TakeOrderedAndProject at top_n rows. Reference parity: Whoosh has no
    collocation surface — this is the beyond-reference corpus-analysis
    tier alongside key_terms (aux.py) and bigram_logprob above.
    """
    toks_arr = F.regexp_extract_all(F.lower(F.col(text_col)),
                                    F.lit("[a-z0-9]+"), 0)
    base = docs.select(toks_arr.alias("_w"))
    idx = F.when(F.size("_w") >= 2, F.sequence(F.lit(1), F.size("_w") - 1)) \
           .otherwise(F.array().cast("array<int>"))
    bigrams = base.select(
        F.explode(
            F.transform(idx, lambda i: F.struct(
                F.element_at("_w", i).alias("w1"),
                F.element_at("_w", i + 1).alias("w2"),
            ))
        ).alias("_bg"),
    ).select(F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    bc = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    left = bc.groupBy("w1").agg(F.sum("c12").alias("c1x"))
    right = bc.groupBy("w2").agg(F.sum("c12").alias("cx2"))
    total = bc.agg(F.sum("c12").alias("n"))

    def xlx(c: Column) -> Column:
        x = c.cast("double")
        return F.when(c > 0, x * F.log(x)).otherwise(F.lit(0.0))

    k11 = F.col("c12")
    k12 = F.col("c1x") - F.col("c12")
    k21 = F.col("cx2") - F.col("c12")
    k22 = F.col("n") - F.col("c1x") - F.col("cx2") + F.col("c12")
    llr = F.lit(2.0) * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
        - xlx(F.col("c1x")) - xlx(F.col("n") - F.col("c1x"))
        - xlx(F.col("cx2")) - xlx(F.col("n") - F.col("cx2"))
        + xlx(F.col("n"))
    )
    pmi = F.log(
        F.col("c12").cast("double") * F.col("n")
        / (F.col("c1x").cast("double") * F.col("cx2"))
    )
    scored = (
        bc.where(F.col("c12") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", F.col("c12").cast("long").alias("c12"),
            F.round(pmi, 4).alias("pmi"),
            F.round(llr, 4).alias("llr"),
        )
    )
    return scored.orderBy(F.desc("llr"), "w1", "w2").limit(top_n)


# ------------------------------------------------- trending terms


def trending_terms(docs: DataFrame, text_col: str = "text",
                   ts_col: str = "ts", window_s: int = 3600,
                   top_n: int = 3, min_count: int = 2) -> DataFrame:
    """Per-time-window trending terms: the top ``top_n`` terms of each
    ``window_s``-second bucket by chi-square-style burst z-score ->
    (win, term, c, zscore). For each (window, term):

        e = expected count under time-independence
          = term_total * window_total / grand_total
        z = (c - e) / sqrt(e)

    — the one-cell Pearson residual, the standard burst signal (the
    lift numerator of Kleinberg-style burst detection without the HMM
    machinery). Windows are pure integer arithmetic on the epoch delta
    from the corpus min timestamp (floor(off_s / window_s)) — no
    date_trunc, so the bucketing is timezone- and engine-independent.

    Plan shape: tokens derive doc-local (JVM regexp, no Python); the
    ONLY corpus-sized shuffle is the map-side-combined
    groupBy(win, term); term totals, window totals and the grand total
    are second-stage aggregates over that reduced table; ranking is a
    bounded per-window row_number over candidates with c >= min_count,
    ordered by (rounded z DESC, term ASC) — total and engine-stable.
    """
    from pyspark.sql import Window

    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit("[a-z0-9]+"), 0)
    origin = docs.agg(F.min(F.col(ts_col).cast("long")).alias("_o"))
    base = docs.crossJoin(F.broadcast(origin)).select(
        F.floor((F.col(ts_col).cast("long") - F.col("_o"))
                / F.lit(window_s)).cast("long").alias("win"),
        F.explode(toks).alias("term"),
    )
    wc = base.groupBy("win", "term").agg(F.count("*").alias("c"))
    t_tot = wc.groupBy("term").agg(F.sum("c").alias("ct"))
    w_tot = wc.groupBy("win").agg(F.sum("c").alias("nw"))
    grand = wc.agg(F.sum("c").alias("n"))
    e = F.col("ct").cast("double") * F.col("nw") / F.col("n")
    z = (F.col("c") - e) / F.sqrt(e)
    scored = (
        wc.where(F.col("c") >= min_count)
        .join(t_tot, "term").join(w_tot, "win")
        .crossJoin(F.broadcast(grand))
        .select("win", "term", F.col("c").cast("long").alias("c"),
                F.round(z, 4).alias("zscore"))
    )
    rank = Window.partitionBy("win").orderBy(F.desc("zscore"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(rank))
        .where(F.col("_rn") <= top_n)
        .drop("_rn")
    )


# ------------------------------------------------- n-gram novelty


def ngram_novelty(docs: DataFrame, n: int = 8, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document novelty: the fraction of a doc's word n-grams that
    occur in NO other document -> (doc_id, n_grams, n_novel, novelty).
    The inverse signal of contamination/dup detection: low novelty means
    the doc is assembled from corpus-recurring fragments (template spam,
    boilerplate mosaics, near-copies below the dedup thresholds) — a
    standard diversity feature for mixture curation next to
    :func:`repetition_stats` (which is doc-INTERNAL where this is
    doc-vs-CORPUS).

    A gram counts as novel when no OTHER doc contains it; a gram
    repeated within one doc only is still novel. Fractions are over
    DISTINCT grams of the doc (duplicates inside a doc carry no
    cross-doc evidence), novelty = n_novel / n_grams rounded to 4, docs
    with < n tokens report 0 grams and novelty 1.0 (vacuously novel).

    Plan shape: grams derive doc-local from the token array (transform
    over sequence — no second regex pass, no Python), md5-hashed to a
    16-byte key BEFORE the shuffle (the duplicate_substring_spans
    discipline: ship 16 bytes, not the gram text); ONE map-side-combined
    groupBy(gram) counting distinct docs via (doc, gram)-distinct
    pre-reduction; join back and ONE groupBy(doc). Two key shuffles
    total, both on the reduced distinct-gram stream.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit("[a-z0-9]+"), 0)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       toks.alias("_w"))
    idx = F.when(F.size("_w") >= n,
                 F.sequence(F.lit(1), F.size("_w") - (n - 1))) \
           .otherwise(F.array().cast("array<int>"))
    grams = base.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.md5(
                F.concat_ws("\x1f", F.slice("_w", i, n))))
        ).alias("g"),
    ).distinct()
    df_counts = grams.groupBy("g").agg(F.count("*").alias("_df"))
    scored = (
        grams.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).alias("n_novel"),
        )
        .select(
            "doc_id", F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(F.col("n_novel") / F.col("n_grams"), 4).alias("novelty"),
        )
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.coalesce("novelty", F.lit(1.0)).alias("novelty"),
        )
    )
