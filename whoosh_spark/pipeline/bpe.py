"""Byte-pair-encoding subword tokenizer: distributed training + encoding.

The standard BPE shape (Sennrich, Haddow & Birch, ACL 2016, "Neural
Machine Translation of Rare Words with Subword Units"): learn merge rules
on the WORD-FREQUENCY TABLE, then greedily apply them per word. The
corpus-scale stage is the word count — ONE groupBy over the tokenized
corpus (map-side combined; at 100 TB this is the same single-shuffle shape
as the lexicon build). The merge-rule loop then runs over the bounded
top-``max_vocab_words`` frequency table on the driver — the same
bounded-deterministic-sample discipline as IVF codebook training
(pipeline/similarity.py): the collected table is capped and ordered
(count DESC, word ASC), never the corpus. Encoding is a mapInArrow pass
with per-unique-word memoization (the dmetaphone per-unique-token
precedent, analysis.py), so hot words pay the merge walk once per batch.

Determinism: pair selection breaks count-ties on the lexicographically
smallest pair; the word table cap breaks count-ties on the word; both are
pinned in tests, so training is reproducible under any partitioning.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z0-9]+"
EOW = "</w>"  # end-of-word marker (Sennrich 2016 convention)

__all__ = ["bpe_word_counts", "bpe_train", "bpe_encode", "bpe_vocab", "EOW"]


def bpe_word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over lowercased ASCII word runs — the corpus-scale
    stage of BPE training: one map-side-combined groupBy, nothing else."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _pair_stats(vocab: dict) -> dict:
    pairs: dict = {}
    for syms, c in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + c
    return pairs


def _merge_vocab(vocab: dict, pair: tuple) -> dict:
    a, b = pair
    ab = a + b
    out: dict = {}
    for syms, c in vocab.items():
        merged = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + c
    return out


def bpe_train(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_vocab_words: int = 50_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules -> ordered [(left, right), ...].

    Distributed word count -> bounded top-``max_vocab_words`` table
    (count DESC, word ASC — the deterministic cap) -> driver-side greedy
    pair merging over that table (O(table x merges), corpus-independent).
    Stops early when the best pair's count drops below
    ``min_pair_count``.
    """
    rows = (
        bpe_word_counts(docs, text_col)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(int(max_vocab_words))
        .collect()
    )
    vocab = {tuple(r["word"]) + (EOW,): int(r["count"]) for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pairs = _pair_stats(vocab)
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair (deterministic)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The subword units the merge table can produce (merge outputs, in
    rule order) — base characters are implicit."""
    return [a + b for a, b in merges]


def _encode_word(word: str, ranks: dict, cache: dict) -> list[str]:
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = syms[best_i], syms[best_i + 1]
        # merge ALL adjacent (a, b) occurrences for this rule, left→right
        merged = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    cache[word] = syms
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table -> (doc_id, tokens array<string>,
    n_tokens). One mapInArrow pass; merge ranks ship in the closure
    (bounded: num_merges entries) and unique words memoize per batch."""
    import re

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    word_re = re.compile(WORD_RE)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cache: dict = {}
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            toks = []
            for t in texts:
                out: list[str] = []
                for w in word_re.findall((t or "").lower()):
                    out.extend(_encode_word(w, ranks, cache))
                toks.append(out)
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": ids,
                    "tokens": toks,
                    "n_tokens": [len(x) for x in toks],
                },
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()),
                        ("tokens", pa.list_(pa.string())),
                        ("n_tokens", pa.int32()),
                    ]
                ),
            )

    return docs.select(id_col, text_col).mapInArrow(
        gen, "doc_id long, tokens array<string>, n_tokens int"
    )
