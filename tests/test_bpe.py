"""BPE subword tokenizer: training determinism, canonical merges,
encode parity with a pure-python reference, roundtrip."""

from whoosh_spark.pipeline.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    bpe_vocab,
    bpe_word_counts,
)


def _corpus(spark):
    # the Sennrich et al. 2016 running example: low x5, lower x2,
    # newest x6, widest x3 (spread across docs/partitions)
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    rows = [(i, " ".join(words[i::4])) for i in range(4)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(3)


def test_word_counts(spark):
    wc = {r.word: r["count"] for r in bpe_word_counts(_corpus(spark)).collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_canonical_merges(spark):
    # hand-derived greedy merges with the (count DESC, pair ASC) tie-break:
    # (e,s)=9 beats (s,t)/(t,</w>) lexicographically, then chains to
    # est</w>; then (l,o)=7 beats (o,w)
    merges = bpe_train(_corpus(spark), num_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]
    assert bpe_vocab(merges) == ["es", "est", "est" + EOW, "lo"]


def test_train_partitioning_invariance(spark):
    c = _corpus(spark)
    assert bpe_train(c, 10) == bpe_train(c.repartition(11), 10)


def test_min_pair_count_stops(spark):
    docs = spark.createDataFrame([(0, "ab xy")], "doc_id long, text string")
    # every pair occurs once -> no merge survives min_pair_count=2
    assert bpe_train(docs, num_merges=10, min_pair_count=2) == []


def _reference_encode(text, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    out = []
    for w in re.findall("[a-z0-9]+", text.lower()):
        syms = list(w) + [EOW]
        while True:
            cand = [(ranks[p], i) for i, p in enumerate(zip(syms, syms[1:])) if p in ranks]
            if not cand:
                break
            _, i0 = min(cand)
            a, b = syms[i0], syms[i0 + 1]
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(syms)
    return out


def test_encode_matches_reference_and_roundtrip(spark):
    c = _corpus(spark)
    merges = bpe_train(c, num_merges=6)
    got = {r.doc_id: (list(r.tokens), r.n_tokens) for r in bpe_encode(c, merges).collect()}
    for row in c.collect():
        exp = _reference_encode(row.text, merges)
        assert got[row.doc_id] == (exp, len(exp))
        # roundtrip: stripping EOW markers reconstructs the word stream
        joined = "".join(got[row.doc_id][0]).replace(EOW, " ").strip()
        assert joined == row.text
    # 6 merges fully merge 'low': doc 0's text starts "low low ..."
    assert bpe_encode(c, merges).where("doc_id = 0").collect()[0].tokens[:4] == [
        "low", EOW, "low", EOW,
    ]


def test_encode_empty_and_unknown_chars(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, "@@!!"), (3, "zzz")],
        "doc_id long, text string",
    )
    got = {r.doc_id: list(r.tokens) for r in bpe_encode(docs, [("z", "z")]).collect()}
    assert got[0] == [] and got[1] == [] and got[2] == []
    assert got[3] == ["zz", "z", EOW]
