"""Block-max phrase WAND (wand_phrase_topk): the scale path for positional
queries, pinned bit-identical to the executor's phrase plan
(executor._c_phrase, mirroring the reference's positional.py::Phrase ->
SpanNear2 chain) across prune / verify-chunk / doc-shard / delete
configurations. Mirrors the reference's test_searching phrase cases plus
test_quality's pruned-equals-unpruned discipline.
"""

import shutil

import pytest

from whoosh_spark import query as Q
from whoosh_spark.fields import transcript_schema
from whoosh_spark.indexing.segments import (
    build_segments,
    delete_by_term,
    open_segments,
)
from whoosh_spark.search import Searcher
from whoosh_spark.search.wand import wand_phrase_topk
from whoosh_spark.transcripts import transcript_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    c = transcript_corpus(spark, SF).persist()
    c.count()
    return c


@pytest.fixture(scope="module")
def six(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("phrix") / "ix")
    build_segments(spark, corpus, transcript_schema(), path, n_segments=3)
    return open_segments(spark, path, corpus, transcript_schema())


# (words, slop): adjacent / slopped / 3-word chain / single word /
# duplicated word (two distinct occurrences required)
CASES = [
    (["hash", "join"], 1),
    (["hash", "join"], 2),
    (["data", "line"], 3),
    (["window", "merge", "join"], 2),
    (["spark"], 1),
    (["the", "the"], 1),  # stopword: absent from the index -> no matches
]


def _ref(six, words, slop, k=10):
    return [
        (r.doc_id, r.score)
        for r in Searcher(six).search(Q.Phrase("text", words, slop=slop), limit=k,
                                      optimize=False).collect()
    ]


def test_phrase_wand_pruned_equals_unpruned_equals_executor(six):
    for words, slop in CASES:
        ref = _ref(six, words, slop)
        for prune in (False, True):
            got = [
                (r.doc_id, r.score)
                for r in wand_phrase_topk(six, "text", words, slop=slop, prune=prune).collect()
            ]
            assert got == ref, (words, slop, prune)  # bit-exact


def test_phrase_wand_chunked_verify_early_exit(six):
    # verify_chunk=4 with k=3 forces multiple verify rounds and the
    # kth-score early exit; results must stay bit-identical
    for words, slop in ((["hash", "join"], 1), (["data", "line"], 3)):
        ref = _ref(six, words, slop, k=3)
        got = [
            (r.doc_id, r.score)
            for r in wand_phrase_topk(
                six, "text", words, slop=slop, k=3, verify_chunk=4
            ).collect()
        ]
        assert got == ref, (words, slop)


def test_phrase_wand_missing_word(six):
    # AND semantics: any absent word empties the phrase
    assert wand_phrase_topk(six, "text", ["hash", "zzzznope"]).count() == 0
    assert wand_phrase_topk(six, "text", ["zzzznope"]).count() == 0


def test_phrase_wand_shards_and_deletes(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("phrixdel") / "ix")
    build_segments(spark, corpus, transcript_schema(), path, n_segments=3)
    six0 = open_segments(spark, path, corpus, transcript_schema())
    assert wand_phrase_topk(six0, "text", ["hash", "join"]).count() > 0
    # delete every hash-containing doc; the phrase over the deleted index
    # must match the executor (which reads the same delete set)
    assert delete_by_term(spark, six0, "text", "hash") > 0
    six = open_segments(spark, path, corpus, transcript_schema())
    for words in (["hash", "join"], ["data", "line"]):
        ref = _ref(six, words, 1)
        for shard in (None, 50):  # 50-doc shards: straddling-block replication
            got = [
                (r.doc_id, r.score)
                for r in wand_phrase_topk(six, "text", words, shard_docs=shard).collect()
            ]
            assert got == ref, (words, shard)
    assert wand_phrase_topk(six, "text", ["hash", "join"]).count() == 0


def test_phrase_wand_non_scorable_field_raises(six):
    with pytest.raises(ValueError, match="scorable"):
        wand_phrase_topk(six, "role", ["user"])
