"""Drop-in facade: create_in/open_dir/writer/searcher workflow parity
(reference: the test_indexing/test_searching usage idiom — build via
writer.add_document + commit, query via searcher.search returning Hits)."""

import pytest

from whoosh_spark import compat
from whoosh_spark.fields import ID, NUMERIC, Schema, TEXT


@pytest.fixture(scope="module")
def ixdir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compat") / "ix")
    schema = Schema(ID("docid", unique=True), TEXT("text"), ID("tag"), NUMERIC("n"))
    ix = compat.create_in(path, schema, spark)
    w = ix.writer()
    w.add_document(docid="a", text="hash join merge", tag="x", n=1)
    w.add_document(docid="b", text="spark spark join", tag="y", n=2)
    w.add_document(docid="c", text="window stream batch", tag="x", n=3)
    w.commit()
    return path


def test_writer_search_roundtrip(spark, ixdir):
    ix = compat.open_dir(ixdir, spark)  # schema restored from _schema.json
    assert ix.doc_count() == 3
    s = ix.searcher()
    hits = s.search("join")  # string query through the default parser
    assert {h["docid"] for h in hits} == {"a", "b"}
    assert all(isinstance(h.score, float) for h in hits)
    assert hits.scored_length() == 2
    # fielded query string + stored field access
    hits = s.search("tag:x AND merge")
    assert len(hits) == 1 and hits[0]["n"] == 1 and hits[0]["tag"] == "x"


def test_second_commit_and_update(spark, ixdir):
    ix = compat.open_dir(ixdir, spark)
    w = ix.writer()
    w.add_document(docid="d", text="vector join", tag="z", n=4)
    w.commit()
    assert ix.doc_count() == 4

    w = ix.writer()
    w.update_document(docid="b", text="rewritten text entirely", tag="y", n=2)
    w.commit()
    s = ix.searcher()
    assert ix.doc_count() == 4  # upsert: delete + re-add
    assert {h["docid"] for h in s.search("join")} == {"a", "d"}
    assert {h["docid"] for h in s.search("rewritten")} == {"b"}


def test_delete_and_optimize(spark, ixdir):
    ix = compat.open_dir(ixdir, spark)
    n = ix.doc_count()          # 4 live
    n_all = ix.doc_count_all()  # 5: the upserted-away old 'b' still counts
    assert n_all == n + 1
    assert ix.delete_by_term("docid", "a") > 0
    assert ix.doc_count() == n - 1
    assert ix.doc_count_all() == n_all  # lazy deletes still counted
    ix.optimize()  # expunge both the old 'b' and 'a'
    assert ix.doc_count() == n - 1
    assert ix.doc_count_all() == n - 1
    s = ix.searcher()
    assert {h["docid"] for h in s.search("join")} == {"d"}


def test_writer_cancel_and_double_commit(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compat2") / "ix")
    ix = compat.create_in(path, Schema(TEXT("text")), spark)
    w = ix.writer()
    w.add_document(text="alpha beta")
    w.cancel()
    assert ix.doc_count() == 0
    w = ix.writer()
    w.add_document(text="alpha beta")
    w.commit()
    with pytest.raises(ValueError):
        w.commit()
    assert ix.doc_count() == 1


def test_searcher_document_fetch(spark, ixdir):
    ix = compat.open_dir(ixdir, spark)
    s = ix.searcher()
    d = s.document(docid="c")
    assert d is not None and d["tag"] == "x" and d["n"] == 3
    assert s.document(docid="nope") is None
