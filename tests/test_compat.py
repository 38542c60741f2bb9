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


@pytest.fixture(scope="module")
def bigixdir(spark, tmp_path_factory):
    """A slightly larger corpus for paging/suggest/key-terms."""
    path = str(tmp_path_factory.mktemp("compat2") / "ix")
    schema = Schema(ID("docid", unique=True), TEXT("text"))
    ix = compat.create_in(path, schema, spark)
    w = ix.writer()
    for i in range(25):
        w.add_document(docid=f"d{i}", text=f"common filler plus shard{i % 3} query engine")
    w.add_document(docid="odd", text="completely different words here")
    w.commit()
    return path


def test_search_page(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    p1 = s.search_page("query engine", 1, pagelen=10)
    p3 = s.search_page("query engine", 3, pagelen=10)
    assert p1.pagenum == 1 and len(p1) == 10 and not p1.is_last_page()
    assert p3.offset == 20 and len(p3) == 5 and p3.is_last_page()
    # pages tile the full result list without overlap
    all_ids = [h.docnum for h in s.search("query engine", limit=None, unlimited=True)]
    paged = [h.docnum for n in (1, 2, 3)
             for h in s.search_page("query engine", n, pagelen=10)]
    assert paged == all_ids[:25]


def test_hit_highlights(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    hits = s.search("different words")
    assert len(hits) == 1
    hl = hits[0].highlights("text")
    assert "DIFFERENT" in hl and "WORDS" in hl
    html = hits[0].highlights("text", fmt="html")
    assert "<b" in html


def test_corrector_suggest(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    assert s.corrector("text").suggest("quary")[0] == "query"


def test_correct_query(spark, bigixdir):
    from whoosh_spark import query as Q

    s = compat.open_dir(bigixdir, spark).searcher()
    fixed = s.correct_query("quary engine")
    terms = {n.text for n in fixed.subqueries if isinstance(n, Q.Term)}
    assert terms == {"query", "engine"}


def test_key_terms_and_more_like(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    kt = s.key_terms([0, 1, 2], "text", numterms=3)
    assert len(kt) == 3 and all(isinstance(t, str) for t, _ in kt)
    seed = s.search("shard0")[0]
    like = s.more_like(seed.docnum, "text", limit=5)
    assert len(like) == 5
    assert all(h.docnum != seed.docnum for h in like)


def test_search_terms_matched(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    hits = s.search("shard0 OR different", terms=True, limit=None, unlimited=True)
    by_doc = {h["docid"]: h.matched_terms for h in hits}
    assert by_doc["odd"] == ["different"]
    assert by_doc["d0"] == ["shard0"]
    # default stays off
    assert s.search("different")[0].matched_terms is None


def test_add_dataframe_bulk_ingest(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("compat3") / "ix")
    schema = Schema(ID("docid", unique=True), TEXT("text"))
    ix = compat.create_in(path, schema, spark)
    df = spark.range(50).select(
        F.concat(F.lit("bulk"), F.col("id")).alias("docid"),
        F.concat(F.lit("bulk ingest row number "), F.col("id")).alias("text"),
        F.lit("extra").alias("ignored_extra_col"),
    )
    w = ix.writer()
    w.add_dataframe(df)
    w.add_document(docid="manual", text="manual ingest row")
    w.commit()
    assert ix.doc_count() == 51
    s = ix.searcher()
    assert len(s.search("bulk", limit=None, unlimited=True)) == 50
    assert {h["docid"] for h in s.search("manual")} == {"manual"}
    # missing schema columns are rejected up front
    import pytest as _pytest

    w2 = ix.writer()
    with _pytest.raises(ValueError):
        w2.add_dataframe(df.select("docid"))


def test_search_sortedby_respected(spark, ixdir):
    s = compat.open_dir(ixdir, spark).searcher()
    hits = s.search("tag:x", sortedby="n", reverse=True, limit=None, unlimited=True)
    ns = [h["n"] for h in hits]
    assert ns == sorted(ns, reverse=True)


def test_search_page_with_terms_kw(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    page = s.search_page("query engine", 1, pagelen=10, terms=True)
    assert len(page) == 10 and not page.is_last_page()
    assert all(h.matched_terms for h in page)


def test_search_limit_none_requires_optin(spark, tmp_path_factory):
    """Round-3 guard: facade search(limit=None) is an unbounded driver
    collect — it must demand the explicit unlimited=True opt-in (the
    engine Searcher's DataFrame API is the corpus-scale path)."""
    path = str(tmp_path_factory.mktemp("compat_guard") / "ix")
    ix = compat.create_in(path, Schema(ID("docid", unique=True), TEXT("text")), spark)
    w = ix.writer()
    w.add_document(docid="a", text="alpha join")
    w.add_document(docid="b", text="beta join")
    w.commit()
    s = ix.searcher()
    with pytest.raises(ValueError, match="unlimited=True"):
        s.search("join", limit=None)
    hits = s.search("join", limit=None, unlimited=True)
    assert {h["docid"] for h in hits} == {"a", "b"}


def test_doc_count_ignores_phantom_delete_ids(spark, tmp_path_factory):
    """Advice fix: delete-set ids that are not live docs (arbitrary ids
    handed to delete_docs) must not drag doc_count below the live total —
    the count goes through live_docs(), not doc_count_all - len(deletes)."""
    from whoosh_spark.indexing.segments import delete_docs

    path = str(tmp_path_factory.mktemp("compat_phantom") / "ix")
    ix = compat.create_in(path, Schema(TEXT("text")), spark)
    w = ix.writer()
    w.add_document(text="alpha")
    w.add_document(text="beta")
    w.add_document(text="gamma")
    w.commit()
    delete_docs(spark, ix.path, [10_000_001, 10_000_002])  # never-existed ids
    assert ix.doc_count() == 3
    # a real delete on top still counts correctly
    assert ix.delete_by_term("text", "alpha") > 0
    assert ix.doc_count() == 2


def test_reader_vocabulary_and_stats(spark, bigixdir):
    """CompatReader maps the reference IndexReader surface (reading.py::
    IndexReader): lexicon / contains / expand_prefix / term stats /
    most_frequent / most_distinctive."""
    import math

    r = compat.open_dir(bigixdir, spark).reader()
    lex = r.lexicon("text")
    assert lex == sorted(lex) and "query" in lex and "shard0" in lex
    assert ("text", "query") in r and ("text", "zzz") not in r
    assert r.expand_prefix("text", "shard") == ["shard0", "shard1", "shard2"]
    assert r.doc_frequency("text", "query") == 25
    assert r.frequency("text", "query") == 25.0
    assert r.doc_count() == 26 and r.doc_count_all() == 26
    # exact total token count: 25 six-token docs + one four-token doc
    assert r.field_length("text") == 25 * 6 + 4
    top = r.most_frequent_terms("text", number=5)
    assert [t for _, t in top] == ["common", "engine", "filler", "plus", "query"]
    assert all(w == 25.0 for w, _ in top)
    # tf-idf puts the shard terms first (df 8-9 vs 25), ties by term asc
    dis = r.most_distinctive_terms("text", number=3)
    assert [t for _, t in dis] == ["shard0", "shard1", "shard2"]
    assert dis[0][0] == pytest.approx(9 * math.log(26 / 9), rel=1e-6)
    assert r.most_frequent_terms("text", number=3, prefix="shard") == [
        (9.0, "shard0"), (8.0, "shard1"), (8.0, "shard2")]
    # all_terms streams the whole (field, term) vocabulary, sorted
    assert [t for f, t in r.all_terms() if f == "text"] == lex


def test_reader_lengths_docs_and_vectors(spark, bigixdir):
    """Quantized length accessors + stored-field/vector reads match the
    reference semantics (lengths roundtrip length_to_byte/byte_to_length)."""
    from whoosh_spark.util import quantized_length

    ix = compat.open_dir(bigixdir, spark)
    r, s = ix.reader(), ix.searcher()
    assert r.min_field_length("text") == quantized_length(4)
    assert r.max_field_length("text") == quantized_length(6)
    odd = s.document_number(docid="odd")
    assert odd is not None
    assert r.doc_field_length(odd, "text") == quantized_length(4)
    assert r.doc_field_length(10_000_001, "text", default=-1) == -1
    assert r.stored_fields(odd) == {"docid": "odd",
                                    "text": "completely different words here"}
    vec = r.vector(odd, "text")
    assert vec == [("completely", 1.0), ("different", 1.0),
                   ("here", 1.0), ("words", 1.0)]
    # streamed whole-corpus iterators
    assert sum(1 for _ in r.all_stored_fields()) == 26
    ids = list(r.all_doc_ids())
    assert len(ids) == 26 and odd in ids


def test_searcher_reader_passthroughs(spark, bigixdir):
    """Searcher proxies its reader like the reference: idf agrees with the
    scoring module, documents() streams matches."""
    s = compat.open_dir(bigixdir, spark).searcher()
    assert s.doc_frequency("text", "query") == 25
    assert s.frequency("text", "shard0") == 9.0
    assert "query" in s.lexicon("text")
    # idf = ln(N/(df+1)) + 1 with N = doc_count_all = 26, df(query) = 25
    assert s.idf("text", "query") == pytest.approx(1.0)
    assert s.doc_count() == 26 == s.doc_count_all()
    docs = list(s.documents(docid="odd"))
    assert len(docs) == 1 and docs[0]["docid"] == "odd"
    assert s.reader().doc_frequency("text", "query") == 25


def test_search_groupedby_and_filter_mask(spark, bigixdir):
    """search(groupedby=...) attaches facet groups over ALL matches
    (reference: Results.groups with OrderedList/Count/Best maptypes);
    filter=/mask= restrict without rescoring."""
    from whoosh_spark import query as Q

    ix = compat.open_dir(bigixdir, spark)
    s = ix.searcher()
    res = s.search("query engine", limit=5, groupedby="docid", maptype="count")
    assert len(res) == 5                       # top-k unchanged
    counts = res.groups()                      # name optional: one facet
    assert len(counts) == 25 and all(c == 1 for c in counts.values())

    # ordered-list maptype: every group lists its docnums in results order
    res = s.search(Q.Term("text", "shard0"), groupedby="docid")
    lists = res.groups("docid")
    assert len(lists) == 9 and all(len(v) == 1 for v in lists.values())

    # best maptype agrees with the list heads
    res = s.search(Q.Term("text", "shard0"), groupedby="docid", maptype="best")
    best = res.groups()
    assert best == {k: v[0] for k, v in lists.items()}

    with pytest.raises(KeyError):
        s.search("query").groups()

    # filter restricts to the shard0 docs; mask then removes them all
    filt = Q.Term("text", "shard0")
    hits = s.search("query engine", limit=None, unlimited=True, filter=filt)
    assert len(hits) == 9
    assert s.search("query engine", limit=None, unlimited=True,
                    filter=filt, mask=filt) == []


def test_context_managers(spark, tmp_path_factory):
    """The reference's canonical idioms: ``with ix.writer() as w:`` commits
    on clean exit and cancels when the block raised (writing.py::
    IndexWriter.__exit__); searcher/reader/index are context managers."""
    path = str(tmp_path_factory.mktemp("compat_ctx") / "ix")
    with compat.create_in(path, Schema(ID("docid", unique=True), TEXT("text")),
                          spark) as ix:
        with ix.writer() as w:
            w.add_document(docid="a", text="alpha join")
            w.add_document(docid="b", text="beta join")
        assert ix.doc_count() == 2  # auto-committed

        with pytest.raises(RuntimeError):
            with ix.writer() as w:
                w.add_document(docid="c", text="gamma")
                raise RuntimeError("abort")
        assert ix.doc_count() == 2  # cancelled, nothing visible

        with ix.searcher() as s:
            assert {h["docid"] for h in s.search("join")} == {"a", "b"}
        with ix.reader() as r:
            assert r.doc_frequency("text", "join") == 2


def test_index_freshness_and_generations(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compat_gen") / "ix")
    ix = compat.create_in(path, Schema(TEXT("text")), spark)
    assert ix.is_empty() and ix.latest_generation() == -1
    with ix.writer() as w:
        w.add_document(text="alpha beta")
    assert not ix.is_empty()
    g1 = ix.latest_generation()
    assert g1 >= 0 and ix.last_modified() > 0
    assert ix.up_to_date()  # writes through its own writer keep it current
    s = ix.searcher()
    other = compat.open_dir(ix.path, spark)
    with ix.writer() as w:
        w.add_document(text="gamma delta")
    assert ix.latest_generation() > g1
    assert ix.up_to_date()        # the committing handle
    assert not s.up_to_date()     # the searcher pins its open-time snapshot
    assert not other.up_to_date()  # a foreign handle went stale
    fresh = other.refresh()
    assert fresh.up_to_date() and fresh.doc_count() == 2
    # a bare delete (no TOC swap, just the id-set write) also flips freshness
    assert ix.delete_by_term("text", "alpha") > 0
    assert ix.up_to_date() and not fresh.up_to_date()


def test_hit_mapping_surface(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    h = s.search("different words")[0]
    assert "docid" in h and "nope" not in h
    assert sorted(h.keys()) == ["docid", "text"]
    assert dict(h.items())["docid"] == "odd"
    assert set(iter(h)) == {"docid", "text"} and len(h) == 2
    # both the attribute (this facade's historical spelling) and the
    # reference's method call return the stored fields
    assert h.fields["docid"] == "odd"
    assert h.fields() == dict(h.items())


def test_results_introspection_and_setops(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    broad = s.search("query engine", limit=None, unlimited=True)
    narrow = s.search("shard0", limit=None, unlimited=True)
    assert not broad.is_empty() and broad.estimated_length() == len(broad)
    assert narrow.docs() <= broad.docs() and len(narrow.docs()) == 9
    assert list(broad.items())[0] == (broad[0].docnum, broad[0].score)
    assert broad.fields(0) == dict(broad[0].items())
    assert broad.score(0) == broad[0].score
    assert broad.docnum(0) == broad[0].docnum

    # filter keeps the intersection (and is a no-op on an empty other)
    inter = s.search("query engine", limit=None, unlimited=True)
    inter.filter(narrow)
    assert inter.docs() == narrow.docs()
    inter.filter(compat.Results())
    assert inter.docs() == narrow.docs()

    # extend appends only new docs; upgrade floats the other set's docs up
    ext = s.search("shard0", limit=None, unlimited=True)
    ext.extend(broad)
    assert ext.docs() == broad.docs() and len(ext) == len(broad)
    up = s.search("query engine", limit=None, unlimited=True)
    up.upgrade(narrow)
    assert {h.docnum for h in up[:9]} == narrow.docs()
    uae = s.search("shard0", limit=None, unlimited=True)
    uae.upgrade_and_extend(broad)
    assert uae.docs() == broad.docs()

    # matched-terms + facet introspection + results-level key terms
    t = s.search("shard0 OR different", terms=True)
    assert t.has_matched_terms() and t.matched_terms() == {"shard0", "different"}
    assert not broad.has_matched_terms()
    with pytest.raises(ValueError):
        broad.matched_terms()
    g = s.search("query engine", groupedby="docid", maptype="count")
    assert g.facet_names() == ["docid"]
    assert broad.facet_names() == []
    kt = broad.key_terms("text", docs=10, numterms=3)
    assert len(kt) == 3 and all(isinstance(term, str) for term, _ in kt)


def test_reader_term_info_postings_and_iters(spark, bigixdir):
    from whoosh_spark.util import quantized_length

    r = compat.open_dir(bigixdir, spark).reader()
    ti = r.term_info("text", "shard0")
    assert ti.doc_frequency() == 9 and ti.weight() == 9.0
    assert ti.max_weight() == 1.0
    assert ti.min_id() == 0 and ti.max_id() == 24
    assert ti.min_length() == ti.max_length() == quantized_length(6)
    odd_ti = r.term_info("text", "different")
    assert odd_ti.min_id() == odd_ti.max_id() == 25
    assert odd_ti.min_length() == quantized_length(4)
    with pytest.raises(KeyError):
        r.term_info("text", "zzz_not_there")

    s = compat.open_dir(bigixdir, spark).searcher()
    shard0_ids = sorted(
        h.docnum for h in s.search("shard0", limit=None, unlimited=True))
    assert r.first_id("text", "shard0") == shard0_ids[0]
    assert r.first_id("text", "different") == odd_ti.min_id()
    with pytest.raises(KeyError):
        r.first_id("text", "zzz_not_there")

    posts = list(r.postings("text", "shard0"))
    assert posts == [(d, 1.0) for d in shard0_ids]

    by_prefix = list(r.iter_prefix("text", "shard"))
    assert [t for t, _ in by_prefix] == ["shard0", "shard1", "shard2"]
    assert [ti.doc_frequency() for _, ti in by_prefix] == [9, 8, 8]
    allf = list(r.iter_field("text"))
    assert [t for t, _ in allf] == r.lexicon("text")
    tail = list(r.iter_from("text", "shard1"))
    assert [t for t, _ in tail] == [t for t in r.lexicon("text") if t >= "shard1"]
    assert r.indexed_field_names() == ["docid", "text"]
    assert r.generation() >= 0


def test_reader_deletions_and_has_vector(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compat_del") / "ix")
    ix = compat.create_in(
        path, Schema(ID("docid", unique=True), TEXT("text")), spark)
    with ix.writer() as w:
        for i in range(4):
            w.add_document(docid=f"d{i}", text=f"shared word token{i}")
    s = ix.searcher()
    ids = {d: s.document_number(docid=f"d{d}") for d in range(4)}
    victim = ids[0]
    survivors = sorted(v for k, v in ids.items() if k != 0)
    r = ix.reader()
    assert not r.has_deletions() and r.deleted_count() == 0
    assert not r.is_deleted(victim)
    assert r.first_id("text", "shared") == min(ids.values())

    assert ix.delete_by_term("docid", "d0") == 1
    r = ix.reader()
    assert r.has_deletions() and r.deleted_count() == 1
    assert r.is_deleted(victim) and not r.is_deleted(survivors[0])
    # first_id skips deleted docs, like the reference's matcher
    assert r.first_id("text", "shared") == survivors[0]
    # the masked postings stream excludes the deleted doc too
    assert [d for d, _ in r.postings("text", "shared")] == survivors

    assert r.has_vector(survivors[0], "text")
    assert not r.has_vector(victim, "text")   # deleted -> masked out
    assert not r.has_vector(10_000, "text")   # no such doc
    assert not r.has_vector(survivors[0], "nope")  # not an indexed field


def test_searcher_suggest_and_document_numbers(spark, bigixdir):
    s = compat.open_dir(bigixdir, spark).searcher()
    assert s.suggest("text", "quary")[0] == "query"
    nums = list(s.document_numbers(docid="odd"))
    assert nums == [s.document_number(docid="odd")]
    assert list(s.document_numbers(docid="nope")) == []


def test_searcher_explain(spark, bigixdir):
    """explain(q, docnum): per-leaf contributions sum to the hit score."""
    ix = compat.open_dir(bigixdir, spark)
    with ix.searcher() as s:
        res = s.search("query engine", limit=1)
        assert len(res) > 0
        hit = res[0]
        parts = s.explain("query engine", hit.docnum)
        assert parts and all(f == "text" for f, _, _ in parts)
        assert {t for _, t, _ in parts} == {"query", "engine"}
        assert sum(sc for _, _, sc in parts) == pytest.approx(
            hit.score, rel=1e-9)
        # string and tree forms agree
        from whoosh_spark import query as Q

        tree = Q.And([Q.Term("text", "query"), Q.Term("text", "engine")])
        assert sorted(parts) == sorted(s.explain(tree, hit.docnum))


def test_corrector_spelling_words(spark, bigixdir):
    """corrector(field, spelling_words=...) suggests surface words from
    the spelling=True word graph instead of the lexicon."""
    ix = compat.open_dir(bigixdir, spark)
    with ix.searcher() as s:
        words = spark.createDataFrame(
            [("querying", 5.0), ("queried", 2.0)],
            "term string, total_weight double")
        got = s.corrector("text", spelling_words=words).suggest(
            "queryng", maxdist=2)
        assert got and got[0] == "querying"
        assert set(got) <= {"querying", "queried"}
        # default corrector still reads the lexicon
        assert "query" in s.corrector("text").suggest("querry")
