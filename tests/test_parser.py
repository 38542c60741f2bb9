"""Parser tests: query string -> query tree (mirrors whoosh test_parsing)."""

from datetime import datetime

from whoosh_spark import query as Q
from whoosh_spark.fields import transcript_schema
from whoosh_spark.query.parser import QueryParser


def p(s):
    return QueryParser("text", transcript_schema()).parse(s)


def test_single_term():
    assert p("spark") == Q.Term("text", "spark")


def test_implicit_and():
    assert p("hash join") == Q.And([Q.Term("text", "hash"), Q.Term("text", "join")])


def test_or():
    assert p("spark OR vector") == Q.Or([Q.Term("text", "spark"), Q.Term("text", "vector")])


def test_not():
    q = p("merge NOT window")
    assert q == Q.AndNot(Q.Term("text", "merge"), Q.Term("text", "window"))


def test_phrase():
    assert p('"hash join"') == Q.Phrase("text", ["hash", "join"])


def test_phrase_slop():
    assert p('"slow query"~2') == Q.Phrase("text", ["slow", "query"], slop=2)


def test_phrase_with_stopword_renumbers():
    # 'the' drops out of the phrase, remaining words stay consecutive
    assert p('"hash the join"') == Q.Phrase("text", ["hash", "join"])


def test_prefix():
    assert p("sca*") == Q.Prefix("text", "sca")


def test_wildcard():
    assert p("s?ark*") == Q.Wildcard("text", "s?ark*")


def test_fuzzy():
    assert p("querry~") == Q.FuzzyTerm("text", "querry", maxdist=1)
    assert p("querry~2") == Q.FuzzyTerm("text", "querry", maxdist=2)


def test_term_range():
    assert p("[batch TO filter]") == Q.TermRange("text", "batch", "filter", False, False)
    assert p("{batch TO filter}") == Q.TermRange("text", "batch", "filter", True, True)


def test_field_term():
    assert p("role:user AND spark") == Q.And(
        [Q.Term("role", "user"), Q.Term("text", "spark")]
    )


def test_numeric_range():
    q = p("turn_idx:[2 TO 5]")
    assert q == Q.NumericRange("turn_idx", 2, 5, False, False)


def test_date_range():
    q = p("ts:[20260101 TO 20260102]")
    assert isinstance(q, Q.DateRange)
    assert q.start == datetime(2026, 1, 1)
    assert q.end == datetime(2026, 1, 2, 23, 59, 59)


def test_boost_and_group():
    q = p("spark^2 OR (join AND batch)")
    assert q == Q.Or(
        [
            Q.Term("text", "spark", boost=2.0),
            Q.And([Q.Term("text", "join"), Q.Term("text", "batch")]),
        ]
    )


def test_all_stopword_query_is_null():
    # FIXTURES Q14: "the a x" -> everything filtered -> NullQuery
    assert p("the a x") == Q.NullQuery()


def test_tbd_is_stopword():
    # FIXTURES Q15 probe: 'tbd' is in Whoosh's stoplist, so it vanishes
    assert p("spark AND tbd") == Q.Term("text", "spark")


def test_every():
    assert p("*") == Q.Every()
    assert p("*:*") == Q.Every()


def test_andnot_andmaybe_ops():
    assert p("spark ANDNOT merge") == Q.AndNot(Q.Term("text", "spark"), Q.Term("text", "merge"))
    assert p("spark ANDMAYBE merge") == Q.AndMaybe(
        Q.Term("text", "spark"), Q.Term("text", "merge")
    )


def test_case_folding_of_terms():
    assert p("Spark SPARK") == Q.And([Q.Term("text", "spark"), Q.Term("text", "spark")]).normalize()
    # dedupe in normalize collapses to a single term
    assert p("Spark SPARK") == Q.Term("text", "spark")


def test_nested_groups():
    q = p("(spark OR vector) AND (hash OR join)")
    assert q == Q.And(
        [
            Q.Or([Q.Term("text", "spark"), Q.Term("text", "vector")]),
            Q.Or([Q.Term("text", "hash"), Q.Term("text", "join")]),
        ]
    )


def test_normalize_flattening():
    q = Q.And([Q.And([Q.Term("text", "a1"), Q.Term("text", "b1")]), Q.Term("text", "c1")])
    assert q.normalize() == Q.And(
        [Q.Term("text", "a1"), Q.Term("text", "b1"), Q.Term("text", "c1")]
    )


def test_normalize_single_child_unwrap():
    assert Q.Or([Q.Term("text", "x1")]).normalize() == Q.Term("text", "x1")


def test_normalize_every_elimination():
    q = Q.And([Q.Every(), Q.Term("text", "x1")])
    assert q.normalize() == Q.Term("text", "x1")


def test_one_word_phrase_becomes_term():
    assert Q.Phrase("text", ["solo"]).normalize() == Q.Term("text", "solo")


def test_natural_language_dates_with_basedate():
    from datetime import datetime

    from whoosh_spark.fields import DATETIME, ID, Schema, TEXT
    from whoosh_spark.query.parser import QueryParser

    schema = Schema(TEXT("text"), DATETIME("ts"))
    base = datetime(2024, 3, 15, 12, 30, 0)
    p = QueryParser("text", schema, basedate=base)
    q = p.parse("ts:yesterday")
    assert q.start == datetime(2024, 3, 14, 0, 0, 0)
    assert q.end == datetime(2024, 3, 14, 23, 59, 59)
    q2 = p.parse("ts:today")
    assert q2.start == datetime(2024, 3, 15, 0, 0, 0)
    q3 = p.parse("ts:-3days")
    assert q3.start == datetime(2024, 3, 12, 0, 0, 0)
    q4 = p.parse("ts:[-1week TO now]")
    assert q4.start == datetime(2024, 3, 8, 0, 0, 0)
    assert q4.end == base
    # without basedate, named dates are not resolved (deterministic parses)
    import pytest

    with pytest.raises(ValueError):
        QueryParser("text", schema).parse("ts:yesterday")


def test_nl_date_grammar_months_weekdays():
    """Round-2 grammar extension (reference qparser/dateparse.py): month
    names, last/next <weekday>, day-month forms, dashed ISO partials."""
    from whoosh_spark.fields import DATETIME, Schema, TEXT

    schema = Schema(TEXT("text"), DATETIME("ts"))
    base = datetime(2024, 3, 6, 12, 0, 0)  # a Wednesday
    pp = QueryParser("text", schema, basedate=base)

    q = pp.parse("ts:[jan 2024 TO feb 2024]")
    assert q.start == datetime(2024, 1, 1)
    assert q.end == datetime(2024, 2, 29, 23, 59, 59)  # leap year

    q = pp.parse('ts:"last tuesday"')
    assert q.start == datetime(2024, 3, 5, 0, 0, 0)
    assert q.end == datetime(2024, 3, 5, 23, 59, 59)

    q = pp.parse('ts:"next friday"')
    assert q.start == datetime(2024, 3, 8, 0, 0, 0)

    q = pp.parse('ts:"last wednesday"')  # strictly before basedate
    assert q.start == datetime(2024, 2, 28, 0, 0, 0)

    q = pp.parse('ts:"jan 15, 2024"')
    assert (q.start, q.end) == (datetime(2024, 1, 15), datetime(2024, 1, 15, 23, 59, 59))

    q = pp.parse('ts:"15 jan 2024"')
    assert q.start == datetime(2024, 1, 15)

    q = pp.parse("ts:december")  # bare month = basedate's year
    assert q.start == datetime(2024, 12, 1)
    assert q.end == datetime(2024, 12, 31, 23, 59, 59)

    q = pp.parse("ts:2024-02")  # dashed ISO month
    assert q.start == datetime(2024, 2, 1)
    assert q.end == datetime(2024, 2, 29, 23, 59, 59)

    q = pp.parse("ts:2024-02-10")  # dashed ISO day
    assert (q.start, q.end) == (datetime(2024, 2, 10), datetime(2024, 2, 10, 23, 59, 59))

    # month-with-year forms work WITHOUT a basedate (absolute)
    q = QueryParser("text", schema).parse("ts:[mar 2023 TO apr 2023]")
    assert q.start == datetime(2023, 3, 1)
    assert q.end == datetime(2023, 4, 30, 23, 59, 59)


def test_variation_forms_irregular():
    """morph_en irregular table: ran <-> run/running, geese <-> goose."""
    from whoosh_spark.query.nodes import variation_forms

    for w in ("ran", "run", "running"):
        forms = variation_forms(w)
        assert {"ran", "run", "runs", "running"} <= set(forms), (w, forms)
    assert "goose" in variation_forms("geese")
    assert "geese" in variation_forms("goose")
    assert "went" in variation_forms("go")
    assert "children" in variation_forms("child")
    # regular + doubling rules still hold
    assert "hopping" in variation_forms("hop")
    assert "hop" in variation_forms("hopping")
    assert "join" in variation_forms("joining")


def test_variation_forms_derivational():
    """morph_en long tail: derivational families generate both ways
    (absent forms are pruned by the lexicon intersection downstream)."""
    from whoosh_spark.query.nodes import variation_forms

    f = variation_forms("compute")
    assert {"computation", "computations", "computable", "computing",
            "computer"} <= set(f)
    g = variation_forms("computation")
    assert {"compute", "computate", "computations"} <= set(g)
    assert "activate" in variation_forms("activation")
    assert "optimization" in variation_forms("optimize")
    assert "optimize" in variation_forms("optimized")
    assert {"joinment", "joinable", "joinful"} <= set(variation_forms("join"))
    assert "align" in variation_forms("alignment")
    # generation stays bounded (query-side Or width)
    assert len(variation_forms("optimize")) < 100


def test_nl_time_of_day():
    from whoosh_spark.fields import DATETIME, Schema, TEXT

    schema = Schema(TEXT("text"), DATETIME("ts"))
    base = datetime(2024, 3, 6, 12, 0, 0)  # Wednesday
    pp = QueryParser("text", schema, basedate=base)

    q = pp.parse("ts:3pm")
    assert (q.start, q.end) == (datetime(2024, 3, 6, 15, 0, 0), datetime(2024, 3, 6, 15, 0, 59))
    q = pp.parse("ts:noon")
    assert q.start == datetime(2024, 3, 6, 12, 0, 0)
    q = pp.parse('ts:"yesterday 3pm"')
    assert q.start == datetime(2024, 3, 5, 15, 0, 0)
    q = pp.parse('ts:"last tuesday 9:30 am"')
    assert q.start == datetime(2024, 3, 5, 9, 30, 0)
    q = pp.parse('ts:"jan 15, 2024 23:45"')
    assert (q.start, q.end) == (datetime(2024, 1, 15, 23, 45, 0), datetime(2024, 1, 15, 23, 45, 59))
    q = pp.parse("ts:midnight")
    assert q.start == datetime(2024, 3, 6, 0, 0, 0)
    # plain year/month forms still resolve as ranges, not times
    q = pp.parse("ts:[jan 2024 TO feb 2024]")
    assert q.start == datetime(2024, 1, 1)


# ---------------------------------------------------------------- plugins
# Optional plugins, enabled explicitly like the reference's
# parser.add_plugin(GtLtPlugin()) (qparser/plugins.py::{GtLtPlugin,
# PlusMinusPlugin, RegexPlugin} are opt-in there too).


def pp_plugins(*names):
    pp = QueryParser("text", transcript_schema(), basedate=datetime(2024, 3, 6))
    for n in names:
        pp.add_plugin(n)
    return pp


def test_gtlt_numeric():
    pp = pp_plugins("gtlt")
    q = pp.parse("turn_idx:>5")
    assert isinstance(q, Q.NumericRange)
    assert (q.start, q.end, q.startexcl) == (5, None, True)
    q = pp.parse("turn_idx:>=5")
    assert (q.start, q.startexcl) == (5, False)
    q = pp.parse("turn_idx:<=7")
    assert (q.start, q.end, q.endexcl) == (None, 7, False)
    q = pp.parse("turn_idx:<7")
    assert (q.end, q.endexcl) == (7, True)


def test_gtlt_date_partial_resolves_to_span_edge():
    pp = pp_plugins("gtlt")
    q = pp.parse("ts:>2024-01")  # after January's end
    assert isinstance(q, Q.DateRange)
    assert q.start == datetime(2024, 1, 31, 23, 59, 59) and q.startexcl
    q = pp.parse("ts:>=2024-01")  # from January's start
    assert q.start == datetime(2024, 1, 1) and not q.startexcl
    q = pp.parse("ts:<2024-01")
    assert q.end == datetime(2024, 1, 1) and q.endexcl


def test_gtlt_term_range():
    pp = pp_plugins("gtlt")
    q = pp.parse("role:>m")
    assert isinstance(q, Q.TermRange)
    assert (q.start, q.startexcl) == ("m", True)


def test_gtlt_disabled_by_default():
    pp = QueryParser("text", transcript_schema())
    q = pp.parse("role:>m")  # '>' is just a word char without the plugin
    assert isinstance(q, Q.Term)


def test_plusminus_group():
    pp = pp_plugins("plusminus")
    q = pp.parse("+alpha -beta gamma")
    assert isinstance(q, Q.AndNot)
    assert isinstance(q.a, Q.AndMaybe)
    assert q.a.a == Q.Term("text", "alpha")
    assert q.a.b == Q.Term("text", "gamma")
    assert q.b == Q.Term("text", "beta")


def test_plusminus_unmarked_terms_are_optional():
    pp = pp_plugins("plusminus")
    q = pp.parse("alpha beta")
    assert isinstance(q, Q.Or)


def test_plusminus_only_required():
    pp = pp_plugins("plusminus")
    q = pp.parse("+alpha +beta")
    assert isinstance(q, Q.And)
    assert len(q.subqueries) == 2


def test_plusminus_bare_sign_binds_phrase():
    pp = pp_plugins("plusminus")
    q = pp.parse('+alpha -"bad phrase"')
    assert isinstance(q, Q.AndNot)
    assert isinstance(q.b, Q.Phrase)
    assert q.b.words == ("bad", "phrase")


def test_regex_plugin():
    pp = pp_plugins("regex")
    q = pp.parse('r"colou?r"')
    assert q == Q.Regex("text", "colou?r")
    q = pp.parse('role:r"us.r"')
    assert q == Q.Regex("role", "us.r")


def test_unknown_plugin_rejected():
    import pytest

    with pytest.raises(ValueError):
        pp_plugins("nosuch")


def test_multifield_plugins_passthrough():
    from whoosh_spark.query.parser import MultifieldParser

    pp = MultifieldParser(["text", "role"], transcript_schema(),
                          plugins=("plusminus", "gtlt"))
    q = pp.parse("+alpha -beta")
    assert isinstance(q, Q.AndNot)
    assert isinstance(q.a, Q.Or) and len(q.a.subqueries) == 2  # field fan-out
    q = pp.parse("turn_idx:>5")
    assert isinstance(q, Q.NumericRange) and q.startexcl


def test_regex_requires_adjacent_quote():
    pp = pp_plugins("regex")
    q = pp.parse('r "colou?r"')  # space: the r is just a (dropped) word
    assert not isinstance(q, Q.Regex)
    assert pp.parse('role:r"us.r"') == Q.Regex("role", "us.r")


def test_gtlt_reversed_forms():
    pp = pp_plugins("gtlt")
    q = pp.parse("turn_idx:=>5")  # reference GtLt accepts => for >=
    assert isinstance(q, Q.NumericRange)
    assert (q.start, q.end, q.startexcl) == (5, None, False)
    q = pp.parse("turn_idx:=<5")
    assert (q.start, q.end, q.endexcl) == (None, 5, False)


def test_plusminus_free_standing_hyphen_is_not_a_sign():
    pp = pp_plugins("plusminus")
    q = pp.parse("alpha - beta")  # hyphen word, dropped by the analyzer
    assert isinstance(q, Q.Or)
    assert {t.text for t in q.subqueries} == {"alpha", "beta"}


def test_multifield_regex_fans_out():
    from whoosh_spark.query.parser import MultifieldParser

    pp = MultifieldParser(["text", "role"], transcript_schema(),
                          plugins=("regex",))
    q = pp.parse('r"colou?r"')
    assert isinstance(q, Q.Or)
    assert set(map(type, q.subqueries)) == {Q.Regex}
    assert {s.fieldname for s in q.subqueries} == {"text", "role"}
    # the stream position advanced past the phrase exactly once: a
    # following word still parses
    q2 = pp.parse('r"colou?r" alpha')
    assert isinstance(q2, Q.And) and len(q2.subqueries) == 2


def test_field_aliases():
    pp = QueryParser("text", transcript_schema(),
                     fieldaliases={"who": "role", "body": "text"})
    q = pp.parse("who:user body:alpha")
    assert q == Q.And([Q.Term("role", "user"), Q.Term("text", "alpha")])
    # unaliased names and unknown aliases behave as before
    q = pp.parse("role:user nosuch:alpha")
    subs = q.subqueries
    assert subs[0] == Q.Term("role", "user")
    assert subs[1].fieldname == "text"  # nosuch: stays part of the word


def test_single_quoted_verbatim_terms():
    """SingleQuotePlugin (reference default set): quoted text is ONE
    verbatim term — spaces kept, no analysis."""
    q = p("role:'tool: web search'")
    assert q == Q.Term("role", "tool: web search")
    q = p("'verbatim term'")
    assert q == Q.Term("text", "verbatim term")
    q = p("hello 'role x' world")
    assert [getattr(s, "text", None) for s in q.subqueries] == [
        "hello", "role x", "world"]
    # NUMERIC/DATETIME fields still interpret the quoted value
    assert isinstance(p("turn_idx:'7'"), Q.NumericRange)
    # an unpaired apostrophe degrades to plain words (don't -> don)
    q = p("don't care")
    assert {s.text for s in q.subqueries} == {"don", "care"}


def test_copyfield_term():
    # reference: qparser/plugins.py::CopyFieldPlugin docstring example —
    # "hello name:matt" with {"name": "author"} -> hello (name:matt OR author:matt)
    qp = QueryParser("text", transcript_schema(), copyfields={"role": "tool"})
    q = qp.parse("hello role:user")
    assert q == Q.And([
        Q.Term("text", "hello"),
        Q.Or([Q.Term("role", "user"), Q.Term("tool", "user")]),
    ])


def test_copyfield_only_explicit_fields():
    # an unfielded word resolved to the default field is NOT copied
    qp = QueryParser("text", transcript_schema(), copyfields={"text": "tool"})
    assert qp.parse("hello") == Q.Term("text", "hello")
    assert qp.parse("text:hello") == Q.Or(
        [Q.Term("text", "hello"), Q.Term("tool", "hello")])


def test_copyfield_mirror_and_multiterm():
    qp = QueryParser("text", transcript_schema())
    qp.add_copyfield({"role": "tool"}, mirror=True)
    assert qp.parse("tool:grep*") == Q.Or(
        [Q.Prefix("tool", "grep"), Q.Prefix("role", "grep")])
    assert qp.parse("role:a?min") == Q.Or(
        [Q.Wildcard("role", "a?min"), Q.Wildcard("tool", "a?min")])


def test_copyfield_and_group_and_boost():
    qp = QueryParser("text", transcript_schema(),
                     copyfields={"role": "tool"}, copyfield_group="and")
    q = qp.parse("role:user^2")
    assert q == Q.And([Q.Term("role", "user"), Q.Term("tool", "user")],
                      boost=2.0)


def test_copyfield_bad_group_rejected():
    import pytest

    qp = QueryParser("text", transcript_schema())
    with pytest.raises(ValueError):
        qp.add_copyfield({"a": "b"}, group="xor")


def test_variation_forms_long_tail_irregulars():
    from whoosh_spark.query.nodes import variation_forms

    # verb chains (reference: lang/morph_en.py irregular inventory)
    for grp in [("drink", "drank", "drunk"), ("throw", "threw", "thrown"),
                ("seek", "sought"), ("freeze", "froze", "frozen")]:
        for w in grp:
            forms = variation_forms(w)
            assert all(g in forms for g in grp), (w, forms)
    # latin/greek plurals
    assert "analyses" in variation_forms("analysis")
    assert "analysis" in variation_forms("analyses")
    assert "indices" in variation_forms("index")
    assert "matrix" in variation_forms("matrices")
    assert "criteria" in variation_forms("criterion")


def test_variation_forms_derivational():
    from whoosh_spark.query.nodes import variation_forms

    forms = variation_forms("happy")
    assert {"happier", "happiest", "happily", "happiness"} <= set(forms)
    # and back: derived form recovers the base
    assert "happy" in variation_forms("happiest")
    assert "happy" in variation_forms("happily")
    assert "happy" in variation_forms("happiness")
    assert {"faster", "fastest"} <= set(variation_forms("fast"))
    assert "fast" in variation_forms("fastest")
    assert {"larger", "largest"} <= set(variation_forms("large"))
    assert "large" in variation_forms("largest")
