"""Logical query operators.

Mirrors the reference query tree (public Whoosh, src/whoosh/query/*):
qcore.py::Query (~L60) base with normalize/simplify; terms.py::Term/Prefix/
Wildcard/Regex/FuzzyTerm; compound.py::And/Or/AndNot/AndMaybe/Require/
DisjunctionMax; wrappers.py::Not/ConstantScoreQuery; positional.py::Phrase;
ranges.py::TermRange/NumericRange/DateRange; qcore.py::Every/_NullQuery.

These are plain dataclasses — compilation to DataFrame plans lives in
search/executor.py, keeping logical/physical separation like the reference
(Query tree vs Matcher tree).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Sequence


@dataclass(frozen=True)
class Query:
    boost: float = field(default=1.0, kw_only=True)

    def normalize(self) -> "Query":
        return self

    def with_boost(self, boost: float) -> "Query":
        return replace(self, boost=self.boost * boost)


@dataclass(frozen=True)
class NullQuery(Query):
    """Matches nothing (reference: qcore.py::_NullQuery ~L350)."""

    def normalize(self) -> Query:
        return self


_NULL = NullQuery()


@dataclass(frozen=True)
class Every(Query):
    """All documents (reference: qcore.py::Every ~L420); score 1.0 * boost."""

    fieldname: str | None = None


@dataclass(frozen=True)
class Term(Query):
    fieldname: str
    text: str


@dataclass(frozen=True)
class MultiTermQuery(Query):
    """Base for queries expanding against the lexicon
    (reference: query/terms.py::MultiTerm ~L150)."""

    fieldname: str


@dataclass(frozen=True)
class Prefix(MultiTermQuery):
    text: str


@dataclass(frozen=True)
class Wildcard(MultiTermQuery):
    """Glob pattern with * and ? (reference: terms.py::Wildcard ~L250)."""

    text: str

    def normalize(self) -> Query:
        # pure-literal -> Term; trailing-star-only -> Prefix (same rewrites
        # as the reference's Wildcard.normalize)
        t = self.text
        if "*" not in t and "?" not in t:
            return Term(self.fieldname, t, boost=self.boost)
        if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
            return Prefix(self.fieldname, t[:-1], boost=self.boost)
        return self


@dataclass(frozen=True)
class Regex(MultiTermQuery):
    text: str


@dataclass(frozen=True)
class FuzzyTerm(MultiTermQuery):
    """Terms within Levenshtein maxdist (default 1), sharing prefixlength
    (default 1) (reference: terms.py::FuzzyTerm ~L380)."""

    text: str
    maxdist: int = 1
    prefixlength: int = 1


# Irregular inflection groups (reference: lang/morph_en.py::variations —
# its rule table bakes in the common English irregulars; this is the
# public-knowledge core of that table: high-frequency irregular verbs and
# nouns). Any member of a group expands to the whole group.
_IRREGULAR_GROUPS: list[tuple[str, ...]] = [
    ("be", "am", "is", "are", "was", "were", "been", "being"),
    ("begin", "began", "begun", "beginning"),
    ("break", "broke", "broken", "breaking"),
    ("bring", "brought", "bringing"),
    ("build", "built", "building"),
    ("buy", "bought", "buying"),
    ("catch", "caught", "catching"),
    ("choose", "chose", "chosen", "choosing"),
    ("come", "came", "coming"),
    ("do", "does", "did", "done", "doing"),
    ("draw", "drew", "drawn", "drawing"),
    ("drive", "drove", "driven", "driving"),
    ("eat", "ate", "eaten", "eating"),
    ("fall", "fell", "fallen", "falling"),
    ("feel", "felt", "feeling"),
    ("find", "found", "finding"),
    ("get", "got", "gotten", "getting"),
    ("give", "gave", "given", "giving"),
    ("go", "goes", "went", "gone", "going"),
    ("grow", "grew", "grown", "growing"),
    ("have", "has", "had", "having"),
    ("hold", "held", "holding"),
    ("keep", "kept", "keeping"),
    ("know", "knew", "known", "knowing"),
    ("leave", "left", "leaving"),
    ("lose", "lost", "losing"),
    ("make", "made", "making"),
    ("mean", "meant", "meaning"),
    ("meet", "met", "meeting"),
    ("run", "ran", "runs", "running"),
    ("say", "said", "saying"),
    ("see", "saw", "seen", "seeing"),
    ("sell", "sold", "selling"),
    ("send", "sent", "sending"),
    ("sit", "sat", "sitting"),
    ("speak", "spoke", "spoken", "speaking"),
    ("spend", "spent", "spending"),
    ("stand", "stood", "standing"),
    ("take", "took", "taken", "taking"),
    ("teach", "taught", "teaching"),
    ("tell", "told", "telling"),
    ("think", "thought", "thinking"),
    ("understand", "understood", "understanding"),
    ("write", "wrote", "written", "writing"),
    ("child", "children"),
    ("foot", "feet"),
    ("goose", "geese"),
    ("man", "men"),
    ("mouse", "mice"),
    ("person", "people"),
    ("tooth", "teeth"),
    ("woman", "women"),
    ("leaf", "leaves"),
    ("life", "lives"),
    ("half", "halves"),
    ("knife", "knives"),
    # long tail (reference: lang/morph_en.py bakes these into its rule
    # table too; same public irregular-English inventory)
    ("bear", "bore", "borne", "bearing"),
    ("beat", "beaten", "beating"),
    ("become", "became", "becoming"),
    ("bend", "bent", "bending"),
    ("bind", "bound", "binding"),
    ("bite", "bit", "bitten", "biting"),
    ("blow", "blew", "blown", "blowing"),
    ("burst", "bursting"),
    ("cast", "casting"),
    ("cling", "clung", "clinging"),
    ("cost", "costing"),
    ("creep", "crept", "creeping"),
    ("cut", "cutting"),
    ("deal", "dealt", "dealing"),
    ("dig", "dug", "digging"),
    ("drink", "drank", "drunk", "drinking"),
    ("fight", "fought", "fighting"),
    ("flee", "fled", "fleeing"),
    ("fling", "flung", "flinging"),
    ("fly", "flew", "flown", "flying"),
    ("forbid", "forbade", "forbidden", "forbidding"),
    ("forget", "forgot", "forgotten", "forgetting"),
    ("forgive", "forgave", "forgiven", "forgiving"),
    ("freeze", "froze", "frozen", "freezing"),
    ("hang", "hung", "hanging"),
    ("hear", "heard", "hearing"),
    ("hide", "hid", "hidden", "hiding"),
    ("hit", "hitting"),
    ("hurt", "hurting"),
    ("lay", "laid", "laying"),
    ("lead", "led", "leading"),
    ("lend", "lent", "lending"),
    ("let", "letting"),
    ("lie", "lain", "lying"),
    ("light", "lit", "lighting"),
    ("pay", "paid", "paying"),
    ("put", "putting"),
    ("quit", "quitting"),
    ("read", "reading"),
    ("ride", "rode", "ridden", "riding"),
    ("ring", "rang", "rung", "ringing"),
    ("rise", "rose", "risen", "rising"),
    ("seek", "sought", "seeking"),
    ("set", "setting"),
    ("shake", "shook", "shaken", "shaking"),
    ("shed", "shedding"),
    ("shine", "shone", "shining"),
    ("shoot", "shot", "shooting"),
    ("show", "shown", "showing"),
    ("shrink", "shrank", "shrunk", "shrinking"),
    ("shut", "shutting"),
    ("sing", "sang", "sung", "singing"),
    ("sink", "sank", "sunk", "sinking"),
    ("sleep", "slept", "sleeping"),
    ("slide", "slid", "sliding"),
    ("sling", "slung", "slinging"),
    ("spin", "spun", "spinning"),
    ("split", "splitting"),
    ("spread", "spreading"),
    ("spring", "sprang", "sprung", "springing"),
    ("steal", "stole", "stolen", "stealing"),
    ("stick", "stuck", "sticking"),
    ("sting", "stung", "stinging"),
    ("strike", "struck", "striking"),
    ("swear", "swore", "sworn", "swearing"),
    ("sweep", "swept", "sweeping"),
    ("swim", "swam", "swum", "swimming"),
    ("swing", "swung", "swinging"),
    ("tear", "tore", "torn", "tearing"),
    ("throw", "threw", "thrown", "throwing"),
    ("tread", "trod", "trodden", "treading"),
    ("wake", "woke", "woken", "waking"),
    ("wear", "wore", "worn", "wearing"),
    ("weave", "wove", "woven", "weaving"),
    ("weep", "wept", "weeping"),
    ("win", "won", "winning"),
    ("wind", "wound", "winding"),
    ("wring", "wrung", "wringing"),
    ("ox", "oxen"),
    ("cactus", "cacti"),
    ("focus", "foci"),
    ("fungus", "fungi"),
    ("nucleus", "nuclei"),
    ("syllabus", "syllabi"),
    ("analysis", "analyses"),
    ("diagnosis", "diagnoses"),
    ("oasis", "oases"),
    ("thesis", "theses"),
    ("crisis", "crises"),
    ("basis", "bases"),
    ("axis", "axes"),
    ("phenomenon", "phenomena"),
    ("criterion", "criteria"),
    ("datum", "data"),
    ("medium", "media"),
    ("index", "indices", "indexes"),
    ("matrix", "matrices", "matrixes"),
    ("vertex", "vertices", "vertexes"),
    ("appendix", "appendices", "appendixes"),
    ("wife", "wives"),
    ("wolf", "wolves"),
    ("shelf", "shelves"),
    ("calf", "calves"),
    ("loaf", "loaves"),
    ("thief", "thieves"),
    ("self", "selves"),
    ("elf", "elves"),
]
_IRREGULAR: dict[str, frozenset] = {}
for _grp in _IRREGULAR_GROUPS:
    for _w in _grp:
        _IRREGULAR[_w] = _IRREGULAR.get(_w, frozenset()) | frozenset(_grp)

_VOWELS = "aeiou"


def variation_forms(word: str) -> list[str]:
    """Deterministic morphological candidates of ``word`` (reference:
    terms.py::Variations over lang/morph_en.py::variations): regular suffix
    rules + consonant doubling + the irregular table above. The list is
    static per word: lexicon intersection happens downstream, absent forms
    simply have no postings."""
    forms = {word}
    forms.update({word + "s", word + "es", word + "ed", word + "ing"})
    forms.update(_IRREGULAR.get(word, ()))
    if word.endswith("e") and len(word) > 2:
        forms.update({word[:-1] + "ing", word + "d",
                      word + "r", word + "st"})  # large -> larger/largest
    if word.endswith("y") and len(word) > 2:
        # happy -> happies/happied/happier/happiest/happily/happiness
        stem = word[:-1]
        forms.update({stem + "ies", stem + "ied", stem + "ier", stem + "iest",
                      stem + "ily", stem + "iness"})
    else:
        # fast -> faster/fastest/fastly(harmless)/fastness
        forms.update({word + "er", word + "est", word + "ly", word + "ness"})
    # CVC doubling: hop -> hopping/hopped/hopper
    if (
        len(word) >= 3
        and word[-1] not in _VOWELS + "wxy"
        and word[-2] in _VOWELS
        and word[-3] not in _VOWELS
    ):
        dbl = word + word[-1]
        forms.update({dbl + "ing", dbl + "ed", dbl + "er", dbl + "est"})
    # derivational families (reference: lang/morph_en.py — LiteMorph's
    # rule table also generates derivational candidates; erring wide is
    # safe because the lexicon intersection downstream prunes absent
    # forms, exactly like the reference's expansion-then-lookup)
    deriv_stems = {word}
    if word.endswith("e") and len(word) > 2:
        deriv_stems.add(word[:-1])  # compute -> computation/computable
    for stem in deriv_stems:
        for suf in ("ment", "ion", "ation", "ity", "able", "ible", "ive",
                    "al", "ous", "ful", "less", "ish", "ize"):
            forms.add(stem + suf)
            forms.add(stem + suf + "s")
        forms.update({stem + "ized", stem + "izing"})
    for suf in ("iness", "ness", "iest", "ily", "ier", "ing", "ied", "ies",
                "est", "ed", "er", "es", "ly", "s",
                "ations", "ation", "ments", "ment", "ions", "ion",
                "ity", "able", "ible", "ive", "ous", "ful", "less", "ish"):
        if word.endswith(suf) and len(word) - len(suf) >= 2:
            base = word[: len(word) - len(suf)]
            if suf in ("iness", "iest", "ily", "ier"):
                base = base + "y"  # happiest -> happy
            forms.add(base)
            if suf not in ("ly", "ness"):
                forms.add(base + "e")
            if suf in ("ations", "ation", "ions", "ion"):
                forms.add(base + "ate")  # activation -> activate
            # reverse doubling: hopping -> hop
            if len(base) >= 3 and base[-1] == base[-2] and base[-1] not in _VOWELS:
                forms.add(base[:-1])
    return sorted(forms)


@dataclass(frozen=True)
class Variations(MultiTermQuery):
    """Morphological variants of a word scored as an Or
    (reference: terms.py::Variations ~L450)."""

    text: str


@dataclass(frozen=True)
class TermRange(MultiTermQuery):
    start: str | None
    end: str | None
    startexcl: bool = False
    endexcl: bool = False


@dataclass(frozen=True)
class NumericRange(Query):
    """Native range predicate on the docs column — replaces the reference's
    tiered-term trick (ranges.py::NumericRange ~L200); Catalyst pushes the
    predicate into the scan."""

    fieldname: str
    start: Any
    end: Any
    startexcl: bool = False
    endexcl: bool = False


@dataclass(frozen=True)
class DateRange(NumericRange):
    pass


@dataclass(frozen=True)
class CompoundQuery(Query):
    subqueries: tuple[Query, ...]

    def __init__(self, subqueries: Sequence[Query], *, boost: float = 1.0):
        object.__setattr__(self, "subqueries", tuple(subqueries))
        object.__setattr__(self, "boost", boost)

    def _normalized_children(self) -> list[Query]:
        """Flatten same-class children, drop NullQuery, dedupe
        (reference: compound.py::CompoundQuery.normalize ~L150)."""
        out: list[Query] = []
        seen = set()
        for q in self.subqueries:
            q = q.normalize()
            if isinstance(q, NullQuery):
                continue
            if (
                type(q) is type(self)
                and q.boost == 1.0
                # a child carrying a non-default scoring knob (Or.scale /
                # Or.minmatch / DisMax.tiebreak) keeps its own group — the
                # knob's semantics would be lost in the parent's flat list
                and getattr(q, "scale", None) is None
                and getattr(q, "minmatch", 0) <= 1
                and getattr(q, "tiebreak", 0.0) == 0.0
            ):
                kids = q.subqueries  # type: ignore[attr-defined]
            else:
                kids = (q,)
            for k in kids:
                key = repr(k)
                if key not in seen:
                    seen.add(key)
                    out.append(k)
        return out


@dataclass(frozen=True)
class And(CompoundQuery):
    def normalize(self) -> Query:
        kids = self._normalized_children()
        # Not-pushdown: And(a, Not(b)) -> AndNot(And(a...), Or(b...))
        # (reference: compound.py::And.normalize -> AndNot extraction ~L280)
        pos = [k for k in kids if not isinstance(k, Not)]
        neg = [k.subquery for k in kids if isinstance(k, Not)]
        # Every-elimination: And(Every, a) -> a
        non_every = [k for k in pos if not isinstance(k, Every)]
        if len(non_every) < len(pos) and non_every:
            pos = non_every
        if not pos:
            if neg:
                pos = [Every()]
            else:
                return _NULL
        base: Query = pos[0] if len(pos) == 1 else And(pos, boost=1.0)
        if neg:
            base = AndNot(base, neg[0] if len(neg) == 1 else Or(neg))
        return base.with_boost(self.boost) if self.boost != 1.0 else base


@dataclass(frozen=True)
class Or(CompoundQuery):
    """Union of subqueries; scores sum over the matching children.

    ``minmatch``: a document qualifies only if it matches at least that
    many DISTINCT subqueries (reference: compound.py::Or.__init__
    ``minmatch=0`` — the documented contract of the constructor argument;
    0/1 mean plain union). ``scale``: coord scaling, see executor.
    """

    scale: float | None = field(default=None, kw_only=True)
    minmatch: int = field(default=0, kw_only=True)

    def normalize(self) -> Query:
        kids = self._normalized_children()
        if not kids or self.minmatch > len(kids):
            # fewer children than required matches -> can never qualify
            return _NULL
        if len(kids) == 1:
            return kids[0].with_boost(self.boost)
        q = Or(kids, scale=self.scale, minmatch=self.minmatch)
        return q.with_boost(self.boost) if self.boost != 1.0 else q


@dataclass(frozen=True)
class DisjunctionMax(CompoundQuery):
    tiebreak: float = field(default=0.0, kw_only=True)

    def normalize(self) -> Query:
        kids = self._normalized_children()
        if not kids:
            return _NULL
        if len(kids) == 1:
            return kids[0].with_boost(self.boost)
        q = DisjunctionMax(kids, tiebreak=self.tiebreak)
        return q.with_boost(self.boost) if self.boost != 1.0 else q


@dataclass(frozen=True)
class Not(Query):
    """Only meaningful nested in And (-> AndNot); standalone Not matches the
    complement with constant score (reference: wrappers.py::Not ~L40,
    matching/binary.py::InverseMatcher)."""

    subquery: Query

    def normalize(self) -> Query:
        sub = self.subquery.normalize()
        if isinstance(sub, NullQuery):
            return Every(boost=self.boost)
        return Not(sub, boost=self.boost)


@dataclass(frozen=True)
class BinaryQuery(Query):
    a: Query
    b: Query

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery):
            return _NULL
        if isinstance(b, NullQuery):
            return a.with_boost(self.boost)
        return type(self)(a, b, boost=self.boost)


@dataclass(frozen=True)
class AndNot(BinaryQuery):
    """Docs of a not matched by b (anti-join)."""


@dataclass(frozen=True)
class AndMaybe(BinaryQuery):
    """All docs of a; b's score added where it also matches (left outer)."""


@dataclass(frozen=True)
class Require(BinaryQuery):
    """Docs in both, scored only by a (semi-join)."""


@dataclass(frozen=True)
class Otherwise(BinaryQuery):
    """a if it matches anything, else b (reference: compound.py::Otherwise)."""

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery):
            return b.with_boost(self.boost)
        return Otherwise(a, b, boost=self.boost)


@dataclass(frozen=True)
class Phrase(Query):
    """Terms at consecutive positions within ``slop`` (default 1 = exact)
    (reference: positional.py::Phrase ~L150). Scored as the underlying
    conjunction (the reference routes Phrase through SpanNear2 over an
    IntersectionMatcher; the span wrapper filters but does not rescore)."""

    fieldname: str
    words: tuple[str, ...]
    slop: int = 1

    def __init__(self, fieldname: str, words: Sequence[str], slop: int = 1, *, boost: float = 1.0):
        object.__setattr__(self, "fieldname", fieldname)
        object.__setattr__(self, "words", tuple(words))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)

    def normalize(self) -> Query:
        if not self.words:
            return _NULL
        if len(self.words) == 1:
            return Term(self.fieldname, self.words[0], boost=self.boost)
        return self


@dataclass(frozen=True)
class ConstantScore(Query):
    subquery: Query
    score: float = 1.0

    def normalize(self) -> Query:
        sub = self.subquery.normalize()
        if isinstance(sub, NullQuery):
            return _NULL
        return ConstantScore(sub, self.score, boost=self.boost)


# ---------------------------------------------------------------- spans
# Positional algebra (reference: src/whoosh/query/spans.py::SpanNear2 ~L250,
# SpanOr, SpanNot, SpanFirst, SpanContains, SpanBefore; positional.py::
# Sequence ~L40 / Ordered). A span is a (start, end) position interval;
# compilation represents per-doc span sets as array<struct<s,e>> columns and
# combines them with JVM higher-order functions (search/executor.py).


@dataclass(frozen=True)
class SpanNear2(CompoundQuery):
    """Sub-spans within ``slop`` of each other (gap = next.start - prev.end
    in [mindist, slop]); ordered=False allows either arrangement."""

    slop: int = field(default=1, kw_only=True)
    ordered: bool = field(default=True, kw_only=True)
    mindist: int = field(default=1, kw_only=True)

    def normalize(self) -> Query:
        kids = [q.normalize() for q in self.subqueries]
        if any(isinstance(k, NullQuery) for k in kids):
            return _NULL
        if len(kids) == 1:
            return kids[0].with_boost(self.boost)
        return SpanNear2(kids, slop=self.slop, ordered=self.ordered,
                         mindist=self.mindist, boost=self.boost)


@dataclass(frozen=True)
class SpanOr(CompoundQuery):
    """Union of sub-span sets."""

    def normalize(self) -> Query:
        kids = [q.normalize() for q in self.subqueries
                if not isinstance(q.normalize(), NullQuery)]
        if not kids:
            return _NULL
        if len(kids) == 1:
            return kids[0].with_boost(self.boost)
        return SpanOr(kids, boost=self.boost)


@dataclass(frozen=True)
class SpanNot(BinaryQuery):
    """Spans of a that do not overlap any span of b."""


@dataclass(frozen=True)
class SpanContains(BinaryQuery):
    """Spans of a that contain at least one span of b."""


@dataclass(frozen=True)
class SpanBefore(BinaryQuery):
    """Spans of a that end before some span of b starts."""


@dataclass(frozen=True)
class SpanCondition(BinaryQuery):
    """Spans of a, kept only in docs where b ALSO matches — the span-level
    Require (reference: spans.py::SpanCondition: wraps IntersectionMatcher
    but takes spans exclusively from a)."""


@dataclass(frozen=True)
class SpanFirst(Query):
    """Spans ending at or before position ``limit``
    (reference: spans.py::SpanFirst)."""

    subquery: Query
    limit: int = 0

    def normalize(self) -> Query:
        sub = self.subquery.normalize()
        if isinstance(sub, NullQuery):
            return _NULL
        return SpanFirst(sub, self.limit, boost=self.boost)


def Sequence(subqueries: "Sequence[Query]", slop: int = 1, *, boost: float = 1.0) -> Query:
    """q1..qn in order, each within ``slop`` of the previous — phrase of
    subqueries (reference: positional.py::Sequence ~L40)."""
    return SpanNear2(list(subqueries), slop=slop, ordered=True, mindist=1, boost=boost)


def Ordered(subqueries: "Sequence[Query]", slop: int = 2**30, *, boost: float = 1.0) -> Query:
    """q1..qn anywhere in the doc but in order
    (reference: positional.py::Ordered)."""
    return SpanNear2(list(subqueries), slop=slop, ordered=True, mindist=1, boost=boost)
