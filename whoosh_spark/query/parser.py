"""Query-string parser.

Driver-side port of the reference's default parser surface
(src/whoosh/qparser/default.py::QueryParser.parse ~L250 with the default
plugin set, qparser/plugins.py ~L60-1400): fields (``field:term``), quoted
phrases with slop (``"a b"~2``), ranges (``[a TO b]``, ``{a TO b}``),
groups, AND/OR/NOT/ANDNOT/ANDMAYBE operators (implicit adjacency = AND, the
default AndGroup), boosts (``^2``), wildcards (``ab*c?``), prefixes
(``abc*``), fuzzy (``word~1``), and every (``*:*``).

Implemented as a hand-rolled scanner + recursive descent instead of the
reference's tagger/filter plugin pipeline — same grammar, ~10x less code,
and there is no Spark involvement at all (parsing is pure driver work, like
the reference).

Query-time analysis parity: word terms on TEXT fields run through the same
analyzer chain as indexed text; stopword-only words vanish from their group
(the reference marks them as None and drops them), so ``the a x`` parses to
nothing and matches nothing (FIXTURES Q14).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from whoosh_spark.analysis import analyze_text
from whoosh_spark.fields import Schema
from whoosh_spark.query import nodes as Q

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<phrase_slop>\d+))?)
  | (?P<squote>'(?P<squote_body>[^']*)')
  | (?P<range>[\[{](?P<range_body>[^\]}]*)[\]}])
  | (?P<word>[^\s()\[\]{}"^']+)
  | (?P<boost>\^(?P<boost_val>\d+(?:\.\d+)?))
""",
    re.VERBOSE,
)

_OPS = {"AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "TO"}


@dataclass
class _Tok:
    kind: str
    text: str
    slop: int = 1
    boost: float | None = None
    startexcl: bool = False
    endexcl: bool = False
    glued: bool = False  # no whitespace between this token and the previous


def _scan(s: str) -> list[_Tok]:
    out: list[_Tok] = []
    pos = 0
    prev_end = -1  # end offset of the previous non-ws token
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            pos += 1
            continue
        glued = m.start() == prev_end
        pos = m.end()
        if m.group("ws"):
            continue
        prev_end = m.end()
        if m.group("lparen"):
            out.append(_Tok("(", "(", glued=glued))
        elif m.group("rparen"):
            out.append(_Tok(")", ")", glued=glued))
        elif m.group("phrase") is not None:
            slop = int(m.group("phrase_slop") or 1)
            out.append(_Tok("phrase", m.group("phrase_body"), slop=slop,
                            glued=glued))
        elif m.group("squote") is not None:
            out.append(_Tok("squote", m.group("squote_body"), glued=glued))
        elif m.group("range") is not None:
            tok = _Tok("range", m.group("range_body"), glued=glued)
            tok.startexcl = m.group("range").startswith("{")
            tok.endexcl = m.group("range").endswith("}")
            out.append(tok)
        elif m.group("boost") is not None:
            out.append(_Tok("^", m.group("boost_val"), glued=glued))
        else:
            w = m.group("word")
            if w in _OPS:
                out.append(_Tok("op", w, glued=glued))
            else:
                out.append(_Tok("word", w, glued=glued))
    return out


class QueryParser:
    """parser = QueryParser("text", schema); parser.parse("hash join")

    ``basedate`` anchors the natural-language date subset on DATETIME
    fields (reference: qparser/dateparse.py::DateParserPlugin, which
    defaults basedate to now; here it must be explicit so parses are
    deterministic): ``ts:yesterday``, ``ts:today``, ``ts:tomorrow``,
    ``ts:now``, and ``ts:'-3days'`` / ``ts:'+2weeks'`` relative offsets."""

    def __init__(self, default_field: str, schema: Schema,
                 basedate: datetime | None = None,
                 plugins: tuple[str, ...] = (),
                 fieldaliases: dict[str, str] | None = None,
                 copyfields: dict[str, str] | None = None,
                 copyfield_mirror: bool = False,
                 copyfield_group: str = "or",
                 analyzer_overrides: "dict | None" = None):
        self.default_field = default_field
        self.schema = schema
        # per-field query-analyzer override (field -> AnalyzerSpec): the
        # query-side language selector for MULTILANG_TEXT routed indexes
        # — e.g. analyzer_overrides={"text": LANGUAGE("de")} analyzes the
        # query with the German chain while the index stays per-row
        # routed (fields.py::MULTILANG_TEXT; query-side analysis
        # otherwise uses the field's default spec)
        self.analyzer_overrides = dict(analyzer_overrides or {})
        self.basedate = basedate
        self.plugins = set(plugins)
        # FieldAliasPlugin (reference: qparser/plugins.py::FieldAliasPlugin,
        # opt-in): alias -> real schema field, applied at field resolution
        self.fieldaliases = dict(fieldaliases or {})
        self.copyfields: dict[str, str] = {}
        self.copyfield_group = copyfield_group
        if copyfields:
            self.add_copyfield(copyfields, mirror=copyfield_mirror,
                               group=copyfield_group)

    def add_copyfield(self, fieldmap: dict[str, str], mirror: bool = False,
                      group: str = "or") -> None:
        """CopyFieldPlugin (reference: qparser/plugins.py::CopyFieldPlugin,
        opt-in): an explicitly-fielded leaf whose field is a key of
        ``fieldmap`` is replaced by a group containing the original plus a
        copy re-pointed at the mapped field — ``name:matt`` with
        ``{"name": "author"}`` becomes ``(name:matt OR author:matt)``.
        ``mirror=True`` also maps values back to keys; ``group`` picks the
        combining group (``"or"`` like the reference's OrGroup default, or
        ``"and"``). Like the reference, only *explicit* field prefixes
        trigger the copy — unfielded words resolved to the default field
        are untouched (the reference's filter runs on fieldname syntax
        nodes before the default field is applied)."""
        if group not in ("or", "and"):
            raise ValueError(f"copyfield group must be 'or' or 'and': {group!r}")
        self.copyfields.update(fieldmap)
        if mirror:
            self.copyfields.update({v: k for k, v in fieldmap.items()})
        self.copyfield_group = group

    def add_plugin(self, name: str) -> None:
        """Enable an optional plugin by name, mirroring the reference's
        ``parser.add_plugin(GtLtPlugin())`` idiom
        (src/whoosh/qparser/plugins.py::{GtLtPlugin, PlusMinusPlugin,
        RegexPlugin} — all opt-in there too). Names: ``gtlt`` (``field:>5``,
        ``>=``, ``<``, ``<=``), ``plusminus`` (``+required -prohibited``
        with unmarked terms optional), ``regex`` (``r"pattern"``)."""
        if name not in ("gtlt", "plusminus", "regex"):
            raise ValueError(f"unknown plugin: {name!r}")
        self.plugins.add(name)

    # grammar: or_expr := and_expr (OR and_expr)*
    #          and_expr := bin_expr ((AND)? bin_expr)*      (adjacency = AND)
    #          bin_expr := unary ((ANDNOT|ANDMAYBE) unary)*
    #          unary := NOT unary | atom [^boost]

    def parse(self, text: str, normalize: bool = True) -> Q.Query:
        self._toks = _scan(text)
        self._i = 0
        q = self._or_expr()
        if q is None:
            q = Q.NullQuery()
        return q.normalize() if normalize else q

    # ------------------------------------------------------------- helpers

    def _peek(self) -> _Tok | None:
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _next(self) -> _Tok | None:
        t = self._peek()
        if t is not None:
            self._i += 1
        return t

    def _at_op(self, *names: str) -> bool:
        t = self._peek()
        return t is not None and t.kind == "op" and t.text in names

    # ------------------------------------------------------------- grammar

    def _or_expr(self) -> Q.Query | None:
        parts = []
        left = self._and_expr()
        if left is not None:
            parts.append(left)
        while self._at_op("OR"):
            self._next()
            right = self._and_expr()
            if right is not None:
                parts.append(right)
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else Q.Or(parts)

    def _and_expr(self) -> Q.Query | None:
        if "plusminus" in self.plugins:
            return self._plusminus_expr()
        parts = []
        while True:
            if self._at_op("AND"):
                self._next()
                continue
            t = self._peek()
            if t is None or t.kind == ")" or self._at_op("OR", "ANDNOT", "ANDMAYBE"):
                break
            p = self._bin_expr()
            if p is not None:
                parts.append(p)
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else Q.And(parts)

    def _plusminus_expr(self) -> Q.Query | None:
        """PlusMinusPlugin group semantics (reference: qparser/plugins.py::
        PlusMinusPlugin.do_plusminus): ``+x`` required, ``-x`` prohibited,
        unmarked terms optional — the group becomes
        AndNot(AndMaybe(And(required), Or(optional)), Or(banned)) with the
        degenerate cases simplified away."""
        required: list[Q.Query] = []
        optional: list[Q.Query] = []
        banned: list[Q.Query] = []
        while True:
            if self._at_op("AND"):
                self._next()
                continue
            t = self._peek()
            if t is None or t.kind == ")" or self._at_op("OR", "ANDNOT", "ANDMAYBE"):
                break
            sign = None
            nxt = self._toks[self._i + 1] if self._i + 1 < len(self._toks) else None
            if (t.kind == "word" and t.text in ("+", "-")
                    and nxt is not None and nxt.glued):
                # bare sign binds to an ADJACENT following token
                # (-"bad phrase"); a free-standing hyphen between words is
                # just a word the analyzer drops (reference: PlusMinusPlugin
                # tags +/- only when followed by non-whitespace)
                sign = t.text
                self._next()
            elif t.kind == "word" and len(t.text) > 1 and t.text[0] in "+-":
                sign = t.text[0]
                self._toks[self._i] = _Tok("word", t.text[1:], slop=t.slop)
            p = self._bin_expr()
            if p is None:
                continue
            (required if sign == "+" else banned if sign == "-" else optional).append(p)
        pos: Q.Query | None = None
        if required:
            pos = required[0] if len(required) == 1 else Q.And(required)
            if optional:
                pos = Q.AndMaybe(pos, optional[0] if len(optional) == 1 else Q.Or(optional))
        elif optional:
            pos = optional[0] if len(optional) == 1 else Q.Or(optional)
        if banned:
            neg = banned[0] if len(banned) == 1 else Q.Or(banned)
            return Q.AndNot(pos, neg) if pos is not None else Q.Not(neg)
        return pos

    def _bin_expr(self) -> Q.Query | None:
        left = self._unary()
        while self._at_op("ANDNOT", "ANDMAYBE"):
            op = self._next().text
            right = self._unary()
            if left is None:
                left = right
            elif right is not None:
                left = Q.AndNot(left, right) if op == "ANDNOT" else Q.AndMaybe(left, right)
        return left

    def _unary(self) -> Q.Query | None:
        if self._at_op("NOT"):
            self._next()
            sub = self._unary()
            return Q.Not(sub) if sub is not None else None
        return self._atom()

    def _atom(self) -> Q.Query | None:
        t = self._next()
        if t is None:
            return None
        field = None  # None = unfielded (MultifieldParser fans these out)
        if t.kind == "word" and ":" in t.text and not t.text.startswith(":"):
            maybe_field, rest = t.text.split(":", 1)
            maybe_field = self.fieldaliases.get(maybe_field, maybe_field)
            if maybe_field in self.schema or maybe_field == "*":
                field = maybe_field
                if rest:
                    t = _Tok("word", rest)
                else:
                    t = self._next()
                    if t is None:
                        return None
        q = self._leaf(t, field)
        if (q is not None and field is not None and field in self.copyfields):
            q = _copy_leaves(q, self.copyfields, self.copyfield_group)
        # boost suffix
        nxt = self._peek()
        if q is not None and nxt is not None and nxt.kind == "^":
            self._next()
            q = q.with_boost(float(nxt.text))
        return q

    def _leaf(self, t: _Tok, field: str | None) -> Q.Query | None:
        """Resolve an unfielded leaf to the default field; MultifieldParser
        overrides this to fan out over its field list."""
        return self._atom_body(t, field if field is not None else self.default_field)

    def _atom_body(self, t: _Tok, field: str) -> Q.Query | None:
        if ("regex" in self.plugins and t.kind == "word" and t.text == "r"
                and self._peek() is not None and self._peek().kind == "phrase"
                and self._peek().glued):
            # RegexPlugin syntax r"pattern" — the quote must be adjacent to
            # the r, so a bare word r before a quoted phrase stays a phrase
            # (reference: qparser/plugins.py::RegexPlugin, opt-in there too)
            return Q.Regex(field, self._next().text)
        if t.kind == "(":
            q = self._or_expr()
            if self._peek() is not None and self._peek().kind == ")":
                self._next()
            return q
        if t.kind == "phrase":
            fs = self.schema[field] if field in self.schema else None
            if fs is not None and fs.kind == "datetime":
                # quoted date phrase: ts:"last tuesday", ts:"jan 15, 2024"
                # (reference: DateParserPlugin consumes quoted date text)
                lo, hi = _date_bounds(t.text, self.basedate)
                return Q.DateRange(field, lo, hi)
            words = [w for w, _ in analyze_text(t.text, self._analyzer(field))]
            if not words:
                return None
            if len(words) == 1:
                return Q.Term(field, words[0])
            return Q.Phrase(field, words, slop=t.slop)
        if t.kind == "range":
            return self._range(t, field)
        if t.kind == "squote":
            # SingleQuotePlugin (reference: qparser/plugins.py::
            # SingleQuotePlugin, in the DEFAULT set): the quoted text is one
            # verbatim term — spaces and punctuation kept, no analysis
            # (the reference's use case: ID/KEYWORD values with spaces).
            # DATETIME/NUMERIC fields still interpret the quoted value
            # (ts:'-3days', the relative-offset syntax).
            fs = self.schema[field] if field in self.schema else None
            if fs is not None and fs.kind == "datetime":
                lo, hi = _date_bounds(t.text, self.basedate)
                return Q.DateRange(field, lo, hi)
            if fs is not None and fs.kind == "numeric":
                v = _num(t.text)
                return Q.NumericRange(field, v, v)
            return Q.Term(field, t.text)
        if t.kind == "word":
            return self._word(t.text, field)
        return None

    def _analyzer(self, field: str):
        ov = self.analyzer_overrides.get(field)
        if ov is not None:
            return ov
        fs = self.schema[field] if field in self.schema else None
        if fs is not None and fs.analyzer is not None:
            return fs.analyzer
        from whoosh_spark.analysis import STANDARD

        return STANDARD

    def _word(self, w: str, field: str) -> Q.Query | None:
        if w == "*" or (field == "*" and w == "*"):
            return Q.Every()
        if field == "*":
            return Q.Every()
        fs = self.schema[field] if field in self.schema else None
        if "gtlt" in self.plugins:
            m = re.fullmatch(r"(>=|<=|=>|=<|>|<)(.+)", w)
            if m is not None:
                return self._gtlt(m.group(1), m.group(2), field, fs)
        # fuzzy suffix: word~ or word~2
        m = re.fullmatch(r"(.+?)~(\d*)", w)
        if m and fs is not None and fs.kind == "text":
            base = m.group(1).lower()
            maxdist = int(m.group(2)) if m.group(2) else 1
            return Q.FuzzyTerm(field, base, maxdist=maxdist)
        if "*" in w or "?" in w:
            if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                return Q.Prefix(field, w[:-1].lower() if fs and fs.kind == "text" else w[:-1])
            return Q.Wildcard(field, w.lower() if fs and fs.kind == "text" else w)
        if fs is None or fs.kind in ("id", "keyword", "boolean"):
            return Q.Term(field, w)
        if fs.kind == "numeric":
            return Q.NumericRange(field, _num(w), _num(w))
        if fs.kind == "datetime":
            lo, hi = _date_bounds(w, self.basedate)
            return Q.DateRange(field, lo, hi)
        # text: run through the analyzer; stopword-only words vanish
        toks = [x for x, _ in analyze_text(w, self._analyzer(field))]
        if not toks:
            return None
        if len(toks) == 1:
            return Q.Term(field, toks[0])
        return Q.Phrase(field, toks) if fs.phrase else Q.And([Q.Term(field, x) for x in toks])

    def _gtlt(self, op: str, val: str, field: str, fs) -> Q.Query:
        """GtLtPlugin (reference: qparser/plugins.py::GtLtPlugin, opt-in):
        ``field:>5`` / ``>=`` / ``<`` / ``<=`` become half-open ranges. On a
        DATETIME field a partial date resolves to its [lo, hi] span first
        (``>2024-01`` = after January's end), like the reference rewriting
        GtLt into a Range node the date plugin then interprets."""
        gt = op in (">", ">=", "=>"); incl = op in (">=", "=>", "<=", "=<")
        if fs is not None and fs.kind == "numeric":
            v = _num(val)
            if gt:
                return Q.NumericRange(field, v, None, startexcl=not incl)
            return Q.NumericRange(field, None, v, endexcl=not incl)
        if fs is not None and fs.kind == "datetime":
            lo, hi = _date_bounds(val, self.basedate)
            if gt:
                return Q.DateRange(field, lo if incl else hi, None,
                                   startexcl=not incl)
            return Q.DateRange(field, None, hi if incl else lo,
                               endexcl=not incl)
        v = val.lower() if (fs is not None and fs.kind == "text") else val
        if gt:
            return Q.TermRange(field, v, None, startexcl=not incl)
        return Q.TermRange(field, None, v, endexcl=not incl)

    def _range(self, t: _Tok, field: str) -> Q.Query | None:
        body = t.text.strip()
        m = re.fullmatch(r"(.*?)\s+TO\s+(.*?)", body, flags=re.IGNORECASE) or re.fullmatch(
            r"(.*?)\s+TO\s+(.*)", body, flags=re.IGNORECASE
        )
        if m:
            lo_s, hi_s = m.group(1).strip(), m.group(2).strip()
        else:
            lo_s, hi_s = body, body
        lo = lo_s or None
        hi = hi_s or None
        fs = self.schema[field] if field in self.schema else None
        if fs is not None and fs.kind == "numeric":
            return Q.NumericRange(field, _num(lo), _num(hi), t.startexcl, t.endexcl)
        if fs is not None and fs.kind == "datetime":
            lo_d = _date_bounds(lo, self.basedate)[0] if lo else None
            hi_d = _date_bounds(hi, self.basedate)[1] if hi else None
            return Q.DateRange(field, lo_d, hi_d, t.startexcl, t.endexcl)
        lo = lo.lower() if (lo and fs is not None and fs.kind == "text") else lo
        hi = hi.lower() if (hi and fs is not None and fs.kind == "text") else hi
        return Q.TermRange(field, lo, hi, t.startexcl, t.endexcl)


class MultifieldParser(QueryParser):
    """Query over several fields (reference: qparser/default.py::
    MultifieldParser ~L400): each unfielded leaf becomes an Or of the same
    leaf over every field in ``fieldnames`` (with optional per-field
    boosts); ``field:...`` prefixes still pin a single field. Groups recurse
    through their leaves, so the fan-out applies inside parentheses too."""

    def __init__(self, fieldnames: list[str], schema: Schema,
                 fieldboosts: dict[str, float] | None = None,
                 basedate: datetime | None = None,
                 plugins: tuple[str, ...] = (),
                 fieldaliases: dict[str, str] | None = None,
                 analyzer_overrides: "dict | None" = None):
        super().__init__(fieldnames[0], schema, basedate=basedate,
                         plugins=plugins, fieldaliases=fieldaliases,
                         analyzer_overrides=analyzer_overrides)
        self.fieldnames = list(fieldnames)
        self.fieldboosts = dict(fieldboosts or {})

    def _leaf(self, t: _Tok, field: str | None) -> Q.Query | None:
        if field is not None or t.kind == "(":
            # explicit field, or a group (whose leaves fan out themselves)
            return super()._leaf(t, field)
        subs = []
        # some atoms consume extra tokens (regex plugin's glued phrase);
        # rewind to the same stream position for every field's fan-out and
        # keep the furthest position reached afterwards
        start_i = self._i
        end_i = self._i
        for f in self.fieldnames:
            self._i = start_i
            try:
                q = self._atom_body(t, f)
            except (ValueError, TypeError):
                continue  # e.g. a non-numeric word against a NUMERIC field
            end_i = max(end_i, self._i)
            if q is None:
                continue
            boost = self.fieldboosts.get(f, 1.0)
            subs.append(q if boost == 1.0 else q.with_boost(boost))
        self._i = end_i
        if not subs:
            return None
        return subs[0] if len(subs) == 1 else Q.Or(subs)


def _copy_leaves(q: Q.Query, cmap: dict[str, str], group: str) -> Q.Query:
    """Rewrite every fielded leaf of ``q`` whose field is a ``cmap`` key
    into a group of (original, copy-on-mapped-field) — the tree half of
    CopyFieldPlugin (reference: qparser/plugins.py::CopyFieldPlugin
    .do_copyfield, which walks syntax nodes the same way). Compounds and
    wrappers recurse; a single parse atom can be compound when a text word
    analyzes to several tokens."""
    from dataclasses import replace as _replace

    grp = Q.Or if group == "or" else Q.And
    if isinstance(q, Q.CompoundQuery):
        return _replace(
            q, subqueries=tuple(_copy_leaves(s, cmap, group) for s in q.subqueries))
    if isinstance(q, Q.BinaryQuery):
        return _replace(q, a=_copy_leaves(q.a, cmap, group),
                        b=_copy_leaves(q.b, cmap, group))
    if isinstance(q, (Q.Not, Q.ConstantScore, Q.SpanFirst)):
        return _replace(q, subquery=_copy_leaves(q.subquery, cmap, group))
    fname = getattr(q, "fieldname", None)
    if fname is not None and fname in cmap:
        return grp([q, _replace(q, fieldname=cmap[fname])])
    return q


def _num(s: str | None):
    if s is None:
        return None
    try:
        return int(s)
    except ValueError:
        return float(s)


_RELDATE_RE = re.compile(r"([+-]?\d+)\s*(day|week|month|year|hour|minute)s?",
                         re.IGNORECASE)

_MONTHS = {
    "jan": 1, "january": 1, "feb": 2, "february": 2, "mar": 3, "march": 3,
    "apr": 4, "april": 4, "may": 5, "jun": 6, "june": 6, "jul": 7, "july": 7,
    "aug": 8, "august": 8, "sep": 9, "sept": 9, "september": 9,
    "oct": 10, "october": 10, "nov": 11, "november": 11,
    "dec": 12, "december": 12,
}
_WEEKDAYS = {
    "monday": 0, "mon": 0, "tuesday": 1, "tue": 1, "tues": 1,
    "wednesday": 2, "wed": 2, "thursday": 3, "thu": 3, "thurs": 3,
    "friday": 4, "fri": 4, "saturday": 5, "sat": 5, "sunday": 6, "sun": 6,
}

# "jan 2024" | "january" | "15 jan 2024" | "jan 15, 2024" | "last tuesday" ...
_MONTH_YEAR_RE = re.compile(r"([a-z]+)\s+(\d{4})")
# trailing time-of-day: "noon" | "midnight" | "3pm" | "9:30 am" | "15:30"
_TOD_RE = re.compile(
    r"^(?:(?P<rest>.*\S)\s+)?"
    r"(?P<tod>noon|midnight"
    r"|(?P<h>\d{1,2})(?::(?P<m>\d{2}))?\s*(?P<ap>am|pm)"
    r"|(?P<h2>\d{1,2}):(?P<m2>\d{2}))$"
)
_DAY_MONTH_RE = re.compile(r"(\d{1,2})(?:st|nd|rd|th)?\s+([a-z]+)(?:\s+(\d{4}))?")
_MONTH_DAY_RE = re.compile(r"([a-z]+)\s+(\d{1,2})(?:st|nd|rd|th)?,?(?:\s+(\d{4}))?")


def _month_bounds(year: int, month: int) -> tuple[datetime, datetime]:
    from datetime import timedelta

    lo = datetime(year, month, 1)
    nxt = lo.replace(year=year + (month == 12), month=(month % 12) + 1)
    return lo, nxt - timedelta(seconds=1)


def _nl_date_bounds(low: str, basedate: datetime | None) -> tuple[datetime, datetime] | None:
    """English date-phrase subset of the reference's date grammar
    (src/whoosh/qparser/dateparse.py: month names, weekday names with
    last/next, day-month-year in either order). Returns [start, end] bounds
    or None when ``low`` isn't one of these forms. Forms that are relative
    (bare/last/next weekday, month without a year) need ``basedate``."""
    from datetime import timedelta

    low = " ".join(low.split())

    def day_of(d: datetime) -> tuple[datetime, datetime]:
        lo = d.replace(hour=0, minute=0, second=0, microsecond=0)
        return lo, d.replace(hour=23, minute=59, second=59, microsecond=0)

    # last/next/bare weekday (relative; anchored on basedate)
    parts = low.split(" ")
    if basedate is not None:
        if low == "today":
            return day_of(basedate)
        if low == "yesterday":
            return day_of(basedate - timedelta(days=1))
        if low == "tomorrow":
            return day_of(basedate + timedelta(days=1))
        if len(parts) == 2 and parts[0] in ("last", "next") and parts[1] in _WEEKDAYS:
            wd = _WEEKDAYS[parts[1]]
            if parts[0] == "last":
                back = (basedate.weekday() - wd) % 7 or 7
                return day_of(basedate - timedelta(days=back))
            fwd = (wd - basedate.weekday()) % 7 or 7
            return day_of(basedate + timedelta(days=fwd))
        if len(parts) == 1 and low in _WEEKDAYS:
            # bare weekday = the most recent one (today counts), like the
            # reference's relative weekday resolution against basedate
            back = (basedate.weekday() - _WEEKDAYS[low]) % 7
            return day_of(basedate - timedelta(days=back))
        if low in _MONTHS:  # bare month name = that month of basedate's year
            return _month_bounds(basedate.year, _MONTHS[low])

    # time-of-day suffix narrows a resolved day: "3pm", "yesterday noon",
    # "jan 15, 2024 9:30am" (reference grammar composes date and time the
    # same way); a bare time resolves against basedate's day
    m = _TOD_RE.fullmatch(low)
    if m is not None:
        tod = m.group("tod")
        if tod == "noon":
            hh, mm = 12, 0
        elif tod == "midnight":
            hh, mm = 0, 0
        elif m.group("ap"):
            hh = int(m.group("h")) % 12 + (12 if m.group("ap") == "pm" else 0)
            mm = int(m.group("m") or 0)
        else:
            hh, mm = int(m.group("h2")), int(m.group("m2"))
        rest = m.group("rest")
        day = None
        if rest:
            sub = _nl_date_bounds(rest, basedate)
            if sub is not None:
                day = sub[0]
        elif basedate is not None:
            day = basedate
        if day is not None and hh < 24 and mm < 60:
            at = day.replace(hour=hh, minute=mm, second=0, microsecond=0)
            return at, at.replace(second=59)

    m = _MONTH_YEAR_RE.fullmatch(low)
    if m and m.group(1) in _MONTHS:  # "jan 2024"
        return _month_bounds(int(m.group(2)), _MONTHS[m.group(1)])
    m = _DAY_MONTH_RE.fullmatch(low)
    if m and m.group(2) in _MONTHS:  # "15 jan 2024" / "15 jan"
        year = int(m.group(3)) if m.group(3) else (basedate.year if basedate else None)
        if year is not None:
            return day_of(datetime(year, _MONTHS[m.group(2)], int(m.group(1))))
    m = _MONTH_DAY_RE.fullmatch(low)
    if m and m.group(1) in _MONTHS:  # "jan 15, 2024" / "jan 15"
        year = int(m.group(3)) if m.group(3) else (basedate.year if basedate else None)
        if year is not None:
            return day_of(datetime(year, _MONTHS[m.group(1)], int(m.group(2))))
    return None


def _date_bounds(s: str, basedate: datetime | None = None) -> tuple[datetime, datetime]:
    """yyyymmdd[hhmmss] -> [start, end) bounds like the reference's date
    grammar resolves a partial date to a range
    (src/whoosh/qparser/dateparse.py semantics for plain date terms).
    With a basedate: named dates (yesterday/today/tomorrow/now) and relative
    offsets (-3days, +2weeks) — the DateParserPlugin subset."""
    from datetime import timedelta

    s = s.strip()
    nl = _nl_date_bounds(s.lower(), basedate)
    if nl is not None:
        return nl
    if basedate is not None:
        low = s.lower()
        day_of = lambda d: (d.replace(hour=0, minute=0, second=0, microsecond=0),
                            d.replace(hour=23, minute=59, second=59, microsecond=0))
        if low == "now":
            return basedate, basedate
        if low == "today":
            return day_of(basedate)
        if low == "yesterday":
            return day_of(basedate - timedelta(days=1))
        if low == "tomorrow":
            return day_of(basedate + timedelta(days=1))
        m = _RELDATE_RE.fullmatch(low)
        if m:
            n, unit = int(m.group(1)), m.group(2).lower()
            step = {"minute": timedelta(minutes=1), "hour": timedelta(hours=1),
                    "day": timedelta(days=1), "week": timedelta(weeks=1),
                    "month": timedelta(days=30), "year": timedelta(days=365)}[unit]
            d = basedate + n * step
            return day_of(d) if unit in ("day", "week", "month", "year") else (d, d)
    fmts = [
        ("%Y%m%d%H%M%S", "second"),
        ("%Y%m%d%H%M", "minute"),
        ("%Y%m%d%H", "hour"),
        ("%Y%m%d", "day"),
        ("%Y%m", "month"),
        ("%Y", "year"),
        # dashed ISO partials resolve to ranges too ("2024-01" = the month)
        ("%Y-%m-%dT%H:%M:%S", "second"),
        ("%Y-%m-%d %H:%M:%S", "second"),
        ("%Y-%m-%d", "day"),
        ("%Y-%m", "month"),
    ]
    for fmt, unit in fmts:
        try:
            d = datetime.strptime(s, fmt).replace(tzinfo=None)
        except ValueError:
            continue
        if unit == "second":
            hi = d
        elif unit == "minute":
            hi = d.replace(second=59)
        elif unit == "hour":
            hi = d.replace(minute=59, second=59)
        elif unit == "day":
            hi = d.replace(hour=23, minute=59, second=59)
        elif unit == "month":
            nxt = d.replace(year=d.year + (d.month == 12), month=(d.month % 12) + 1)
            from datetime import timedelta

            hi = nxt - timedelta(seconds=1)
        else:
            hi = d.replace(month=12, day=31, hour=23, minute=59, second=59)
        return d, hi
    d = datetime.fromisoformat(s)
    return d, d
