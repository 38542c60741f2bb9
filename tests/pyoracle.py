"""Pure-Python first-principles oracle for engine tests.

Implements the scoring/matching semantics from the public Whoosh formulas
(SURVEY.md Appendix A) directly over analyzed token lists — independent of
the Spark implementation — so Spark results can be checked end-to-end
without the (empty) reference mount.
"""

from __future__ import annotations

import math
from collections import Counter

from whoosh_spark.analysis import STANDARD, analyze_text
from whoosh_spark.util import quantized_length

K1, B = 1.2, 0.75


class PyIndex:
    def __init__(self, docs: list[dict], text_field: str = "text", id_fields: tuple = ()):
        self.docs = docs
        self.text_field = text_field
        self.id_fields = id_fields
        self.tokens = {}  # doc_id -> [(term,pos)]
        self.tf = {}  # doc_id -> Counter
        self.raw_len = {}
        self.df = Counter()
        self.id_terms = {f: {} for f in id_fields}  # field -> doc_id -> value
        for d in docs:
            i = d["doc_id"]
            toks = analyze_text(d.get(text_field) or "", STANDARD)
            self.tokens[i] = toks
            c = Counter(t for t, _ in toks)
            self.tf[i] = c
            self.raw_len[i] = len(toks)
            for t in c:
                self.df[t] += 1
            for f in id_fields:
                self.id_terms[f][i] = d.get(f)
        self.n = len(docs)
        self.avgdl = sum(self.raw_len.values()) / self.n if self.n else 0.0

    def idf(self, term: str) -> float:
        return math.log(self.n / (self.df[term] + 1)) + 1.0

    def bm25(self, doc_id: int, term: str) -> float:
        tf = self.tf[doc_id].get(term, 0)
        if tf == 0:
            return 0.0
        dl = quantized_length(self.raw_len[doc_id])
        return self.idf(term) * (tf * (K1 + 1)) / (tf + K1 * ((1 - B) + B * dl / self.avgdl))

    def matching(self, term: str) -> set[int]:
        return {i for i in self.tf if term in self.tf[i]}

    def id_matching(self, field: str, value: str) -> set[int]:
        return {i for i, v in self.id_terms[field].items() if v == value}

    def or_scores(self, terms: list[str]) -> dict[int, float]:
        out: dict[int, float] = {}
        for t in terms:
            for i in self.matching(t):
                out[i] = out.get(i, 0.0) + self.bm25(i, t)
        return out

    def and_scores(self, terms: list[str]) -> dict[int, float]:
        docs = set.intersection(*[self.matching(t) for t in terms]) if terms else set()
        return {i: sum(self.bm25(i, t) for t in terms) for i in docs}

    def phrase_docs(self, words: list[str], slop: int = 1) -> dict[int, int]:
        """doc_id -> phrase freq using the span chain semantics."""
        out = {}
        for i, toks in self.tokens.items():
            poss = {w: [p for t, p in toks if t == w] for w in words}
            if any(not poss[w] for w in words):
                continue
            current = poss[words[0]]
            for w in words[1:]:
                current = [p for p in poss[w] if any(c < p <= c + slop for c in current)]
            if current:
                out[i] = len(current)
        return out

    def topk(self, scores: dict[int, float], k: int | None = 10) -> list[tuple[int, float]]:
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return items if k is None else items[:k]


    # ---- generic query-tree evaluator (mirrors executor semantics) ----

    def _lexicon(self) -> set[str]:
        out: set[str] = set()
        for c in self.tf.values():
            out |= set(c)
        return out

    def scores(self, q) -> dict[int, float]:
        from whoosh_spark import query as Q
        from whoosh_spark.util import levenshtein

        b = q.boost

        def boosted(d: dict[int, float]) -> dict[int, float]:
            return {k: v * b for k, v in d.items()} if b != 1.0 else d

        if isinstance(q, Q.Term):
            if q.fieldname == self.text_field:
                return boosted({i: self.bm25(i, q.text) for i in self.matching(q.text)})
            return boosted({i: 1.0 for i in self.id_matching(q.fieldname, q.text)})
        if isinstance(q, Q.Phrase):
            docs = self.phrase_docs(list(q.words), q.slop)
            return boosted(
                {i: sum(self.bm25(i, w) for w in q.words) for i in docs}
            )
        if isinstance(q, (Q.Prefix, Q.Wildcard, Q.FuzzyTerm, Q.TermRange)):
            import fnmatch as _fn
            import re as _re

            lex = sorted(self._lexicon())
            if isinstance(q, Q.Prefix):
                terms = [t for t in lex if t.startswith(q.text)]
            elif isinstance(q, Q.Wildcard):
                rx = _re.compile(_fn.translate(q.text))
                terms = [t for t in lex if rx.fullmatch(t)]
            elif isinstance(q, Q.FuzzyTerm):
                terms = [
                    t for t in lex
                    if t.startswith(q.text[: q.prefixlength])
                    and levenshtein(t, q.text) <= q.maxdist
                ]
            else:
                terms = [
                    t for t in lex
                    if (q.start is None or (t > q.start if q.startexcl else t >= q.start))
                    and (q.end is None or (t < q.end if q.endexcl else t <= q.end))
                ]
            return boosted(self.or_scores(terms))
        if isinstance(q, Q.And):
            kid = [self.scores(k) for k in q.subqueries]
            docs = set.intersection(*[set(d) for d in kid]) if kid else set()
            return boosted({i: sum(d[i] for d in kid) for i in docs})
        if isinstance(q, Q.Or):
            out: dict[int, float] = {}
            nmatch: dict[int, int] = {}
            for d in (self.scores(k) for k in q.subqueries):
                for i, s in d.items():
                    out[i] = out.get(i, 0.0) + s
                    nmatch[i] = nmatch.get(i, 0) + 1
            if q.scale:
                # coord scaling: sum * ((1-scale) + scale * matched/children)
                n = float(len(q.subqueries))
                sc = float(q.scale)
                out = {i: s * ((1 - sc) + sc * nmatch[i] / n)
                       for i, s in out.items()}
            if q.minmatch > 1:
                out = {i: s for i, s in out.items() if nmatch[i] >= q.minmatch}
            return boosted(out)
        if isinstance(q, Q.DisjunctionMax):
            mx: dict[int, float] = {}
            sm: dict[int, float] = {}
            for d in (self.scores(k) for k in q.subqueries):
                for i, s in d.items():
                    mx[i] = max(mx.get(i, 0.0), s)
                    sm[i] = sm.get(i, 0.0) + s
            if q.tiebreak:
                # DisMaxMatcher: max + tiebreak * (sum - max)
                out = {i: mx[i] + q.tiebreak * (sm[i] - mx[i]) for i in mx}
            else:
                out = mx
            return boosted(out)
        if isinstance(q, Q.AndNot):
            a, bb = self.scores(q.a), self.scores(q.b)
            return boosted({i: s for i, s in a.items() if i not in bb})
        if isinstance(q, Q.Require):
            a, bb = self.scores(q.a), self.scores(q.b)
            return boosted({i: s for i, s in a.items() if i in bb})
        if isinstance(q, Q.AndMaybe):
            a, bb = self.scores(q.a), self.scores(q.b)
            return boosted({i: s + bb.get(i, 0.0) for i, s in a.items()})
        if isinstance(q, Q.Not):
            sub = self.scores(q.subquery)
            return boosted({i: 1.0 for i in self.tf if i not in sub})
        if isinstance(q, Q.Every):
            return boosted({i: 1.0 for i in self.tf})
        if isinstance(q, Q.NullQuery):
            return {}
        raise NotImplementedError(type(q).__name__)

    def query(self, q, limit: int | None = 10) -> list[tuple[int, float]]:
        return self.topk(self.scores(q.normalize()), limit)
