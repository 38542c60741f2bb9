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
