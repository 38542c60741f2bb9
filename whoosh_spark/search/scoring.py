"""Scoring models (reference: src/whoosh/scoring.py).

Scores are built as constant-folded Spark column expressions: per-query
constants (idf, avgdl, K1, B) are resolved on the driver at plan time —
exactly the reference's precomputation in WeightLengthScorer (~L100) — and
the per-row math stays JVM-side in whole-stage codegen. The numpy twin
(bm25_np) is used inside the block-max WAND pandas UDF.

Parity-critical constants (SURVEY.md Appendix A.4-A.5):
- BM25F: B=0.75, K1=1.2, per-field B overrides
- idf = ln(N / (df + 1)) + 1 with N = doc_count_all (includes deleted)
- unscorable fields score raw weight (scoring.py::WeightScorer ~L80)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from whoosh_spark.fields import FieldSpec


def idf(doc_count_all: int, df: int) -> float:
    """Reference: scoring.py::WeightingModel.idf ~L60."""
    if doc_count_all <= 0:
        return 1.0
    return math.log(doc_count_all / (df + 1)) + 1.0


def bm25_np(idf_v, tf, dl, avgdl, B, K1):
    """Vectorized BM25 (reference free fn scoring.py::bm25 ~L120)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return idf_v * (tf * (K1 + 1)) / (tf + K1 * ((1 - B) + B * dl / avgdl))


def _as_col(idf_value) -> Column:
    return idf_value if isinstance(idf_value, Column) else F.lit(float(idf_value))


@dataclass(frozen=True)
class WeightingModel:
    def term_scalar(self, fs: FieldSpec, n: int, df: int, cf: float) -> float:
        """Per-(field, term) plan-time constant fed to score_expr as
        ``idf_value`` — idf for the tf*idf family, lambda = cf/N for DFR
        models. Mirrors the reference's per-query scorer setup
        (scoring.py::WeightLengthScorer precomputing idf/avgfl)."""
        return idf(n, df)

    def score_expr(self, fs: FieldSpec, idf_value: "float | Column", avgdl: float,
                   w: Column, dl: Column) -> Column:
        """idf_value may be a plan-time float or a per-term idf Column (used
        by lexicon-expanded multi-term queries)."""
        raise NotImplementedError

    def max_quality(self, fs: FieldSpec, idf_value: float, avgdl: float,
                    max_weight: float, min_dl: float) -> float:
        """Upper bound of the score for WAND pruning
        (reference: scoring.py::WeightLengthScorer.block_quality)."""
        raise NotImplementedError

    # final() hook (reference: scoring.py::WeightingModel.final ~L120 +
    # use_final flag): post-process the per-doc ACCUMULATED score before
    # collection. Spark form: a column expression over the score. Models
    # with use_final=True are excluded from block-max pruning, exactly as
    # the reference disables block quality optimizations for them (the
    # transform need not be monotone, so block bounds don't survive it).
    use_final: bool = field(default=False, init=False)

    def final_expr(self, score: Column) -> Column:
        return score


@dataclass(frozen=True)
class FinalWeighting(WeightingModel):
    """Wrap any model with a named final() transform — e.g.
    ``FinalWeighting(BM25F(), lambda s: F.sqrt(s))``. The callable takes
    the score Column and returns the adjusted Column."""

    base: WeightingModel = None  # type: ignore[assignment]
    fn: object = None  # Callable[[Column], Column]
    use_final: bool = field(default=True, init=False)

    def term_scalar(self, fs, n, df, cf):
        return self.base.term_scalar(fs, n, df, cf)

    def score_expr(self, fs, idf_value, avgdl, w, dl):
        return self.base.score_expr(fs, idf_value, avgdl, w, dl)

    def score_np(self, fs, idf_value, avgdl, w, dl):
        return self.base.score_np(fs, idf_value, avgdl, w, dl)

    def final_expr(self, score: Column) -> Column:
        return self.fn(score)


@dataclass(frozen=True)
class BM25F(WeightingModel):
    B: float = 0.75
    K1: float = 1.2
    field_B: dict[str, float] = field(default_factory=dict)

    def _b_for(self, fs: FieldSpec) -> float:
        if fs.name in self.field_B:
            return self.field_B[fs.name]
        if fs.B is not None:
            return fs.B
        return self.B

    def score_expr(self, fs, idf_value, avgdl, w, dl):
        if not fs.scorable or avgdl <= 0:
            # WeightScorer: score = raw weight
            return w
        B, K1 = self._b_for(fs), self.K1
        return _as_col(idf_value) * (w * (K1 + 1)) / (
            w + K1 * ((1 - B) + B * dl.cast("double") / F.lit(avgdl))
        )

    def score_np(self, fs, idf_value, avgdl, w, dl):
        if not fs.scorable or avgdl <= 0:
            return np.asarray(w, dtype=np.float64)
        return bm25_np(idf_value, w, dl, avgdl, self._b_for(fs), self.K1)

    def max_quality(self, fs, idf_value, avgdl, max_weight, min_dl):
        if not fs.scorable or avgdl <= 0:
            return max_weight
        return float(bm25_np(idf_value, np.array([max_weight]), np.array([min_dl]),
                             avgdl, self._b_for(fs), self.K1)[0])


@dataclass(frozen=True)
class TF_IDF(WeightingModel):
    """score = tf * idf (reference: scoring.py::TF_IDF ~L260)."""

    def score_expr(self, fs, idf_value, avgdl, w, dl):
        return w * _as_col(idf_value)

    def score_np(self, fs, idf_value, avgdl, w, dl):
        return np.asarray(w, dtype=np.float64) * idf_value

    def max_quality(self, fs, idf_value, avgdl, max_weight, min_dl):
        return max_weight * idf_value


@dataclass(frozen=True)
class Frequency(WeightingModel):
    """score = raw tf (reference: scoring.py::Frequency ~L300)."""

    def score_expr(self, fs, idf_value, avgdl, w, dl):
        return w

    def score_np(self, fs, idf_value, avgdl, w, dl):
        return np.asarray(w, dtype=np.float64)

    def max_quality(self, fs, idf_value, avgdl, max_weight, min_dl):
        return max_weight


_LOG2E = 1.0 / math.log(2.0)


@dataclass(frozen=True)
class PL2(WeightingModel):
    """PL2 divergence-from-randomness model (reference: scoring.py::PL2
    ~L330, default c=1.0). The reference mount is empty, so the formula is
    the published Terrier PL2 the reference class documents itself as
    implementing:

        lambda = cf / N           (mean collection frequency per doc)
        tfn    = tf * log2(1 + c * avgdl / dl)
        score  = 1/(tfn+1) * ( tfn*log2(tfn/lambda)
                               + (lambda - tfn)*log2(e)
                               + 0.5*log2(2*pi*tfn) )

    The per-term plan-time scalar is lambda (not idf)."""

    c: float = 1.0

    def term_scalar(self, fs, n, df, cf):
        return cf / n if n > 0 else 1.0

    def score_expr(self, fs, idf_value, avgdl, w, dl):
        if not fs.scorable or avgdl <= 0:
            return w
        lam = _as_col(idf_value)
        tfn = w * F.log2(F.lit(1.0) + F.lit(self.c * avgdl) / dl.cast("double"))
        return (F.lit(1.0) / (tfn + F.lit(1.0))) * (
            tfn * F.log2(tfn / lam)
            + (lam - tfn) * F.lit(_LOG2E)
            + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * tfn)
        )

    def score_np(self, fs, idf_value, avgdl, w, dl):
        w = np.asarray(w, dtype=np.float64)
        if not fs.scorable or avgdl <= 0:
            return w
        lam = float(idf_value)
        dl = np.asarray(dl, dtype=np.float64)
        tfn = w * np.log2(1.0 + self.c * avgdl / dl)
        return (1.0 / (tfn + 1.0)) * (
            tfn * np.log2(tfn / lam)
            + (lam - tfn) * _LOG2E
            + 0.5 * np.log2(2.0 * math.pi * tfn)
        )

    def max_quality(self, fs, idf_value, avgdl, max_weight, min_dl):
        # PL2 has no cheap monotone block bound; +inf disables WAND skipping
        # safely (the pruned path then degrades to exhaustive scoring).
        return math.inf


@dataclass(frozen=True)
class FunctionWeighting(WeightingModel):
    """User-defined scoring (reference: scoring.py::FunctionWeighting ~L420).
    ``expr_fn(idf_col, avgdl, w_col, dl_col) -> Column`` builds the Spark
    score expression; ``np_fn`` is its numpy twin for the WAND path (optional
    — without it max_quality disables pruning)."""

    expr_fn: "object"
    np_fn: "object | None" = None

    def score_expr(self, fs, idf_value, avgdl, w, dl):
        return self.expr_fn(_as_col(idf_value), avgdl, w, dl)

    def score_np(self, fs, idf_value, avgdl, w, dl):
        if self.np_fn is None:
            raise NotImplementedError("FunctionWeighting without np_fn")
        return self.np_fn(idf_value, avgdl, np.asarray(w, np.float64), np.asarray(dl, np.float64))

    def max_quality(self, fs, idf_value, avgdl, max_weight, min_dl):
        return math.inf


@dataclass(frozen=True)
class MultiWeighting(WeightingModel):
    """Per-field model dispatch (reference: scoring.py::MultiWeighting
    ~L390): ``MultiWeighting(BM25F(), text=TF_IDF())`` in the reference;
    here an explicit dict."""

    default: WeightingModel = field(default_factory=BM25F)
    fields: dict[str, WeightingModel] = field(default_factory=dict)

    def _m(self, fs) -> WeightingModel:
        return self.fields.get(fs.name, self.default)

    def term_scalar(self, fs, n, df, cf):
        return self._m(fs).term_scalar(fs, n, df, cf)

    def score_expr(self, fs, idf_value, avgdl, w, dl):
        return self._m(fs).score_expr(fs, idf_value, avgdl, w, dl)

    def score_np(self, fs, idf_value, avgdl, w, dl):
        return self._m(fs).score_np(fs, idf_value, avgdl, w, dl)

    def max_quality(self, fs, idf_value, avgdl, max_weight, min_dl):
        return self._m(fs).max_quality(fs, idf_value, avgdl, max_weight, min_dl)
