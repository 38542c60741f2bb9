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
