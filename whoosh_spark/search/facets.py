"""Facet key sources for sorted search (reference: src/whoosh/sorting.py).

The reference's facet objects choose the sort/group key per matched doc:
FieldFacet (~L150) reads a column, StoredFieldFacet (~L660) a stored field,
ScoreFacet (~L520) the score itself, FunctionFacet (~L560) a user function.
In Spark every key is just a Column expression over the scored frame joined
with the docs table, so each facet declares (a) which doc columns it needs
joined and (b) the key Column — Catalyst prunes the docs scan to exactly
those columns.

Usage: ``searcher.search(q, sortedby=[ScoreFacet(), FieldFacet("lang")])``
— plain strings remain accepted and mean FieldFacet(name).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldFacet:
    """Sort key = a document column (reference: sorting.py::FieldFacet)."""

    name: str
    reverse: bool = False

    @property
    def columns(self) -> tuple[str, ...]:
        return (self.name,)

    @property
    def output_name(self) -> str | None:
        return None  # column is already present after the join

    def key(self) -> Column:
        return F.col(self.name)


@dataclass(frozen=True)
class StoredFieldFacet(FieldFacet):
    """Key from the stored document value (reference: sorting.py::
    StoredFieldFacet ~L660). Stored fields ARE the docs table columns here
    (SURVEY D9), so this is FieldFacet with the reference's name."""


@dataclass(frozen=True)
class ScoreFacet:
    """Sort by score (reference: sorting.py::ScoreFacet ~L520). Scores sort
    descending by default, like the reference."""

    reverse: bool = False

    columns: tuple[str, ...] = ()
    output_name = None

    def key(self) -> Column:
        return F.col("score")


class FunctionFacet:
    """User-expression key (reference: sorting.py::FunctionFacet ~L560).

    ``expr_fn(F) -> Column`` builds the key from document/score columns;
    ``columns`` lists the doc columns it reads (joined in, and pruned to,
    exactly these). The key is emitted as ``name`` in the result frame.
    """

    def __init__(self, expr_fn, columns: tuple[str, ...] = (), name: str = "key",
                 reverse: bool = False):
        self.expr_fn = expr_fn
        self.columns = tuple(columns)
        self.name = name
        self.reverse = reverse

    @property
    def output_name(self) -> str | None:
        return self.name

    def key(self) -> Column:
        return self.expr_fn(F)


class TranslateFacet:
    """Apply a function to another facet's key (reference: sorting.py::
    TranslateFacet ~L540: ``TranslateFacet(fn, facet)`` sorts/groups by
    ``fn(key)``). ``fn`` is Column -> Column so the translation stays a
    JVM expression; reverse follows the WRAPPED facet unless overridden,
    and the translated key is emitted as ``name`` when given."""

    def __init__(self, fn, facet, name: str | None = None,
                 reverse: bool | None = None):
        self.fn = fn
        self.facet = as_facet(facet)
        self.name = name
        self.reverse = (getattr(self.facet, "reverse", False)
                        if reverse is None else reverse)

    @property
    def columns(self) -> tuple[str, ...]:
        return tuple(self.facet.columns)

    @property
    def output_name(self) -> str | None:
        return self.name

    def key(self) -> Column:
        return self.fn(self.facet.key())


def as_facet(k) -> "FieldFacet | ScoreFacet | FunctionFacet":
    return FieldFacet(k) if isinstance(k, str) else k


def facet_desc(f, reverse: bool = False) -> bool:
    """Sort direction for a facet: per-facet reverse XOR call-level
    reverse, with ScoreFacet defaulting descending like the reference
    (sorting.py). The ONE place the rule lives — search, search_page,
    and collapse_order all call it."""
    desc = getattr(f, "reverse", False) ^ reverse
    if isinstance(f, ScoreFacet):
        desc = not desc
    return desc
