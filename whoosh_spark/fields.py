"""Schema / field-type configuration.

Mirrors the reference's Schema + FieldType surface (public Whoosh,
src/whoosh/fields.py::Schema ~L1100, ::FieldType ~L80 and subclasses
TEXT/ID/KEYWORD/NUMERIC/DATETIME/BOOLEAN/STORED) as a thin config layer: a
Spark DataFrame already carries the physical types, so a FieldSpec only
records how a column participates in indexing and scoring.

Defaults mirror the reference:
- TEXT: StandardAnalyzer (minsize=2), positions recorded (phrase=True),
  scorable=True, field_boost=1.0      (src/whoosh/fields.py::TEXT ~L950)
- ID: whole value = one term, not lowercased, not scorable
- KEYWORD: space-separated terms, not scorable by default
- NUMERIC/DATETIME/BOOLEAN: no terms at all — Spark-native range/equality
  predicates on the docs table replace Whoosh's tiered-term trick
  (src/whoosh/query/ranges.py::NumericRange ~L200 is obsolete under
  Catalyst predicate pushdown; see SURVEY.md §4.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from whoosh_spark.analysis import SIMPLE, STANDARD, STEMMING, AnalyzerSpec


@dataclass(frozen=True)
class FieldSpec:
    name: str
    kind: str  # 'text' | 'id' | 'keyword' | 'numeric' | 'datetime' | 'boolean' | 'stored'
    analyzer: AnalyzerSpec | None = None
    scorable: bool = False
    phrase: bool = False
    field_boost: float = 1.0
    B: float | None = None  # per-field BM25F B override (<field>_B= kwarg)
    unique: bool = False  # update_document upsert key (reference: unique=True)
    # per-row analyzer routing (MULTILANG_TEXT): name of the language
    # column, plus a sorted (lang, AnalyzerSpec) tuple map; rows whose
    # lang has no entry fall back to ``analyzer`` (the default spec,
    # which is also what query-side analysis uses)
    lang_col: str | None = None
    lang_specs: tuple | None = None

    @property
    def indexed(self) -> bool:
        return self.kind in ("text", "id", "keyword", "boolean")


def TEXT(name: str, analyzer: AnalyzerSpec = STANDARD, field_boost: float = 1.0,
         B: float | None = None) -> FieldSpec:
    return FieldSpec(name, "text", analyzer=analyzer, scorable=True, phrase=True,
                     field_boost=field_boost, B=B)


def MULTILANG_TEXT(
    name: str,
    lang_col: str = "lang",
    default: str | AnalyzerSpec = "en",
    specs: "dict[str, AnalyzerSpec] | None" = None,
    field_boost: float = 1.0,
    B: float | None = None,
) -> FieldSpec:
    """TEXT field with PER-ROW analyzer routing on a language column —
    the multilingual-corpus composition of the LANGUAGE(...) family
    (reference: analysis/analyzers.py::LanguageAnalyzer is per-FIELD;
    a mixed-language corpus there needs one index per language — here
    one index, routed per row, which is what an LLM-data pipeline over
    a web crawl actually has).

    ``specs`` maps language-column values to AnalyzerSpecs; by default
    every bundled LANGUAGE(code) resolves lazily, and any unknown /
    NULL language falls back to ``default`` (a code or an explicit
    spec) instead of raising — a 100 TB crawl always contains language
    codes you did not plan for, and a mid-build executor raise is the
    wrong failure mode (the fallback is observable: route stats come
    out of the postings themselves).

    Scale shape: routing happens INSIDE each Arrow batch — rows are
    grouped by language value and each group runs the same vectorized
    ``postings_arrays`` kernel with its language's spec, so there is no
    per-language scan, no explode, and no shuffle beyond the one the
    plain TEXT build already does. Query-side analysis uses the
    ``default`` spec; to query a specific language, analyze the query
    text with that LANGUAGE(...) spec (or pre-stemmed Term nodes).
    """
    from whoosh_spark.analysis import LANGUAGE

    default_spec = LANGUAGE(default) if isinstance(default, str) else default
    lang_specs = (
        tuple(sorted(specs.items())) if specs is not None else None
    )
    return FieldSpec(
        name, "text", analyzer=default_spec, scorable=True, phrase=True,
        field_boost=field_boost, B=B, lang_col=lang_col,
        lang_specs=lang_specs,
    )


def ID(name: str, unique: bool = False) -> FieldSpec:
    return FieldSpec(name, "id", unique=unique)


def KEYWORD(name: str, lowercase: bool = False) -> FieldSpec:
    spec = AnalyzerSpec(pattern=r"[^ \t\r\n]+", lowercase=lowercase, stoplist=None, minsize=1)
    return FieldSpec(name, "keyword", analyzer=spec)


def STEMTEXT(name: str, field_boost: float = 1.0, B: float | None = None) -> FieldSpec:
    """TEXT with StemmingAnalyzer (reference: fields.py TEXT(analyzer=
    StemmingAnalyzer()) idiom)."""
    return FieldSpec(name, "text", analyzer=STEMMING, scorable=True, phrase=True,
                     field_boost=field_boost, B=B)


def NGRAMWORDS(name: str, minsize: int = 3, maxsize: int = 3,
               field_boost: float = 1.0) -> FieldSpec:
    """Char-n-gram TEXT field (reference: fields.py::NGRAMWORDS ~L1050):
    substring search via the inverted index, scorable."""
    from whoosh_spark.analysis import NGRAM_WORDS

    return FieldSpec(name, "text", analyzer=NGRAM_WORDS(minsize, maxsize),
                     scorable=True, phrase=False, field_boost=field_boost)


def NUMERIC(name: str) -> FieldSpec:
    return FieldSpec(name, "numeric")


def DATETIME(name: str) -> FieldSpec:
    return FieldSpec(name, "datetime")


def BOOLEAN(name: str) -> FieldSpec:
    return FieldSpec(name, "boolean")


@dataclass
class Schema:
    """Ordered name -> FieldSpec map (reference: fields.py::Schema)."""

    fields: dict[str, FieldSpec] = dc_field(default_factory=dict)

    def __init__(self, *specs: FieldSpec):
        self.fields = {s.name: s for s in specs}

    def __getitem__(self, name: str) -> FieldSpec:
        return self.fields[name]

    def __contains__(self, name: str) -> bool:
        return name in self.fields

    def add(self, spec: FieldSpec) -> None:
        """Dynamic field addition (reference: Schema.add_field,
        tests/test_flexible.py)."""
        self.fields[spec.name] = spec

    def names(self) -> list[str]:
        return list(self.fields)

    def indexed_fields(self) -> list[FieldSpec]:
        return [s for s in self.fields.values() if s.indexed]

    def text_fields(self) -> list[FieldSpec]:
        return [s for s in self.fields.values() if s.kind == "text"]

    def unique_fields(self) -> list[str]:
        return [s.name for s in self.fields.values() if s.unique]


# ---------------------------------------------------------- serialization
# The reference pickles the Schema into the index TOC (index.py::TOC) so
# open_dir() needs no schema argument; here the schema serializes to plain
# JSON (versionable, greppable) stored as _schema.json by compat.create_in.


def schema_to_dict(schema: Schema) -> dict:
    import dataclasses

    def enc_analyzer(a: AnalyzerSpec | None):
        if a is None:
            return None
        d = dataclasses.asdict(a)
        for k in ("stoplist", "compound_words"):
            if d[k] is not None:
                d[k] = sorted(d[k])
        return d

    out = []
    for s in schema.fields.values():
        import dataclasses as _dc

        d = _dc.asdict(s)
        d["analyzer"] = enc_analyzer(s.analyzer)
        out.append(d)
    return {"version": 1, "fields": out}


def schema_from_dict(d: dict) -> Schema:
    import dataclasses

    an_names = {f.name for f in dataclasses.fields(AnalyzerSpec)}
    fs_names = {f.name for f in dataclasses.fields(FieldSpec)}

    def dec_analyzer(a):
        if a is None:
            return None
        a = {k: v for k, v in a.items() if k in an_names}
        for k in ("stoplist", "compound_words"):
            if a.get(k) is not None:
                a[k] = frozenset(a[k])
        if a.get("ngram") is not None:
            a["ngram"] = tuple(a["ngram"])
        for k in ("charmap", "substitutions"):
            if a.get(k) is not None:
                a[k] = tuple(tuple(x) for x in a[k])
        return AnalyzerSpec(**a)

    specs = []
    for f in d["fields"]:
        kw = {k: v for k, v in f.items() if k in fs_names}
        kw["analyzer"] = dec_analyzer(f.get("analyzer"))
        specs.append(FieldSpec(**kw))
    return Schema(*specs)


def transcript_schema() -> Schema:
    """Schema for the north-rule transcript table
    (conv_id, turn_idx, role, text, tool, ts) — BASELINE.json::input_hint."""
    return Schema(
        ID("conv_id"),
        NUMERIC("turn_idx"),
        ID("role"),
        TEXT("text"),
        ID("tool"),
        DATETIME("ts"),
    )


def documents_schema() -> Schema:
    """Schema for the driver's documents.parquet corpus
    (doc_id, text, lang, source, n_chars) — FIXTURES.md F2."""
    return Schema(
        TEXT("text"),
        ID("lang"),
        ID("source"),
        NUMERIC("n_chars"),
    )


SIMPLE_ANALYZER = SIMPLE
