"""The north-rule input table: multi-turn conversation/agent transcripts.

BASELINE.json::input_hint fixes the shape:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` — at production scale an Iceberg table of 10^12 turns; in
this sandbox we synthesise it deterministically (no external data) two ways:

1. :func:`turns_from_documents` — derives turns from the driver's
   ``documents.parquet`` with *pure column expressions* that have an exact
   DuckDB mirror (:data:`TURNS_FROM_DOCUMENTS_SQL`), so transcript queries
   can be oracle-checked value-for-value at sf=0.01.
2. :func:`synth_turns` — generates an arbitrary number of turns from
   ``spark.range`` with hash-derived zipfian text. Fully distributed and
   deterministic (seeded xxhash64, no Python RNG, no driver loop), so the
   same call scales from 10^4 turns in tests to 10^12 on a cluster — this
   is the corpus the scaling benchmark (bench.py / scripts/scaling_bench.py)
   indexes at two parallelism levels.

Docnum parity (SURVEY.md §1.1 D2): add order is (conv_id, turn_idx), and
``doc_id = row_number() over (order by conv_id, turn_idx) - 1`` via the
scalable two-pass assignment in indexing/docids.py. conv_ids are zero-padded
so lexicographic order == numeric order in every engine/collation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_spark.indexing.docids import assign_doc_ids

# --------------------------------------------------------------------------
# 1. Turns derived from the documents corpus (oracle-checkable)
# --------------------------------------------------------------------------
# Each document becomes one conversation; its space-separated word stream is
# chunked into fixed 12-word turns. Roles alternate user/assistant; every 4th
# turn is a tool call. All expressions below have the exact DuckDB
# equivalents in TURNS_FROM_DOCUMENTS_SQL — keep the two in lockstep.

WORDS_PER_TURN = 12


def turns_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> transcript turns (north-rule shape)."""
    w = WORDS_PER_TURN
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(F.split(F.col("text"), " ")) / w).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), i * w + 1, w)),
    )
    sent = docs.select(
        F.concat(F.lit("c"), F.lpad(F.col("doc_id").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        F.col("doc_id").alias("_src_doc"),
        F.posexplode(chunks).alias("turn_idx", "text"),
    ).where(F.col("text") != "")
    return sent.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
        "text",
        F.when(F.col("turn_idx") % 4 == 3, "search").alias("tool"),
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_interval(secs=F.col("_src_doc") * 60 + F.col("turn_idx"))
        ).alias("ts"),
    )


# DuckDB mirror of turns_from_documents (documents is a pre-registered view).
# generate_subscripts / list slices are 1-based -> offsets match posexplode.
TURNS_FROM_DOCUMENTS_SQL = """
turns_w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
turns_chunks AS (
  SELECT doc_id,
         [array_to_string(w[(i - 1) * 12 + 1 : i * 12], ' ')
          FOR i IN generate_series(1, CAST(ceil(len(w) / 12.0) AS BIGINT))] AS chunks
  FROM turns_w
),
turns_raw AS (
  SELECT 'c' || lpad(doc_id::VARCHAR, 8, '0') AS conv_id,
         doc_id AS _src_doc,
         unnest(chunks) AS text,
         generate_subscripts(chunks, 1) - 1 AS turn_idx
  FROM turns_chunks
),
turns0 AS (
  SELECT conv_id, turn_idx::INTEGER AS turn_idx,
         CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         text,
         CASE WHEN turn_idx % 4 = 3 THEN 'search' END AS tool,
         TIMESTAMP '2025-01-01 00:00:00'
           + to_seconds(_src_doc * 60 + turn_idx) AS ts
  FROM turns_raw WHERE text <> ''
),
turns AS (
  SELECT *, row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id
  FROM turns0
)
"""


def transcript_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-id-assigned transcript turns for a testdata scale factor."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return assign_doc_ids(turns_from_documents(docs), ["conv_id", "turn_idx"])


# --------------------------------------------------------------------------
# 2. Pure-generative corpus for scale benchmarking
# --------------------------------------------------------------------------

# 256-word vocabulary mixing common conversational/agent terms (some are
# reference STOP_WORDS on purpose — realistic corpora contain them and the
# StopFilter must pay for dropping them) with long-tail technical terms.
_VOCAB = (
    "the a and to of in is it you that for on with as at this have from "
    "spark query index search token term score rank join merge shuffle "
    "partition executor driver cluster batch stream table column row schema "
    "parquet iceberg snapshot commit checkpoint resume lineage metric "
    "analyze tokenize lowercase stopword position phrase prefix wildcard "
    "fuzzy range boolean filter mask collapse facet group sort limit page "
    "weight length average document conversation turn role user assistant "
    "tool call result error retry timeout memory disk network broadcast "
    "salt skew split block max wand prune heap tie break idf bm25 okapi "
    "please thanks help explain show find look run build test fix check "
    "code python java scala rust data file read write load save open close "
    "list map set dict array string number float integer byte bit hash "
    "model train infer embed vector cosine similar near duplicate exact "
    "sample slice chunk shard bucket key value pair tuple record field "
    "plan optimize push down prune scan seek skip next replace wrap bound "
    "quality signal noise clean dirty valid invalid missing null empty "
    "small large huge tiny fast slow quick lazy eager cold warm hot "
    "first last early late begin end start stop pause continue repeat "
    "agent action thought observation answer question context window state "
    "apply reduce expand collect count sum min avg total stat digest "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "monday tuesday wednesday red green blue north south east west up down "
    "one two three four five six seven eight nine ten hundred thousand "
    "zero final draft review approve reject submit cancel confirm deny"
).split()
assert len(_VOCAB) >= 256
_VOCAB = _VOCAB[:256]

_ROLES = ("user", "assistant")
_TOOLS = ("search", "code", "browse", "calc")


def synth_turns(
    spark: SparkSession,
    n_turns: int,
    turns_per_conv: int = 20,
    words_per_turn: int = 24,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcript turns at any scale, generated distributed.

    Text is ``words_per_turn`` words drawn from a 256-word vocabulary with a
    zipf-ish skew: word index = floor(256 * u^3) where u = uniform hash of
    (seed, turn, word slot) — cubing concentrates mass on low indices, giving
    the hot/cold term split the salted-shuffle and WAND paths need to be
    exercised honestly. Everything is a column expression: no Python RNG, no
    per-row UDF, embarrassingly parallel, identical at any parallelism.

    doc_id == id: conv_id/turn_idx are derived *from* a zero-padded range id,
    so (conv_id, turn_idx) order is id order and the dense docnum is free —
    the 10^12-scale corpus never needs the two-pass assignment.
    """
    base = spark.range(0, n_turns, 1, num_partitions or spark.sparkContext.defaultParallelism)
    u = lambda k: (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(k)), F.lit(2**31)) / F.lit(2.0**31)
    )
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_turn)),
        lambda i: vocab[
            F.floor(
                F.lit(256.0)
                * F.pow(
                    F.pmod(F.xxhash64(F.col("id"), F.lit(seed), i), F.lit(2**31))
                    / F.lit(2.0**31),
                    F.lit(3.0),
                )
            ).cast("int")
        ],
    )
    return base.select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("c"), F.lpad((F.col("id") / turns_per_conv).cast("long").cast("string"), 12, "0")
        ).alias("conv_id"),
        F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int").alias("turn_idx"),
        F.when(F.pmod(F.col("id"), 2) == 0, "user").otherwise("assistant").alias("role"),
        F.concat_ws(" ", words).alias("text"),
        F.when(
            u(101) < 0.15,
            F.array(*[F.lit(t) for t in _TOOLS])[
                F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(7)), F.lit(len(_TOOLS))).cast(
                    "int"
                )
            ],
        ).alias("tool"),
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_interval(secs=F.col("id"))
        ).alias("ts"),
    )


# --------------------------------------------------------------------------
# 3. FIXTURES.md F1 corpus (reference parity query-set corpus)
# --------------------------------------------------------------------------

# VOCAB per FIXTURES.md F1: testdata words ∪ stopword hits ∪ sub-minsize
# tokens ∪ the 'tbd' quirk ∪ dotted token ∪ case probes ∪ unicode probes.
FIXTURE_VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark group query row data slow filter customer line value "
    "agg column big vector dup a and of to in is it x q z tbd v1.2.3 "
    "Spark SPARK café naïve 東京"
).split()


def fixture_rows(n_convs: int = 20, turns_per_conv: int = 5, seed: int = 42) -> list[dict]:
    """FIXTURES.md F1 generator, driver-side (unit/correctness sizes only).

    Deterministic: numpy default_rng(seed); text = 5-80 zipf(s=1.3) draws
    from FIXTURE_VOCAB; every 7th global turn embeds the phrase bigram
    "hash join"; every 13th embeds stopwords + 1-char tokens; roles cycle
    user/assistant/system/tool; ts = 2026-01-01Z + 60s * global turn.
    """
    import numpy as np
    from datetime import datetime, timedelta, timezone

    rng = np.random.default_rng(seed)
    roles = ["user", "assistant", "system", "tool"]
    tools = ["bash", "search", "editor"]
    base_ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    g = 0
    nv = len(FIXTURE_VOCAB)
    for c in range(n_convs):
        for t in range(turns_per_conv):
            n_tok = int(rng.integers(5, 81))
            idx = np.minimum(rng.zipf(1.3, size=n_tok) - 1, nv - 1)
            words = [FIXTURE_VOCAB[i] for i in idx]
            if g % 7 == 0:
                words[len(words) // 2 : len(words) // 2] = ["hash", "join"]
            if g % 13 == 0:
                words += ["the", "a", "x", "q"]
            role = roles[t % 4]
            rows.append(
                {
                    "conv_id": f"conv{c:06d}",
                    "turn_idx": t,
                    "role": role,
                    "text": " ".join(words),
                    "tool": tools[g % 3] if role == "tool" else "",
                    "ts": base_ts + timedelta(seconds=60 * g),
                }
            )
            g += 1
    for i, r in enumerate(rows):  # already (conv_id, turn_idx) ordered
        r["doc_id"] = i
    return rows


def fixture_corpus(spark: SparkSession, n_convs: int = 20, turns_per_conv: int = 5,
                   seed: int = 42) -> DataFrame:
    rows = fixture_rows(n_convs, turns_per_conv, seed)
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, doc_id long",
    )
