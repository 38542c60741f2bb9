"""Numeric utilities mirroring Whoosh's parity-critical encodings.

Reference semantics (public Whoosh, src/whoosh/util/numeric.py::length_to_byte /
byte_to_length, ~L350): per-(doc, field) token counts are quantized to one
byte on a log scale (base 1.0325, /8 pre-scale, saturating at 255 for
lengths >= 68000); BM25 uses the *dequantized* per-doc length and the exact
total for the average.

NOTE: /root/reference was an empty mount at build time (see SURVEY.md
"Provenance"), so the exact saturation branch could not be re-read from the
fork. We clamp to 255 explicitly, which matches every plausible variant for
lengths < ~28k tokens (all fixtures and the synthetic corpora are far below
that); re-verify against the fork when the mount is populated.

Rounding: Python's round() and numpy's rint() are both round-half-to-even,
so the scalar and vectorized paths agree bit-for-bit.
"""

from __future__ import annotations

import math
import zlib

import numpy as np

_LOG_BASE = 1.0325
_LN_BASE = math.log(_LOG_BASE)


def length_to_byte(length: int | None) -> int:
    """Quantize a field length (token count) to one byte, Whoosh-style."""
    if length is None or length <= 0:
        return 0
    if length >= 68000:
        return 255
    return min(255, int(round(math.log(length / 8.0 + 1) / _LN_BASE)))


def _byte_to_length(bytenum: int) -> int:
    return int(round((_LOG_BASE**bytenum - 1) * 8))


# Precomputed 256-entry decode table (reference keeps the same cache).
BYTE_TO_LENGTH: tuple[int, ...] = tuple(_byte_to_length(b) for b in range(256))


def byte_to_length(bytenum: int) -> int:
    return BYTE_TO_LENGTH[bytenum]


_B2L_NP = np.asarray(BYTE_TO_LENGTH, dtype=np.int64)


def length_to_byte_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized length_to_byte over an int array."""
    arr = np.asarray(lengths, dtype=np.float64)
    with np.errstate(divide="ignore"):
        b = np.rint(np.log(arr / 8.0 + 1.0) / _LN_BASE)
    b = np.where(arr <= 0, 0, b)
    b = np.where(arr >= 68000, 255, np.minimum(b, 255))
    return b.astype(np.int64)


def byte_to_length_np(bytenums: np.ndarray) -> np.ndarray:
    return _B2L_NP[np.asarray(bytenums, dtype=np.int64)]


def quantized_length(length: int) -> int:
    """dl as BM25 sees it: decode(encode(token_count))."""
    return BYTE_TO_LENGTH[length_to_byte(length)]


def quantized_length_np(lengths: np.ndarray) -> np.ndarray:
    return _B2L_NP[length_to_byte_np(lengths)]


def term_bucket(term: str, n_buckets: int) -> int:
    """Deterministic, portable term -> bucket for partition pruning.

    crc32 is available identically on the driver (zlib) and as a Spark
    built-in (F.crc32), so bucket pruning predicates computed driver-side
    match the layout written by executors.
    """
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein distance (reference: src/whoosh/automata/lev.py
    semantics — FuzzyTerm matches terms within maxdist edits)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * lb
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[lb]


def levenshtein_np(terms: np.ndarray, word: str) -> np.ndarray:
    """Distances from each term to ``word`` (driver-side lexicon expansion;
    the lexicon is tiny relative to postings so this is not a hot path —
    the DataFrame path uses Spark's built-in F.levenshtein instead)."""
    return np.fromiter((levenshtein(t, word) for t in terms), dtype=np.int64, count=len(terms))


# --- varint / delta packing for posting blocks -----------------------------
# Reference: src/whoosh/util/varints.py::varint (~L30) and the delta-coded
# doc ids inside codec blocks (src/whoosh/codec/whoosh3.py::W3Block, ~L700).
# Re-implemented vectorized (numpy) for use inside pack/unpack pandas UDFs.


def delta_varint_encode(values: np.ndarray) -> bytes:
    """Delta + LEB128 varint encode a sorted non-negative int64 array."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=deltas[1:])
    # Vectorized LEB128: max 10 bytes per uint64.
    n = deltas.size
    out = np.zeros((n, 10), dtype=np.uint8)
    lengths = np.ones(n, dtype=np.int64)
    rest = deltas.copy()
    for i in range(10):
        out[:, i] = (rest & np.uint64(0x7F)).astype(np.uint8)
        rest >>= np.uint64(7)
        more = rest > 0
        if not more.any():
            break
        out[more, i] |= 0x80
        lengths[more] = i + 2
    mask = np.arange(10) < lengths[:, None]
    return out[mask].tobytes()


def delta_varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of delta_varint_encode -> int64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.int64)
    is_cont = (raw & 0x80) != 0
    ends = np.flatnonzero(~is_cont)
    starts = np.concatenate(([0], ends[:-1] + 1))
    payload = (raw & 0x7F).astype(np.uint64)
    # Shift each byte by 7 * (position within its varint) and segment-sum.
    pos_in_group = np.arange(raw.size) - np.repeat(starts, ends - starts + 1)
    shifted = payload << (np.uint64(7) * pos_in_group.astype(np.uint64))
    cums = np.concatenate(([0], np.cumsum(shifted, dtype=np.uint64)))
    deltas = (cums[ends + 1] - cums[starts]).astype(np.uint64)
    return np.cumsum(deltas, dtype=np.uint64).astype(np.int64)


def varint_encode_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a non-negative int array; also return per-value byte
    lengths so callers can slice the buffer into sub-ranges (block packing
    encodes a whole partition's deltas in ONE vectorized pass, then carves
    per-block byte windows from the length cumsum)."""
    arr = np.asarray(values, dtype=np.uint64)
    n = arr.size
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    out = np.zeros((n, 10), dtype=np.uint8)
    lengths = np.ones(n, dtype=np.int64)
    rest = arr.copy()
    for i in range(10):
        out[:, i] = (rest & np.uint64(0x7F)).astype(np.uint8)
        rest >>= np.uint64(7)
        more = rest > 0
        if not more.any():
            break
        out[more, i] |= 0x80
        lengths[more] = i + 2
    mask = np.arange(10) < lengths[:, None]
    return out[mask].tobytes(), lengths


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Plain LEB128 decode (no delta accumulation) -> int64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, memoryview)) else buf
    if raw.size == 0:
        return np.empty(0, dtype=np.int64)
    is_cont = (raw & 0x80) != 0
    ends = np.flatnonzero(~is_cont)
    starts = np.concatenate(([0], ends[:-1] + 1))
    payload = (raw & 0x7F).astype(np.uint64)
    pos_in_group = np.arange(raw.size) - np.repeat(starts, ends - starts + 1)
    shifted = payload << (np.uint64(7) * pos_in_group.astype(np.uint64))
    cums = np.concatenate(([0], np.cumsum(shifted, dtype=np.uint64)))
    return (cums[ends + 1] - cums[starts]).astype(np.int64)


def segmented_cumsum(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each segment start index (int64).

    Used to turn per-block delta streams back into absolute doc ids across
    MANY blocks in one vectorized pass (first value of each segment is
    absolute, the rest are deltas).
    """
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return v
    c = np.cumsum(v)
    sizes = np.diff(np.concatenate((seg_starts, [v.size])))
    offsets = np.repeat(c[seg_starts] - v[seg_starts], sizes)
    return c - offsets


def inline_rows(spark, rows: list[tuple], schema: str, threshold: int = 512):
    """Small literal DataFrames without ``createDataFrame``'s ~1 s of py4j
    round-trips per call (measured; see BENCH.md query-latency notes).

    ``rows`` is a list of tuples matching the DDL ``schema``. Empty input
    and lists beyond ``threshold`` fall back to ``createDataFrame`` — an
    empty literal array has no type, and a huge N-ary literal expression
    is slower to construct than one serialized Arrow batch and risks
    codegen size limits."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    if not rows or len(rows) > threshold:
        return spark.createDataFrame(rows, schema)
    st = _parse_datatype_string(schema)
    arr = F.array(*[
        F.struct(*[
            F.lit(v).cast(f.dataType).alias(f.name)
            for v, f in zip(r, st.fields)
        ])
        for r in rows
    ])
    return (spark.range(1).select(F.explode(arr).alias("_r"))
            .select(*[F.col(f"_r.{f.name}") for f in st.fields]))
