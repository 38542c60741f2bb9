"""Length quantization + varint/delta roundtrip (SURVEY.md Tier 0)."""

import numpy as np

from whoosh_spark.util import (
    BYTE_TO_LENGTH,
    byte_to_length,
    byte_to_length_np,
    delta_varint_decode,
    delta_varint_encode,
    length_to_byte,
    length_to_byte_np,
    quantized_length,
    term_bucket,
)


def test_length_byte_basics():
    assert length_to_byte(0) == 0
    assert length_to_byte(None) == 0
    assert length_to_byte(68000) == 255
    assert length_to_byte(10**9) == 255
    assert byte_to_length(0) == 0
    # monotone non-decreasing decode table
    assert all(BYTE_TO_LENGTH[i] <= BYTE_TO_LENGTH[i + 1] for i in range(255))


def test_length_byte_hand_values():
    # hand-computed from the formula round(log(n/8 + 1, 1.0325))
    import math

    for n in (1, 2, 5, 10, 40, 100, 1000, 27000):
        expected = min(255, int(round(math.log(n / 8.0 + 1, 1.0325))))
        assert length_to_byte(n) == expected
    # quantization is idempotent through decode/encode
    for n in (1, 7, 33, 80, 500, 4000):
        dl = quantized_length(n)
        assert quantized_length(dl) == dl


def test_length_np_matches_scalar():
    ns = np.array([0, 1, 2, 5, 10, 40, 100, 1000, 27000, 68000, 70000])
    got = length_to_byte_np(ns)
    assert got.tolist() == [length_to_byte(int(n)) for n in ns]
    assert byte_to_length_np(got).tolist() == [byte_to_length(int(b)) for b in got]


def test_varint_roundtrip():
    for arr in (
        np.array([], dtype=np.int64),
        np.array([0]),
        np.array([5]),
        np.array([0, 1, 2, 3]),
        np.array([10, 300, 70000, 70001, 2**40]),
        np.sort(np.random.RandomState(42).randint(0, 2**45, size=1000)),
    ):
        enc = delta_varint_encode(np.asarray(arr, dtype=np.int64))
        dec = delta_varint_decode(enc)
        assert dec.tolist() == sorted(np.asarray(arr, dtype=np.int64).tolist())


def test_term_bucket_portable():
    import zlib

    assert term_bucket("spark", 32) == zlib.crc32(b"spark") % 32
    assert 0 <= term_bucket("東京", 8) < 8
