"""SmallFloat quantization vs an independent bit-level reimplementation.

Oracle style mirrors the reference's conformance suites (SURVEY.md §5):
exhaustive over the 8-bit space + randomized floats, checked against a
struct-based re-derivation of ``SmallFloat.java:78-98`` written without
NumPy so the two paths share no code.
"""

import math
import random
import struct

import numpy as np
import pytest

from lucene_solr_old_spark.functions.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    doclen_to_norm,
    float_to_byte315,
)


def _java_float_bits(f: float) -> int:
    """Float.floatToRawIntBits on the float32-rounded value (signed int)."""
    return struct.unpack(">i", struct.pack(">f", f))[0]


def _ref_float_to_byte315(f: float) -> int:
    bits = _java_float_bits(f)
    smallfloat = bits >> 21  # arithmetic shift, matches Java int >>
    fzero = (63 - 15) << 3
    if smallfloat <= fzero:
        return 0 if bits <= 0 else 1
    if smallfloat >= fzero + 0x100:
        return 255
    return smallfloat - fzero


def _ref_byte315_to_float(b: int) -> float:
    if b == 0:
        return 0.0
    bits = ((b & 0xFF) << 21) + ((63 - 15) << 24)
    return struct.unpack(">f", struct.pack(">i", bits))[0]


def test_exhaustive_byte_roundtrip():
    for b in range(256):
        f = byte315_to_float(b)
        assert float(f) == _ref_byte315_to_float(b)
        if b > 0:
            # decode->encode is identity for representable values
            assert int(float_to_byte315(f)) == b


def test_known_values():
    assert int(float_to_byte315(0.0)) == 0
    assert int(float_to_byte315(-1.0)) == 0
    assert int(float_to_byte315(1e-12)) == 1  # positive underflow -> 1
    assert int(float_to_byte315(1e12)) == 255  # overflow -> 255
    assert int(float_to_byte315(1.0)) == 124
    # truncation (round-down): anything in [1.0, 1.25) -> same byte
    assert int(float_to_byte315(1.2499)) == 124
    assert int(float_to_byte315(1.25)) == 125


def test_random_floats_vs_reference_bits():
    rng = random.Random(42)
    vals = [0.0, -0.0, 1.0, 0.5, 2.0, 7.5161928e9, 5.820766e-10]
    vals += [rng.uniform(-2, 2) for _ in range(2000)]
    vals += [rng.uniform(0, 1e-8) for _ in range(500)]
    vals += [rng.uniform(1e8, 1e11) for _ in range(500)]
    got = float_to_byte315(np.array(vals, dtype=np.float32))
    for v, g in zip(vals, got):
        assert int(g) == _ref_float_to_byte315(v), v


def test_norm_table_matches_bm25_definition():
    # NORM_TABLE[b] = 1/f^2 in float32 (BM25Similarity.java:126-134)
    for b in range(1, 256):
        f = np.float32(_ref_byte315_to_float(b))
        expected = np.float32(1.0) / (f * f)
        assert NORM_TABLE[b] == expected
    assert math.isinf(NORM_TABLE[0])


def test_doclen_norm_monotone_and_quantized():
    lens = np.arange(1, 5000)
    norms = doclen_to_norm(lens)
    # norm byte decreases (weakly) as doc length grows
    assert (np.diff(norms.astype(np.int64)) <= 0).all()
    # 1/sqrt(1) = 1.0 -> byte 124
    assert norms[0] == 124
    # quantization: distinct lengths collapse to <=256 buckets
    assert len(np.unique(norms)) < 100
