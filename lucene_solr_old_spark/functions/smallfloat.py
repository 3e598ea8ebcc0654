"""Lucene SmallFloat 8-bit float quantization, bit-exact.

Semantics derived from the reference implementation at
``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98``
(``floatToByte315`` / ``byte315ToFloat``: 3 mantissa bits, zero exponent 15).

These kernels are the norm-encoding step of BM25 scoring
(``BM25Similarity.java:95-97,126-134``): the per-document field length is
stored lossily as ``floatToByte315(boost / sqrt(length))`` and decoded through
``NORM_TABLE[b] = 1 / f^2``.  Rank-identity with the reference requires the
exact same quantization, so everything here works on raw IEEE-754 float32
bits via NumPy.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "float_to_byte315",
    "byte315_to_float",
    "NORM_TABLE",
    "encode_norm",
    "doclen_to_norm",
]

_FZERO = (63 - 15) << 3  # zero point shifted into the 8-bit float's space


def float_to_byte315(f) -> np.ndarray:
    """Vectorized ``SmallFloat.floatToByte315``.

    Values <= 0 map to byte 0; positive underflow maps to 1; overflow to 255;
    otherwise truncation of the float32 bit pattern to 3 mantissa bits with a
    rebased exponent.  Accepts scalar or array; returns uint8 ndarray.
    """
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    # Java `bits >> 21` is an arithmetic shift on the raw int bits.
    smallfloat = bits >> (24 - 3)
    out = (smallfloat - _FZERO).astype(np.int64)
    out = np.where(smallfloat >= _FZERO + 0x100, 255, out)
    out = np.where(smallfloat <= _FZERO, np.where(bits <= 0, 0, 1), out)
    return out.astype(np.uint8)


def byte315_to_float(b) -> np.ndarray:
    """Vectorized ``SmallFloat.byte315ToFloat`` -> float32 ndarray."""
    by = np.asarray(b, dtype=np.int64) & 0xFF
    bits = (by << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32)
    return np.where(by == 0, np.float32(0.0), out).astype(np.float32)


def _build_norm_table() -> np.ndarray:
    """``NORM_TABLE[b] = 1/f^2`` per ``BM25Similarity.java:126-134`` (float32)."""
    f = byte315_to_float(np.arange(256))
    with np.errstate(divide="ignore"):
        table = (np.float32(1.0) / (f * f)).astype(np.float32)
    return table


NORM_TABLE: np.ndarray = _build_norm_table()


def encode_norm(boost, field_length) -> np.ndarray:
    """``encodeNormValue`` per ``BM25Similarity.java:95-97``:
    ``floatToByte315(boost / (float) Math.sqrt(fieldLength))``.

    ``sqrt`` runs in float64 (Java ``Math.sqrt``), the division in float32.
    """
    boost32 = np.asarray(boost, dtype=np.float32)
    root = np.sqrt(np.asarray(field_length, dtype=np.float64)).astype(np.float32)
    with np.errstate(divide="ignore"):
        # length 0 -> 1/0 = +inf -> byte 255, same as Java's floatToByte315
        return float_to_byte315(boost32 / root)


# scalar doclen -> norm-byte memo: document lengths are small ints that
# repeat constantly (one lookup per doc at build time, one per scored doc
# in driver-side oracles), and the vectorized numpy path costs ~35us per
# scalar call.  The memo stores the EXACT value the vectorized path
# produces, so this is a pure speedup, not a semantic change.
_DOCLEN_NORM_MEMO: dict[int, int] = {}


def doclen_to_norm(field_length):
    """Norm byte for boost=1.0 (the engine's fixed configuration).

    Scalar ints take a memoized fast path; arrays go through the
    vectorized kernel unchanged."""
    if isinstance(field_length, int):
        hit = _DOCLEN_NORM_MEMO.get(field_length)
        if hit is None:
            hit = int(encode_norm(np.float32(1.0), field_length))
            if len(_DOCLEN_NORM_MEMO) < (1 << 20):
                _DOCLEN_NORM_MEMO[field_length] = hit
        return np.uint8(hit)
    return encode_norm(np.float32(1.0), field_length)
