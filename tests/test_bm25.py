"""BM25 scoring-formula oracle (FIXTURES.md §3; TestSimilarityBase-style).

Expected values computed by an independent struct-based float32 emulation
of the Java operations (no shared code with the production kernel).
"""

import math
import struct

import numpy as np

from lucene_solr_old_spark.functions.bm25 import Bm25Stats, avgdl, idf
from lucene_solr_old_spark.functions.smallfloat import doclen_to_norm


def f32(x: float) -> float:
    """Round a python float to float32 — the independent oracle's cast."""
    return struct.unpack(">f", struct.pack(">f", x))[0]


def _ref_byte315_to_float(b: int) -> float:
    if b == 0:
        return 0.0
    bits = ((b & 0xFF) << 21) + ((63 - 15) << 24)
    return struct.unpack(">f", struct.pack(">i", bits))[0]


def ref_score(tf: int, df: int, max_doc: int, sum_ttf: int, doc_len: int,
              k1: float = 1.2, b: float = 0.75) -> float:
    """Independent re-derivation of BM25Similarity.java:200-238."""
    k1, b = f32(k1), f32(b)
    idf_ = f32(math.log(1 + (max_doc - df + 0.5) / (df + 0.5)))
    avg = f32(sum_ttf / float(max_doc)) if sum_ttf > 0 else 1.0
    norm_byte = int(doclen_to_norm(doc_len))
    decode = f32(1.0) / f32(f32(_ref_byte315_to_float(norm_byte)) ** 2)
    decode = f32(decode)
    cache = f32(k1 * f32(f32(1 - b) + f32(f32(b * decode) / avg)))
    weight = f32(f32(idf_) * f32(k1 + 1))
    return f32(f32(weight * tf) / f32(tf + cache))


CASES = [
    # (tf, df, max_doc, sum_ttf, doc_len)
    (1, 1, 1, 10, 10),          # single-doc corpus
    (1, 1, 1000, 50000, 50),    # rare term
    (3, 500, 1000, 50000, 50),  # common term
    (1, 1000, 1000, 50000, 50), # df == maxDoc (idf still > 0 in Lucene 4.x)
    (100, 10, 1000, 50000, 50), # tf saturation
    (1, 10, 1000, 50000, 1),    # shortest doc
    (2, 10, 1000, 50000, 4096), # long doc
    (5, 3, 7, 133, 19),
    (7, 123, 100000, 12345678, 250),
    # quantization boundary lengths: 1/sqrt(L) near byte315 steps
    (1, 10, 1000, 50000, 63),
    (1, 10, 1000, 50000, 64),
    (1, 10, 1000, 50000, 65),
]


def test_idf_formula():
    # uses maxDoc, not numDocs (BM25Similarity.java:165-170)
    assert float(idf(1, 1)) == f32(math.log(1 + (1 - 1 + 0.5) / 1.5))
    assert float(idf(500, 1000)) == f32(math.log(1 + 500.5 / 500.5))


def test_avgdl():
    assert float(avgdl(0, 10)) == 1.0
    assert float(avgdl(50000, 1000)) == f32(50000 / 1000.0)


def test_score_fixtures():
    for tf, df, max_doc, sum_ttf, doc_len in CASES:
        stats = Bm25Stats(max_doc, sum_ttf)
        norm = doclen_to_norm(doc_len)
        got = float(stats.score(df, np.array([tf]), np.array([norm]))[0])
        exp = ref_score(tf, df, max_doc, sum_ttf, doc_len)
        assert got == exp, (tf, df, max_doc, sum_ttf, doc_len, got, exp)


def test_score_monotone_in_tf_decreasing_in_len():
    stats = Bm25Stats(1000, 50000)
    tfs = np.arange(1, 50)
    norms = np.full(49, doclen_to_norm(50))
    s = stats.score(10, tfs, norms)
    assert (np.diff(s) > 0).all()  # increasing in tf, saturating
    lens = np.array([1, 10, 100, 1000])
    s2 = stats.score(10, np.full(4, 2), doclen_to_norm(lens))
    assert (np.diff(s2) < 0).all()  # decreasing in doc length


def test_disjunction_is_plain_float32_sum():
    # coord == 1 for BM25 -> SHOULD scores just add (Similarity.java:122-124)
    stats = Bm25Stats(1000, 50000)
    norm = doclen_to_norm(50)
    a = stats.score(10, np.array([2]), np.array([norm]))[0]
    b_ = stats.score(100, np.array([1]), np.array([norm]))[0]
    total = np.float32(a) + np.float32(b_)
    assert total.dtype == np.float32
    assert float(total) == f32(float(a) + float(b_))
