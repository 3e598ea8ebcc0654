"""Codec round-trip property tests (the BasePostingsFormatTestCase analogue,
SURVEY.md §5 (d)): encode -> decode == identity on randomized posting lists.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_solr_old_spark.operators.codec import (
    BLOCK_SIZE, decode_all, decode_block, encode_blocks, vb_decode, vb_encode)


@given(st.lists(st.integers(min_value=0, max_value=2 ** 62), max_size=600))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (vb_decode(vb_encode(arr), len(vals)) == arr).all()


def _random_postings(rng, n):
    docids = np.sort(rng.choice(np.arange(n * 7), size=n, replace=False))
    freqs = rng.integers(1, 50, size=n)
    norms = rng.integers(1, 256, size=n)
    positions = []
    for f in freqs:
        positions.append(np.sort(rng.choice(np.arange(5000), size=f,
                                            replace=False)))
    flat = np.concatenate(positions) if positions else np.zeros(0, int)
    return docids, freqs, norms, positions, flat


def test_block_roundtrip_various_sizes():
    rng = np.random.default_rng(42)
    for n in [1, 2, 127, 128, 129, 255, 256, 1000, 4096]:
        docids, freqs, norms, positions, flat = _random_postings(rng, n)
        blocks = encode_blocks(docids, freqs, norms, flat)
        assert len(blocks) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        d, f, nb = decode_all(blocks)
        assert (d == docids).all()
        assert (f == freqs).all()
        assert (nb == norms).all()
        # skip metadata
        for blk in blocks:
            bd, bf, bn = decode_block(blk)
            assert blk["first_docid"] == bd[0]
            assert blk["last_docid"] == bd[-1]
            assert blk["max_tf"] == bf.max()
            assert blk["max_norm"] == bn.max()


def test_positions_roundtrip():
    rng = np.random.default_rng(7)
    n = 300
    docids, freqs, norms, positions, flat = _random_postings(rng, n)
    blocks = encode_blocks(docids, freqs, norms, flat)
    got_pos = []
    for blk in blocks:
        d, f, nb, p, bounds = decode_block(blk, with_positions=True)
        for i in range(len(d)):
            got_pos.append(p[bounds[i]:bounds[i + 1]])
    assert len(got_pos) == n
    for exp, got in zip(positions, got_pos):
        assert (got == exp).all()


def test_impact_bound_is_valid_upper_bound():
    """max_tf/(max_tf + cache[max_norm]) >= tf/(tf + cache[norm]) for every
    posting in the block, for any avgdl (the WAND pruning invariant)."""
    from lucene_solr_old_spark.functions.bm25 import bm25_cache

    rng = np.random.default_rng(3)
    docids, freqs, norms, _pos, flat = _random_postings(rng, 500)
    blocks = encode_blocks(docids, freqs, norms)
    for avgdl in [1.0, 7.3, 55.0, 400.0]:
        cache = bm25_cache(np.float32(avgdl))
        for blk in blocks:
            d, f, nb = decode_block(blk)
            actual = f / (f + cache[nb])
            bound = blk["max_tf"] / (blk["max_tf"] + cache[blk["max_norm"]])
            assert (actual <= bound + 1e-9).all()


def test_empty_and_singleton():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert len(vb_decode(b"", 0)) == 0
    blocks = encode_blocks([5], [3], [100], [0, 2, 9])
    d, f, nb, p, bounds = decode_block(blocks[0], with_positions=True)
    assert list(d) == [5] and list(f) == [3] and list(nb) == [100]
    assert list(p) == [0, 2, 9]
