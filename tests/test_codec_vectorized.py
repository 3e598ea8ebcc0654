"""Differential test: the vectorized encode_blocks (one varbyte pass per
posting list, sliced at block boundaries) is byte-identical to the
original per-block formulation it replaced (r6 optimization)."""

import random

import numpy as np

from lucene_solr_old_spark.operators.codec import (BLOCK_SIZE, decode_block,
                                                   encode_blocks, vb_encode)


def _encode_blocks_per_block(docids, freqs, norms, positions=None):
    """The pre-r6 reference implementation: one vb_encode per block."""
    docids = np.asarray(docids, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    n = docids.size
    blocks = []
    pos_flat = pos_bounds = None
    if positions is not None:
        pos_flat = np.asarray(positions, dtype=np.int64)
        pos_bounds = np.concatenate(([0], np.cumsum(freqs)))
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        d = docids[s:e]
        f = freqs[s:e]
        nb = norms[s:e]
        deltas = np.diff(d, prepend=d[0])
        if positions is not None:
            p = pos_flat[pos_bounds[s]:pos_bounds[e]]
            pdelta = np.diff(p, prepend=0)
            doc_starts = (pos_bounds[s:e] - pos_bounds[s]).astype(np.int64)
            pdelta[doc_starts] = p[doc_starts]
            pos_bin = vb_encode(pdelta)
        else:
            pos_bin = b""
        blocks.append({
            "first_docid": int(d[0]), "last_docid": int(d[-1]),
            "count": int(e - s), "max_tf": int(f.max()),
            "max_norm": int(nb.max()), "docs": vb_encode(deltas),
            "freqs": vb_encode(f), "norms": nb.astype(np.uint8).tobytes(),
            "positions": pos_bin,
        })
    return blocks


def _random_postings(rng, n):
    docids = np.cumsum([rng.randint(1, 300) for _ in range(n)])
    freqs = np.array([rng.randint(1, 9) for _ in range(n)])
    norms = np.array([rng.randint(0, 255) for _ in range(n)])
    pos = []
    for f in freqs:
        cur = 0
        for _ in range(f):
            cur += rng.randint(0, 5000)
            pos.append(cur)
    return docids, freqs, norms, pos


def test_vectorized_encode_byte_identical():
    rng = random.Random(5)
    sizes = [1, 2, 127, 128, 129, 255, 256, 300, 777]
    for n in sizes:
        docids, freqs, norms, pos = _random_postings(rng, n)
        for p in (None, pos):
            assert encode_blocks(docids, freqs, norms, p) == \
                _encode_blocks_per_block(docids, freqs, norms, p)


def test_vectorized_encode_roundtrip_positions():
    rng = random.Random(9)
    docids, freqs, norms, pos = _random_postings(rng, 260)
    blocks = encode_blocks(docids, freqs, norms, pos)
    got_d, got_f, got_p = [], [], []
    for blk in blocks:
        d, f, nb, p, bounds = decode_block(blk, with_positions=True)
        got_d.extend(d.tolist())
        got_f.extend(f.tolist())
        got_p.extend(p.tolist())
    assert got_d == list(docids)
    assert got_f == list(freqs)
    assert got_p == list(pos)
