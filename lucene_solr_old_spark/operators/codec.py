"""Posting-list block codec: delta + variable-byte, 128-doc blocks with
per-block skip and max-impact metadata.

Informed by the reference's postings layout
(``codecs/lucene41/Lucene41PostingsFormat.java:40-260``: 128-int blocks,
doc deltas, separate freq/pos streams; skip data =
``Lucene41SkipWriter.java:120-151``) but deliberately different where the
north star prescribes it: variable-byte instead of FOR bit-packing, and a
per-block **max-impact bound** (max_tf + max_norm_byte) that the reference
era lacks — it powers block-max pruning at query time (wand.py).

Block struct (one row of the `blocks` array column):
    first_docid:int, last_docid:int, count:int,
    max_tf:int, max_norm:int,            -- impact bound inputs
    docs:binary,     -- varbyte(delta docids, first delta = 0 vs first_docid)
    freqs:binary,    -- varbyte(tf per doc)
    norms:binary,    -- raw norm byte per doc
    positions:binary -- varbyte(per-doc position deltas, concatenated;
                        per-doc counts == freqs), empty if not stored

All encode/decode is vectorized NumPy inside Arrow-batched pandas UDFs —
no per-row Python in the Spark path.

Impact-bound correctness: BM25's per-posting partial
``tf/(tf + cache[norm])`` is increasing in tf and decreasing in
``cache[norm]``; ``cache`` is decreasing in the norm byte (larger byte =
shorter doc).  Hence ``max_tf/(max_tf + cache[max_norm])`` upper-bounds
every posting in the block for ANY collection stats — the bound survives
merges unchanged.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

BLOCKS_SCHEMA = (
    "array<struct<first_docid:int,last_docid:int,count:int,"
    "max_tf:int,max_norm:int,docs:binary,freqs:binary,norms:binary,"
    "positions:binary>>"
)

_THRESHOLDS = [1 << (7 * k) for k in range(1, 9)]


def vb_encode(arr) -> bytes:
    """Vectorized LEB128 (7-bit groups, MSB = continuation)."""
    a = np.asarray(arr, dtype=np.uint64)
    if a.size == 0:
        return b""
    nbytes = np.ones(a.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += a >= t
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    idx = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    rem = a.copy()
    remaining = nbytes.copy()
    while True:
        mask = remaining > 0
        if not mask.any():
            break
        last = remaining == 1
        b = (rem & np.uint64(0x7F)).astype(np.uint8)
        b = np.where(last, b, b | 0x80)
        out[idx[mask]] = b[mask]
        rem >>= np.uint64(7)
        idx += 1
        remaining -= 1
    return out.tobytes()


def vb_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode ``n`` varbyte values -> uint64 ndarray (vectorized)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = (b & 0x80) == 0
    gid = np.concatenate(([0], np.cumsum(ends)[:-1]))
    starts = np.concatenate(([0], np.flatnonzero(ends)[:-1] + 1))
    shift = ((np.arange(b.size) - starts[gid]) * 7).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, gid, (b & np.uint64(0x7F)).astype(np.uint64) << shift)
    return vals


def _vb_encode_split(a: np.ndarray, bounds: np.ndarray) -> list[bytes]:
    """Varbyte-encode ``a`` in ONE vectorized pass and return the encoded
    bytes sliced at the value indices in ``bounds`` (len(bounds) == number
    of slices + 1).  Byte-identical to calling :func:`vb_encode` per slice
    — LEB128 is per-value independent — but the numpy work (threshold
    scan, byte scatter) runs once over the whole posting list instead of
    once per 128-doc block, which removes the small-array numpy overhead
    that dominated encode time."""
    if a.size == 0:
        return [b""] * (len(bounds) - 1)
    a = a.astype(np.uint64, copy=False)
    nbytes = np.ones(a.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += a >= t
    byte_off = np.zeros(a.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=byte_off[1:])
    out = np.zeros(int(byte_off[-1]), dtype=np.uint8)
    idx = byte_off[:-1].copy()
    rem = a.copy()
    remaining = nbytes.copy()
    while True:
        mask = remaining > 0
        if not mask.any():
            break
        last = remaining == 1
        b = (rem & np.uint64(0x7F)).astype(np.uint8)
        b = np.where(last, b, b | 0x80)
        out[idx[mask]] = b[mask]
        rem >>= np.uint64(7)
        idx += 1
        remaining -= 1
    buf = out.tobytes()
    cuts = byte_off[bounds]
    return [buf[cuts[i]:cuts[i + 1]] for i in range(len(bounds) - 1)]


def encode_blocks(docids, freqs, norms, positions=None) -> list[dict]:
    """Posting arrays (docid-ascending) -> list of block dicts.

    ``positions``: flat int array of ALL positions (doc-major); per-doc
    counts are the freqs.  Stored delta-encoded within each doc.

    Vectorized across blocks: deltas, per-block maxima (reduceat) and the
    varbyte streams are computed once over the whole list, then sliced at
    block boundaries — byte-identical to the per-block formulation
    (differentially tested) at a fraction of the numpy call overhead.
    """
    docids = np.asarray(docids, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    n = docids.size
    if n == 0:
        return []
    starts = np.arange(0, n, BLOCK_SIZE, dtype=np.int64)
    ends = np.minimum(starts + BLOCK_SIZE, n)
    vbounds = np.concatenate((starts, [n]))

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    deltas[starts] = 0                 # first delta of each block is 0
    docs_parts = _vb_encode_split(deltas, vbounds)
    freqs_parts = _vb_encode_split(freqs, vbounds)
    max_tf = np.maximum.reduceat(freqs, starts)
    max_norm = np.maximum.reduceat(norms, starts)
    norm_bytes = norms.astype(np.uint8).tobytes()

    if positions is not None:
        pos_flat = np.asarray(positions, dtype=np.int64)
        pos_bounds = np.concatenate(([0], np.cumsum(freqs)))
        pdelta = np.empty(pos_flat.size, dtype=np.int64)
        if pos_flat.size:
            pdelta[0] = 0
            np.subtract(pos_flat[1:], pos_flat[:-1], out=pdelta[1:])
        doc_starts = pos_bounds[:-1]
        pdelta[doc_starts] = pos_flat[doc_starts]  # first pos per doc absolute
        pos_parts = _vb_encode_split(pdelta, pos_bounds[vbounds])
    else:
        pos_parts = None

    blocks = []
    for bi in range(starts.size):
        s, e = int(starts[bi]), int(ends[bi])
        blocks.append({
            "first_docid": int(docids[s]),
            "last_docid": int(docids[e - 1]),
            "count": e - s,
            "max_tf": int(max_tf[bi]),
            "max_norm": int(max_norm[bi]),
            "docs": docs_parts[bi],
            "freqs": freqs_parts[bi],
            "norms": norm_bytes[s:e],
            "positions": pos_parts[bi] if pos_parts is not None else b"",
        })
    return blocks


def decode_block(block: dict, with_positions: bool = False):
    """-> (docids int64, freqs int64, norms int64[, positions list-split])."""
    n = block["count"]
    deltas = vb_decode(bytes(block["docs"]), n).astype(np.int64)
    deltas[0] = 0
    docids = block["first_docid"] + np.cumsum(deltas)
    freqs = vb_decode(bytes(block["freqs"]), n).astype(np.int64)
    norms = np.frombuffer(bytes(block["norms"]), dtype=np.uint8).astype(np.int64)
    if not with_positions:
        return docids, freqs, norms
    total = int(freqs.sum())
    pdelta = vb_decode(bytes(block["positions"]), total).astype(np.int64)
    bounds = np.concatenate(([0], np.cumsum(freqs))).astype(np.int64)
    # undo per-doc delta: cumsum then re-zero at doc starts
    csum = np.cumsum(pdelta)
    base = np.zeros(total, dtype=np.int64)
    starts = bounds[:-1]
    # value at doc start should be pdelta[start] (absolute); offset correction
    prior = np.zeros(total, dtype=np.int64)
    prior[starts[1:]] = csum[starts[1:] - 1]
    np.maximum.accumulate(prior, out=prior)
    positions = csum - prior
    return docids, freqs, norms, positions, bounds


def decode_all(blocks: list[dict]):
    """Decode a full posting list -> (docids, freqs, norms) concatenated."""
    ds, fs, ns = [], [], []
    for blk in blocks:
        d, f, nb = decode_block(blk)
        ds.append(d); fs.append(f); ns.append(nb)
    if not ds:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return np.concatenate(ds), np.concatenate(fs), np.concatenate(ns)
