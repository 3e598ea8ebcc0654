"""Block-max pruned top-k query kernel over the compressed index.

The scale-path query engine: per segment, a NumPy MaxScore/WAND-family
kernel runs over varbyte blocks (codec.py), skipping blocks whose
max-impact upper bound cannot lift any candidate into the top-k.  The
reference era has skip lists but NO score-bound metadata
(``Lucene41SkipWriter.java:120-151``); block-max pruning is the
north-star-mandated extension (BASELINE.json).

Plan shape (designed for 1000-executor scale):
  * `postings.filter(term IN q)` — parquet predicate pushdown on the term
    column prunes row groups before any decode;
  * `groupBy(seg).applyInPandas(kernel)` — one small task per segment, no
    doc-level shuffle; only ≤|q| posting rows move;
  * per-seg top-k rows (k per segment) join docmeta for keys (late
    materialization) and merge on the driver via TakeOrderedAndProject.

Algorithm (disjunction): term-at-a-time MaxScore with block-max skipping —
terms ordered by upper bound descending; after the first term, a new doc is
admitted only if the remaining terms' summed bound can still reach the
current threshold θ (k-th best score so far), and a block is decoded only
if it intersects surviving candidates or its own bound + remaining bound
reaches θ.  Conjunction: leapfrog intersection in df-ascending order
(``ConjunctionScorer.java:47-57``) with block-range skipping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.bm25 import Bm25Stats
from ..functions.tokenizer import get_analyzer
from .codec import decode_block
from .indexer import InvertedIndex

__all__ = ["wand_search", "batch_wand_search"]

_SAFETY = np.float32(1.0 + 1e-5)  # absorbs f32 rounding in bound comparisons


def _block_arrays(blocks) -> dict:
    """Columnar views of a term's block metadata."""
    return {
        "first": np.array([b["first_docid"] for b in blocks], dtype=np.int64),
        "last": np.array([b["last_docid"] for b in blocks], dtype=np.int64),
        "max_tf": np.array([b["max_tf"] for b in blocks], dtype=np.int64),
        "max_norm": np.array([b["max_norm"] for b in blocks], dtype=np.int64),
        "blocks": blocks,
    }


def _block_ub(meta, weight, cache: np.ndarray,
              mult: int = 1, dtype=np.float32) -> np.ndarray:
    mtf = meta["max_tf"].astype(dtype)
    ub = (weight * (mtf / (mtf + cache[meta["max_norm"]]))) * dtype(_SAFETY)
    return ub * dtype(mult) if mult != 1 else ub


def _decode_scores(blk, weight, cache, mult: int = 1, dtype=np.float32):
    # repeated clause: the partial is scaled AFTER rounding (s + s),
    # matching BooleanQuery's per-clause sum of identical TermScorer values
    d, f, nb = decode_block(blk)
    fv = f.astype(dtype)
    s = (weight * fv) / (fv + cache[nb])
    return d, (s * dtype(mult) if mult != 1 else s)


def _topk_threshold(scores: np.ndarray, k: int):
    if scores.size < k:
        return scores.dtype.type(-np.inf)
    return np.partition(scores, -k)[-k]


def _merge_acc(acc_d, acc_s, new_d, new_s, admit_new: bool):
    """Merge sorted accumulator with one block's postings."""
    pos = np.searchsorted(acc_d, new_d)
    pos_c = np.clip(pos, 0, acc_d.size - 1) if acc_d.size else pos
    hit = acc_d.size > 0
    is_hit = (acc_d[pos_c] == new_d) if hit else np.zeros(new_d.size, bool)
    if is_hit.any():
        acc_s[pos_c[is_hit]] += new_s[is_hit]
    if admit_new:
        miss = ~is_hit
        if miss.any():
            acc_d = np.concatenate([acc_d, new_d[miss]])
            acc_s = np.concatenate([acc_s, new_s[miss]])
            order = np.argsort(acc_d, kind="mergesort")
            acc_d = acc_d[order]
            acc_s = acc_s[order]
    return acc_d, acc_s


def _disjunctive_kernel(term_rows, weights, cache, k, mults=None,
                        dtype=np.float32):
    """term_rows: [(term, blocks)]; returns (docids, scores) top-k pool."""
    metas = []
    for term, blocks in term_rows:
        m = _block_arrays(blocks)
        m["term"] = term
        m["w"] = weights[term]
        m["mult"] = 1 if mults is None else mults.get(term, 1)
        m["ub"] = (float(_block_ub(m, m["w"], cache, m["mult"],
                                   dtype).max()) if blocks else 0.0)
        metas.append(m)
    metas.sort(key=lambda m: -m["ub"])
    tail_ub = np.cumsum([m["ub"] for m in metas][::-1])[::-1]  # incl. self

    acc_d = np.zeros(0, dtype=np.int64)
    acc_s = np.zeros(0, dtype=dtype)
    theta = dtype(-np.inf)
    for ti, m in enumerate(metas):
        rem_after = dtype(tail_ub[ti + 1] if ti + 1 < len(metas) else 0.0)
        admit_new = (dtype(m["ub"]) + rem_after) >= theta
        bubs = _block_ub(m, m["w"], cache, m["mult"], dtype)
        for bi, blk in enumerate(m["blocks"]):
            # skip: block can neither admit a new top-k doc nor touch an acc doc
            touches_acc = False
            if acc_d.size:
                lo = np.searchsorted(acc_d, m["first"][bi])
                touches_acc = lo < acc_d.size and acc_d[lo] <= m["last"][bi]
            if not touches_acc and (
                    not admit_new or (bubs[bi] + rem_after) < theta):
                continue
            d, s = _decode_scores(blk, m["w"], cache, m["mult"], dtype)
            acc_d, acc_s = _merge_acc(
                acc_d, acc_s, d, s,
                admit_new and (bubs[bi] + rem_after) >= theta)
        if acc_s.size >= k:
            theta = _topk_threshold(acc_s, k)
            # prune accumulator docs that can never reach theta
            if rem_after > 0:
                keep = (acc_s + rem_after) >= theta
                acc_d, acc_s = acc_d[keep], acc_s[keep]
    return acc_d, acc_s


def _conjunctive_kernel(term_rows, weights, cache, k, mults=None,
                        dtype=np.float32):
    """Leapfrog: intersect docid sets in df-ascending (cost) order, then sum
    scores over the survivors."""
    # decode lazily: smallest list first
    metas = []
    for term, blocks in term_rows:
        m = _block_arrays(blocks)
        m["term"] = term
        m["w"] = weights[term]
        m["mult"] = 1 if mults is None else mults.get(term, 1)
        m["ndocs"] = int(sum(b["count"] for b in blocks))
        metas.append(m)
    metas.sort(key=lambda m: m["ndocs"])

    cand = None
    decoded = []
    for m in metas:
        ds, fs, ns = [], [], []
        for bi, blk in enumerate(m["blocks"]):
            if cand is not None and cand.size:
                # block-range skip against current candidates (leapfrog)
                lo = np.searchsorted(cand, m["first"][bi])
                if lo >= cand.size or cand[lo] > m["last"][bi]:
                    continue
            elif cand is not None:
                break
            d, f, nb = decode_block(blk)
            ds.append(d); fs.append(f); ns.append(nb)
        if not ds:
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        d = np.concatenate(ds)
        f = np.concatenate(fs)
        nb = np.concatenate(ns)
        if cand is not None:
            keep = np.isin(d, cand, assume_unique=True)
            d, f, nb = d[keep], f[keep], nb[keep]
            if d.size == 0:
                return np.zeros(0, np.int64), np.zeros(0, dtype)
        cand = d
        decoded.append((m["w"], m["mult"], d, f, nb))

    scores = np.zeros(cand.size, dtype=dtype)
    for w, mult, d, f, nb in decoded:
        keep = np.isin(d, cand, assume_unique=True)
        fv = f[keep].astype(dtype)
        part = (w * fv) / (fv + cache[nb[keep]])
        scores += part * dtype(mult) if mult != 1 else part
    return cand, scores


def wand_search(index: InvertedIndex, query_text: str, k: int = 10,
                mode: str = "OR", precision: str = "float32") -> DataFrame:
    """Top-k (key, score) via the block-max kernel. Requires a compressed
    index (indexer.compress_index)."""
    if "blocks" not in index.postings.columns:
        raise ValueError("wand_search requires a compressed index")
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if not terms:
        return index.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    mults = {t: terms.count(t) for t in set(terms)}  # clause multiplicity
    terms = sorted(set(terms))
    max_doc, sum_ttf = index.collection_stats()
    stats = Bm25Stats(max_doc, sum_ttf)
    tstats = index.term_stats(terms)
    if precision == "float64":
        # oracle-precision twin: same norm quantization, float64 math in
        # fixed order so ANSI SQL reproduces the kernel's scores (the gate
        # hash-compares values instead of a rows-only check)
        from .search import cache64, idf64
        avgdl = sum_ttf / max_doc if max_doc else 1.0
        weights = {t: idf64(tstats.get(t, (0, 0))[0], max_doc) * 2.2
                   for t in terms}
        cache = np.array(cache64(avgdl), dtype=np.float64)
        dtype = np.float64
    else:
        weights = {t: stats.weight_value(tstats.get(t, (0, 0))[0])
                   for t in terms}
        cache = stats.cache
        dtype = np.float32
    conj = mode.upper() == "AND"
    n_terms = len(terms)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        term_rows = [(r.term, list(r.blocks))
                     for r in pdf.itertuples(index=False)]
        if conj:
            if len(term_rows) < n_terms:  # some term absent in this segment
                return pd.DataFrame({"seg": [], "docid": [], "score": []})
            d, s = _conjunctive_kernel(term_rows, weights, cache, k,
                                       mults, dtype)
        else:
            d, s = _disjunctive_kernel(term_rows, weights, cache, k,
                                       mults, dtype)
        if d.size > k:
            # per-segment top-k (ties -> lower docid): sort by (-score, docid)
            order = np.lexsort((d, -s))[:k]
            d, s = d[order], s[order]
        return pd.DataFrame({
            "seg": np.full(d.size, seg, dtype=np.int32),
            "docid": d.astype(np.int32),
            "score": s.astype(dtype),
        })

    matched = index.postings.where(F.col("term").isin(terms))
    stype = "DOUBLE" if precision == "float64" else "FLOAT"
    per_seg = matched.select("seg", "term", "blocks").groupBy("seg").applyInPandas(
        kernel, schema=f"seg INT, docid INT, score {stype}")
    out = per_seg.join(index.docmeta.select("seg", "docid", "key"),
                       ["seg", "docid"])
    return (out.select("key", "score")
            .orderBy(F.desc("score"), F.asc("key"))
            .limit(k))


def batch_wand_search(index: InvertedIndex, queries: list[tuple],
                      k: int = 10) -> DataFrame:
    """Whole query workload through the block-max kernel in ONE job.

    queries: [(qid, query_text, mode)] with mode in {"OR", "AND"}.
    Returns (qid, rank, key, score).

    Plan: one term-pruned scan of the union of all query terms; ONE
    applyInPandas per segment runs every query's kernel against that
    segment's blocks (per-segment top-k), then a per-qid window merges
    leaves — the per-query Spark scheduling floor is amortized across the
    workload exactly like operators/batch.py, but with MaxScore block
    skipping instead of the relational aggregation."""
    if "blocks" not in index.postings.columns:
        raise ValueError("batch_wand_search requires a compressed index")
    analyzer = get_analyzer(index.analyzer)
    qinfo: list[tuple] = []           # (qid, [terms], mults, conj)
    all_terms: set[str] = set()
    for qid, text, mode in queries:
        terms = [t.term for t in analyzer(text)]
        if not terms:
            continue
        mults = {t: terms.count(t) for t in set(terms)}
        qinfo.append((qid, sorted(set(terms)), mults,
                      mode.upper() == "AND"))
        all_terms.update(terms)
    if not qinfo:
        return index.docmeta.sparkSession.createDataFrame(
            [], "qid INT, rank INT, key STRING, score FLOAT")
    max_doc, sum_ttf = index.collection_stats()
    stats = Bm25Stats(max_doc, sum_ttf)
    tstats = index.term_stats(sorted(all_terms))
    weights = {t: stats.weight_value(tstats.get(t, (0, 0))[0])
               for t in all_terms}
    cache = stats.cache

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        by_term = {r.term: list(r.blocks)
                   for r in pdf.itertuples(index=False)}
        out_q, out_d, out_s = [], [], []
        for qid, terms, mults, conj in qinfo:
            rows = [(t, by_term[t]) for t in terms if t in by_term]
            if not rows:
                continue
            if conj:
                if len(rows) < len(terms):
                    continue
                d, s = _conjunctive_kernel(rows, weights, cache, k, mults)
            else:
                d, s = _disjunctive_kernel(rows, weights, cache, k, mults)
            if d.size > k:
                order = np.lexsort((d, -s))[:k]
                d, s = d[order], s[order]
            out_q.extend([qid] * d.size)
            out_d.extend(d.tolist())
            out_s.extend(s.tolist())
        return pd.DataFrame({
            "qid": np.asarray(out_q, dtype=np.int32),
            "seg": np.full(len(out_q), seg, dtype=np.int32),
            "docid": np.asarray(out_d, dtype=np.int32),
            "score": np.asarray(out_s, dtype=np.float32),
        })

    matched = index.postings.where(F.col("term").isin(sorted(all_terms)))
    per_seg = (matched.select("seg", "term", "blocks")
               .groupBy("seg")
               .applyInPandas(kernel,
                              schema="qid INT, seg INT, docid INT, "
                                     "score FLOAT"))
    from pyspark.sql import Window
    with_keys = per_seg.join(index.docmeta.select("seg", "docid", "key"),
                             ["seg", "docid"])
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("key"))
    return (with_keys.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "rank", "key", "score")
            .orderBy("qid", "rank"))
