"""Span queries + CommonTermsQuery.

  * span_near — ``search/spans/SpanNearQuery`` (ordered/unordered proximity
    over position lists, ``NearSpansOrdered.java``): a document matches when
    all clause terms occur within a window of span length
    <= (#terms + slop); span freq = number of such (greedy, non-overlapping
    anchored) matches.  Simplified from the reference's full span algebra:
    single-term clauses only, freq = anchored-window count.
  * common_terms_query — ``lucene/queries/.../CommonTermsQuery.java``: the
    query's terms are split at a document-frequency threshold; low-df terms
    drive matching (disjunction), high-df (stopword-like) terms only add
    score to docs already matched by a low-df term — the classic
    head-term-cost dodge, same idea as the build-time salting.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import get_analyzer
from .indexer import InvertedIndex
from .search import _Scorer, _topk, term_score_frame

__all__ = ["span_near", "common_terms_query", "multi_phrase"]


def _span_freq_udf(n_terms: int, slop: int, in_order: bool):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    max_span = n_terms + slop  # window length budget

    @pandas_udf("double")
    def freq(slots_series):
        out = []
        for slots in slots_series:
            arrays = [np.asarray(s["pos"], dtype=np.int64) for s in slots]
            count = 0
            for a in arrays[0]:
                # greedily place each subsequent term as close as possible
                lo = a
                hi = a
                prev = a
                ok = True
                for arr in arrays[1:]:
                    if in_order:
                        nxt = arr[arr > prev]
                        if nxt.size == 0:
                            ok = False
                            break
                        p = int(nxt.min())
                    else:
                        if arr.size == 0:
                            ok = False
                            break
                        p = int(arr[np.abs(arr - a).argmin()])
                        if p == a:
                            others = arr[arr != a]
                            if others.size == 0:
                                ok = False
                                break
                            p = int(others[np.abs(others - a).argmin()])
                    lo = min(lo, p)
                    hi = max(hi, p)
                    prev = p
                    if hi - lo + 1 > max_span:
                        ok = False
                        break
                if ok:
                    count += 1
            out.append(float(count))
        return pd.Series(out)

    return freq


def span_near(index: InvertedIndex, query_text: str, slop: int = 2,
              in_order: bool = True, k: int = 10) -> DataFrame:
    """Top-k (key, score) where score = BM25 on the span frequency with the
    summed-idf phrase weight (spans score through the Similarity like
    phrases)."""
    if not index.with_positions:
        raise ValueError("index built without positions")
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if len(terms) < 2:
        from .search import search_terms
        return search_terms(index, query_text, "OR", k)
    scorer = _Scorer(index, terms)
    weight_value = scorer.phrase_weight()

    frames = []
    for i, t in enumerate(terms):
        f = (index.postings.where(F.col("term") == t)
             .select("seg", F.explode("postings").alias("p"))
             .select("seg", F.col("p.docid").alias("docid"),
                     F.col("p.norm").alias("norm"),
                     F.col("p.positions").alias("pos"))
             .withColumn("slot", F.lit(i)))
        frames.append(f)
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    per_doc = union.groupBy("seg", "docid").agg(
        F.count("*").alias("nslots"),
        F.first("norm").alias("norm"),
        F.array_sort(F.collect_list(F.struct("slot", "pos"))).alias("slots"),
    ).where(F.col("nslots") == len(terms))
    scored = (per_doc
              .withColumn("sfreq",
                          _span_freq_udf(len(terms), slop, in_order)(
                              F.col("slots")))
              .where(F.col("sfreq") > 0)
              .withColumn(
                  "score",
                  (F.lit(weight_value).cast("float")
                   * F.col("sfreq").cast("float"))
                  / (F.col("sfreq").cast("float") + scorer.norm_factor()))
              .select("seg", "docid", "score"))
    return _topk(scored, index, k)


def common_terms_query(index: InvertedIndex, query_text: str,
                       max_df_ratio: float = 0.3, k: int = 10,
                       precision: str = "float32") -> DataFrame:
    """Split terms at df/maxDoc > max_df_ratio; low-df terms form the
    matching disjunction, high-df terms contribute score only to docs the
    low-df group already matched.  Falls back to a plain disjunction when
    every term is high-df (CommonTermsQuery's allTermsRequired=false path).
    """
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if not terms:
        return index.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    max_doc, _ = index.collection_stats()
    tstats = index.term_stats(terms)
    low = sorted({t for t in terms
                  if tstats.get(t, (0, 0))[0] <= max_df_ratio * max_doc})
    high = sorted(set(terms) - set(low))
    if not low:
        low, high = high, []

    low_frame, _ = term_score_frame(index, low, precision=precision)
    low_agg = low_frame.groupBy("seg", "docid").agg(
        F.sum("score").alias("low_score"))
    if high:
        high_frame, _ = term_score_frame(index, high, precision=precision)
        high_agg = high_frame.groupBy("seg", "docid").agg(
            F.sum("score").alias("high_score"))
        # semi-restricted join: high-df postings only evaluated for docs in
        # the (small) low-df match set
        joined = low_agg.join(high_agg, ["seg", "docid"], "left")
        per_doc = joined.select(
            "seg", "docid",
            (F.col("low_score") + F.coalesce(F.col("high_score"),
                                             F.lit(0.0))).alias("score"))
    else:
        per_doc = low_agg.withColumnRenamed("low_score", "score")
    return _topk(per_doc, index, k, precision)


def multi_phrase(index: InvertedIndex, slots: list[list[str]],
                 k: int = 10, precision: str = "float32") -> DataFrame:
    """MultiPhraseQuery (``search/MultiPhraseQuery.java``): an exact phrase
    where each position slot accepts a SET of terms (e.g. synonyms):
    slots = [["new"], ["york", "jersey"]].  Per slot, the union of the
    member terms' (shifted) positions feeds the same intersection used by
    the exact-phrase plan; weight = summed idf over each slot's first
    matching term set (the reference sums idf over all terms).
    """
    if not index.with_positions:
        raise ValueError("index built without positions")
    analyzer = get_analyzer(index.analyzer)
    norm_slots = [
        sorted({t.term for txt in slot for t in analyzer(txt)})
        for slot in slots
    ]
    all_terms = sorted({t for s in norm_slots for t in s})
    scorer = _Scorer(index, all_terms, precision)
    # idf summed over every term of every slot (MultiPhraseQuery weights
    # with idfExplain over the flat term array)
    flat = [t for s in norm_slots for t in s]
    s_acc = np.float32(0.0)
    for t in flat:
        s_acc = s_acc + scorer.stats.idf(scorer.tstats.get(t, (0, 0))[0])
    weight_value = float(s_acc * (scorer.stats.k1 + np.float32(1.0)))
    stype = "double" if precision == "float64" else "float"

    frames = []
    for i, slot_terms in enumerate(norm_slots):
        f = (index.postings.where(F.col("term").isin(slot_terms))
             .select("seg", F.explode("postings").alias("p"))
             .select("seg", F.col("p.docid").alias("docid"),
                     F.col("p.norm").alias("norm"),
                     F.transform(F.col("p.positions"),
                                 lambda c: c - F.lit(i)).alias("pos"))
             .groupBy("seg", "docid")
             .agg(F.first("norm").alias("norm"),
                  F.array_sort(F.array_distinct(
                      F.flatten(F.collect_list("pos")))).alias("pos"))
             .withColumn("slot", F.lit(i)))
        frames.append(f)
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    per_doc = union.groupBy("seg", "docid").agg(
        F.count("*").alias("nslots"),
        F.first("norm").alias("norm"),
        F.array_sort(F.collect_list(F.struct("slot", "pos"))).alias("slots"),
    ).where(F.col("nslots") == len(norm_slots))
    inter = per_doc.withColumn(
        "common",
        F.aggregate(
            F.expr("slice(slots, 2, size(slots) - 1)"),
            F.col("slots")[0]["pos"],
            lambda acc, s: F.array_intersect(acc, s["pos"]),
        ),
    ).withColumn("pfreq", F.size("common").cast("double")) \
     .where(F.col("pfreq") > 0)
    scored = inter.withColumn(
        "score",
        (F.lit(weight_value).cast(stype) * F.col("pfreq").cast(stype))
        / (F.col("pfreq").cast(stype) + scorer.norm_factor()),
    ).select("seg", "docid", "score")
    return _topk(scored, index, k, precision)
