"""Span queries (full algebra) + CommonTermsQuery.

  * span_query — general span-tree execution: term / near(ordered,
    unordered) / or / not / first nodes, evaluated per doc by the EXACT
    per-doc kernels ported from the reference
    (``search/spans/NearSpansOrdered.java:202-354``,
    ``NearSpansUnordered.java:163-211``, ``SpanOrQuery.java``,
    ``SpanNotQuery.java``, ``SpanFirstQuery.java`` — see
    functions/phrasepos.py).  Scoring = ``SpanScorer.setFreqCurrentDoc``:
    freq = sum of 1/(matchWidth+1) over emitted matches, BM25 with the
    summed-idf weight over the tree's distinct terms
    (``spans/SpanWeight.java:55-63`` builds termStats from
    ``query.extractTerms`` — a Set).
  * span_near — SpanNearQuery over single-term clauses (the common case),
    expressed through span_query.
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

__all__ = ["span_near", "span_query", "span_score_frame",
           "common_terms_query", "multi_phrase"]


def _tree_terms(node) -> list[str]:
    """All leaf terms of a span tree, in-order (duplicates preserved)."""
    kind = node[0]
    if kind == "term":
        return [node[1]]
    if kind == "near":
        return [t for c in node[1] for t in _tree_terms(c)]
    if kind == "or":
        return [t for c in node[1] for t in _tree_terms(c)]
    if kind == "not":
        # extractTerms of SpanNotQuery includes ONLY the include side
        # (exclusion terms don't contribute to the weight,
        # ``SpanNotQuery.java extractTerms``) — but the exclude side's
        # postings are still needed for evaluation
        return _tree_terms(node[1])
    if kind in ("first", "posrange"):
        return _tree_terms(node[1])
    raise ValueError(f"unknown span node {node[0]!r}")


def _eval_terms(node) -> list[str]:
    """All terms needed to EVALUATE the tree (includes 'not' excludes)."""
    if node[0] == "not":
        return _eval_terms(node[1]) + _eval_terms(node[2])
    if node[0] == "term":
        return [node[1]]
    if node[0] in ("first", "posrange"):
        return _eval_terms(node[1])
    return [t for c in node[1] for t in _eval_terms(c)]


def _required_terms(node) -> set[str]:
    """Terms that MUST occur for the tree to match (candidate pruning:
    the conjunctive leapfrog Lucene gets from sub-span iteration)."""
    kind = node[0]
    if kind == "term":
        return {node[1]}
    if kind == "near":
        return set().union(*[_required_terms(c) for c in node[1]])
    if kind == "or":
        return set()  # any one suffices
    if kind == "not":
        return _required_terms(node[1])
    if kind in ("first", "posrange"):
        return _required_terms(node[1])
    raise ValueError(f"unknown span node {node[0]!r}")


def _span_tree_udf(tree, f32: bool = True):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.phrasepos import eval_span_tree, span_freq

    @pandas_udf("double")
    def sfreq(termpos_series):
        out = []
        for rows in termpos_series:
            iv = {r["term"]: [(int(p), int(p) + 1) for p in r["pos"]]
                  for r in rows}
            out.append(span_freq(eval_span_tree(tree, iv), f32=f32))
        return pd.Series(out)

    return sfreq


def span_query(index: InvertedIndex, tree, k: int = 10,
               precision: str = "float32") -> DataFrame:
    """Execute a span-query tree; top-k (key, score).

    tree = ("term", t) | ("near", [children], slop, in_order)
         | ("or", [children]) | ("not", include, exclude)
         | ("first", child, n)      (terms must be pre-analyzed)
    """
    scored = span_score_frame(index, tree, precision)
    return _topk(scored.select("seg", "docid", "score"), index, k, precision)


def span_score_frame(index: InvertedIndex, tree,
                     precision: str = "float32") -> DataFrame:
    """(seg, docid, sfreq, score) for a span-query tree — the unsorted
    scoring frame.

    Plan: postings pruned to the tree's leaf terms (parquet pushdown on
    term) -> explode -> per-doc (term, positions) collection -> Arrow
    kernel evaluates the tree -> BM25 -> TakeOrderedAndProject. Candidate
    docs are pre-filtered to those containing every REQUIRED term (the
    same conjunctive pruning Lucene's sub-span leapfrog does).

    Scale bound (BENCH_r03 measures this at 1.2M docs): the candidate
    frame is distributed (one groupBy partition per shuffle slot) and the
    Python kernel consumes it in Arrow batches capped at
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` = 10k docs
    (session.py), so per-task memory is <= batch * max-doclen positions
    regardless of how common the query terms are; worst case (all-stopword
    trees, empty required set) degrades to a scan of the rarest-term df,
    the same bound as the reference's leapfrog.
    """
    if not index.with_positions:
        raise ValueError("index built without positions")
    eval_terms = sorted(set(_eval_terms(tree)))
    weight_terms = sorted(set(_tree_terms(tree)))
    required = sorted(_required_terms(tree))
    scorer = _Scorer(index, weight_terms, precision)
    # SpanWeight: idf summed over extractTerms' distinct terms
    if precision == "float64":
        from .search import idf64
        w = 0.0
        for t in weight_terms:
            w += idf64(scorer.tstats.get(t, (0, 0))[0], scorer.stats.max_doc)
        weight_value = w * 2.2
    else:
        acc = np.float32(0.0)
        for t in weight_terms:
            acc = acc + scorer.stats.idf(scorer.tstats.get(t, (0, 0))[0])
        weight_value = float(acc * (scorer.stats.k1 + np.float32(1.0)))
    stype = "double" if precision == "float64" else "float"

    rows = (index.postings.where(F.col("term").isin(eval_terms))
            .select("seg", "term", F.explode("postings").alias("p"))
            .select("seg", "term",
                    F.col("p.docid").alias("docid"),
                    F.col("p.norm").alias("norm"),
                    F.col("p.positions").alias("pos")))
    req_set = set(required)
    per_doc = rows.groupBy("seg", "docid").agg(
        F.first("norm").alias("norm"),
        F.sum(F.when(F.col("term").isin(list(req_set)), 1).otherwise(0))
        .alias("nreq"),
        F.collect_list(F.struct("term", "pos")).alias("termpos"),
    )
    if req_set:
        per_doc = per_doc.where(F.col("nreq") == len(req_set))
    return (per_doc
            .withColumn("sfreq", _span_tree_udf(
                tree, f32=(precision != "float64"))(F.col("termpos")))
            .where(F.col("sfreq") > 0)
            .withColumn(
                "score",
                (F.lit(weight_value).cast(stype)
                 * F.col("sfreq").cast(stype))
                / (F.col("sfreq").cast(stype) + scorer.norm_factor()))
            .select("seg", "docid", "sfreq", "score"))


def span_near(index: InvertedIndex, query_text: str, slop: int = 2,
              in_order: bool = True, k: int = 10,
              precision: str = "float32") -> DataFrame:
    """SpanNearQuery over the analyzed terms of ``query_text`` — exact
    NearSpansOrdered / NearSpansUnordered semantics via span_query."""
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if len(terms) < 2:
        from .search import search_terms
        return search_terms(index, query_text, "OR", k, precision=precision)
    tree = ("near", [("term", t) for t in terms], slop, in_order)
    return span_query(index, tree, k, precision)


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
