"""ClassicSimilarity (TF-IDF) scoring — the reference's pre-BM25 default.

``search/similarities/DefaultSimilarity.java`` + ``TFIDFSimilarity.java``:

  score(q, d) = coord(q, d) * queryNorm(q)
                * sum_t [ tf(freq) * idf(t)^2 * boost_t * norm(d) ]

  tf(freq)   = sqrt(freq)                       (:120-122)
  idf(t)     = ln(maxDoc / (df + 1)) + 1        (:138-140)
  queryNorm  = 1 / sqrt(sum_t (idf*boost)^2)    (:67-69)
  coord      = overlap / maxOverlap             (:61-63)
  norm(d)    = byte315 decode of 1/sqrt(numTerms)  (:87-115; the engine's
               norm byte already stores floatToByte315(1/sqrt(doclen)),
               shared with BM25 — same byte, different decode use)

This is the per-field pluggable-similarity surface (``Similarity``
hierarchy, 34 files): the engine exposes BM25 (default) and TFIDF through
the same relational plan; only the score expression differs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions.smallfloat import byte315_to_float
from ..functions.tokenizer import get_analyzer
from .indexer import InvertedIndex
from .search import _topk

__all__ = ["search_tfidf", "tfidf_score_frame", "search_lmdirichlet",
           "search_dfr_gl2", "search_ib_spl"]

# decoded norm per byte — DefaultSimilarity.NORM_TABLE (:95-97)
_NORM_TABLE = [float(byte315_to_float(b)) for b in range(256)]


def tfidf_score_frame(index: InvertedIndex, terms: list[str],
                      precision: str = "float32",
                      boost: float = 1.0) -> DataFrame:
    """(seg, docid, score, nmatched) per candidate doc (coord applied)."""
    stype = "double" if precision == "float64" else "float"
    max_doc, _ = index.collection_stats()
    tstats = index.term_stats(terms)
    uniq = sorted(set(terms))
    mult = {t: terms.count(t) for t in uniq}
    idf = {t: math.log(max_doc / (tstats.get(t, (0, 0))[0] + 1.0)) + 1.0
           for t in uniq}
    # sumOfSquaredWeights over CLAUSES (a repeated term contributes its
    # squared weight once per clause — BooleanWeight.sumOfSquaredWeights)
    ssw = sum(mult[t] * (idf[t] * boost) ** 2 for t in uniq)
    query_norm = 1.0 / math.sqrt(ssw) if ssw > 0 else 0.0
    max_overlap = len(terms)

    # per-term value = idf^2 * boost * queryNorm * clause multiplicity
    value = {t: idf[t] * idf[t] * boost * query_norm * mult[t] for t in uniq}
    vmap = F.create_map(*[x for t, v in value.items()
                          for x in (F.lit(t), F.lit(v).cast(stype))])
    norm_arr = F.lit(list(_NORM_TABLE)).cast(f"array<{stype}>")

    exploded = (index.postings.where(F.col("term").isin(uniq))
                .select("seg", "term", F.explode("postings").alias("p"))
                .select("seg", "term",
                        F.col("p.docid").alias("docid"),
                        F.col("p.freq").alias("freq"),
                        F.col("p.norm").alias("norm")))
    tf = F.sqrt(F.col("freq").cast(stype))
    decoded = F.element_at(norm_arr, F.col("norm") + 1)
    scored = exploded.withColumn(
        "tscore", tf * vmap[F.col("term")] * decoded)
    agg = scored.groupBy("seg", "docid").agg(
        F.sum("tscore").alias("_sum"),
        F.sum(F.create_map(*[x for t, m in mult.items()
                             for x in (F.lit(t), F.lit(m))])[F.col("term")])
        .alias("nmatched"))
    coord = (F.col("nmatched").cast(stype)
             / F.lit(float(max_overlap)).cast(stype))
    return agg.select("seg", "docid",
                      (F.col("_sum") * coord).cast(stype).alias("score"),
                      "nmatched")


def search_tfidf(index: InvertedIndex, query_text: str, k: int = 10,
                 mode: str = "OR",
                 precision: str = "float32") -> DataFrame:
    """Top-k (key, score) under ClassicSimilarity."""
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if not terms:
        return index.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    frame = tfidf_score_frame(index, terms, precision)
    if mode.upper() == "AND":
        frame = frame.where(F.col("nmatched") == len(terms))
    return _topk(frame.select("seg", "docid", "score"), index, k, precision)


def search_lmdirichlet(index: InvertedIndex, query_text: str, k: int = 10,
                       mu: float = 2000.0,
                       precision: str = "float32") -> DataFrame:
    """LM Dirichlet similarity (``search/similarities/
    LMDirichletSimilarity.java:56-62``):

      score_t(freq, dl) = max(0, ln(1 + freq / (mu * p(t|C)))
                               + ln(mu / (dl + mu)))
      p(t|C) = (totalTermFreq + 1) / (numberOfFieldTokens + 1)
               (``LMSimilarity.DefaultCollectionModel:153-155``)

    dl is the QUANTIZED doc length decoded from the norm byte
    (``SimilarityBase.decodeNormValue`` = 1/decoded^2 — the engine's LQ64
    table).  Per-term scores clamp at 0 (the paper's negative-score guard),
    then sum over matching terms."""
    from .search import LQ64

    stype = "double" if precision == "float64" else "float"
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if not terms:
        return index.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    uniq = sorted(set(terms))
    max_doc, sum_ttf = index.collection_stats()
    tstats = index.term_stats(uniq)
    p = {t: (tstats.get(t, (0, 0))[1] + 1.0) / (sum_ttf + 1.0)
         for t in uniq}
    mult = {t: terms.count(t) for t in uniq}
    pmap = F.create_map(*[x for t, v in p.items()
                          for x in (F.lit(t), F.lit(v).cast(stype))])
    mmap = F.create_map(*[x for t, m in mult.items()
                          for x in (F.lit(t), F.lit(float(m)).cast(stype))])
    lq_arr = F.lit(list(LQ64)).cast(f"array<{stype}>")

    exploded = (index.postings.where(F.col("term").isin(uniq))
                .select("seg", "term", F.explode("postings").alias("p"))
                .select("seg", "term",
                        F.col("p.docid").alias("docid"),
                        F.col("p.freq").alias("freq"),
                        F.col("p.norm").alias("norm")))
    dl = F.element_at(lq_arr, F.col("norm") + 1)
    raw = (F.log(F.lit(1.0).cast(stype)
                 + F.col("freq").cast(stype)
                 / (F.lit(mu).cast(stype) * pmap[F.col("term")]))
           + F.log(F.lit(mu).cast(stype) / (dl + F.lit(mu).cast(stype))))
    scored = exploded.withColumn(
        "tscore",
        F.greatest(F.lit(0.0).cast(stype), raw.cast(stype))
        * mmap[F.col("term")])
    agg = scored.groupBy("seg", "docid").agg(F.sum("tscore").alias("score"))
    return _topk(agg.select("seg", "docid", "score"), index, k, precision)


def search_dfr_gl2(index: InvertedIndex, query_text: str, k: int = 10,
                   c: float = 1.0,
                   precision: str = "float32") -> DataFrame:
    """DFR similarity, configuration G-L-H2 (``search/similarities/
    DFRSimilarity.java:108-112`` with ``BasicModelG`` + ``AfterEffectL``
    + ``NormalizationH2``):

      tfn    = freq * log2(1 + c * avgFieldLength / dl)   (H2)
      lambda = (ttf + 1) / (N + ttf + 1)                  (G)
      score_t = (log2(lambda+1) + tfn * log2((1+lambda)/lambda))
                * (1 / (tfn + 1))                         (L)

    dl is the quantized doc length from the norm byte (SimilarityBase
    decode — LQ64); avgFieldLength = sumTotalTermFreq / maxDoc."""
    from .search import LQ64

    stype = "double" if precision == "float64" else "float"
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if not terms:
        return index.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    uniq = sorted(set(terms))
    max_doc, sum_ttf = index.collection_stats()
    tstats = index.term_stats(uniq)
    avg_fl = sum_ttf / max_doc if max_doc else 1.0
    lam = {t: (tstats.get(t, (0, 0))[1] + 1.0)
           / (max_doc + tstats.get(t, (0, 0))[1] + 1.0) for t in uniq}
    mult = {t: terms.count(t) for t in uniq}
    lmap = F.create_map(*[x for t, v in lam.items()
                          for x in (F.lit(t), F.lit(v).cast(stype))])
    mmap = F.create_map(*[x for t, m in mult.items()
                          for x in (F.lit(t), F.lit(float(m)).cast(stype))])
    lq_arr = F.lit(list(LQ64)).cast(f"array<{stype}>")

    exploded = (index.postings.where(F.col("term").isin(uniq))
                .select("seg", "term", F.explode("postings").alias("p"))
                .select("seg", "term",
                        F.col("p.docid").alias("docid"),
                        F.col("p.freq").alias("freq"),
                        F.col("p.norm").alias("norm")))
    dl = F.element_at(lq_arr, F.col("norm") + 1)
    tfn = (F.col("freq").cast(stype)
           * F.log2(F.lit(1.0).cast(stype)
                    + F.lit(c * avg_fl).cast(stype) / dl))
    lamc = lmap[F.col("term")]
    basic = (F.log2(lamc + F.lit(1.0).cast(stype))
             + tfn * F.log2((F.lit(1.0).cast(stype) + lamc) / lamc))
    ae = F.lit(1.0).cast(stype) / (tfn + F.lit(1.0).cast(stype))
    scored = exploded.withColumn(
        "tscore", (basic * ae).cast(stype) * mmap[F.col("term")])
    agg = scored.groupBy("seg", "docid").agg(F.sum("tscore").alias("score"))
    return _topk(agg.select("seg", "docid", "score"), index, k, precision)


def search_ib_spl(index: InvertedIndex, query_text: str, k: int = 10,
                  c: float = 1.0,
                  precision: str = "float32") -> DataFrame:
    """Information-based similarity, configuration SPL-DF-H2
    (``search/similarities/IBSimilarity.java:96-102`` with
    ``DistributionSPL`` + ``LambdaDF`` + ``NormalizationH2``):

      tfn     = freq * log2(1 + c * avgFieldLength / dl)     (H2)
      lambda  = (df + 1) / (N + 1)                           (DF)
      score_t = -ln((lambda^(tfn/(tfn+1)) - lambda) / (1 - lambda))  (SPL)
    """
    from .search import LQ64

    stype = "double" if precision == "float64" else "float"
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if not terms:
        return index.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    uniq = sorted(set(terms))
    max_doc, sum_ttf = index.collection_stats()
    tstats = index.term_stats(uniq)
    avg_fl = sum_ttf / max_doc if max_doc else 1.0
    lam = {}
    for t in uniq:
        v = (tstats.get(t, (0, 0))[0] + 1.0) / (max_doc + 1.0)
        lam[t] = 0.99 if v == 1.0 else v
    mult = {t: terms.count(t) for t in uniq}
    lmap = F.create_map(*[x for t, v in lam.items()
                          for x in (F.lit(t), F.lit(v).cast(stype))])
    mmap = F.create_map(*[x for t, m in mult.items()
                          for x in (F.lit(t), F.lit(float(m)).cast(stype))])
    lq_arr = F.lit(list(LQ64)).cast(f"array<{stype}>")
    exploded = (index.postings.where(F.col("term").isin(uniq))
                .select("seg", "term", F.explode("postings").alias("p"))
                .select("seg", "term",
                        F.col("p.docid").alias("docid"),
                        F.col("p.freq").alias("freq"),
                        F.col("p.norm").alias("norm")))
    dl = F.element_at(lq_arr, F.col("norm") + 1)
    tfn = (F.col("freq").cast(stype)
           * F.log2(F.lit(1.0).cast(stype)
                    + F.lit(c * avg_fl).cast(stype) / dl))
    lamc = lmap[F.col("term")]
    spl = -F.log(
        (F.pow(lamc, tfn / (tfn + F.lit(1.0).cast(stype))) - lamc)
        / (F.lit(1.0).cast(stype) - lamc))
    scored = exploded.withColumn(
        "tscore", spl.cast(stype) * mmap[F.col("term")])
    agg = scored.groupBy("seg", "docid").agg(F.sum("tscore").alias("score"))
    return _topk(agg.select("seg", "docid", "score"), index, k, precision)


def search_sweetspot(index: InvertedIndex, query_text: str, k: int = 10,
                     tf_base: float = 0.0, tf_min: int = 0,
                     ln_min: int = 1, ln_max: int = 1,
                     ln_steep: float = 0.5,
                     tf_mode: str = "baseline",
                     hyper_min: float = 0.0, hyper_max: float = 2.0,
                     hyper_base: float = math.e,
                     hyper_xoffset: float = 10.0,
                     precision: str = "float32") -> DataFrame:
    """SweetSpotSimilarity (``lucene/misc/.../SweetSpotSimilarity.java``):
    ClassicSimilarity with a plateaued length norm and a configurable tf —

      * ``baselineTf`` (:112-120): ``tf_base`` for ``freq <= tf_min``,
        else ``sqrt(freq + tf_base^2 - tf_min)``,
      * ``hyperbolicTf`` (:130-142): tanh-shaped saturation between
        ``hyper_min`` and ``hyper_max`` centered at ``hyper_xoffset``,
      * ``lengthNorm`` (:87-96): ``1/sqrt(steep*(|l-min|+|l-max|-(max-min))
        + 1)`` — exactly 1 on the ``[ln_min, ln_max]`` plateau, so docs in
        the sweet-spot length band take no length penalty.

    Divergence note: the reference bakes lengthNorm into the norm BYTE at
    index time (floatToByte315 lossy); this engine stores the quantized
    doc length (LQ64) and computes lengthNorm at query time from it —
    same quantization point, one fewer lossy encode."""
    from .search import LQ64

    stype = "double" if precision == "float64" else "float"
    terms = [t.term for t in get_analyzer(index.analyzer)(query_text)]
    if not terms:
        return index.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    uniq = sorted(set(terms))
    mult = {t: terms.count(t) for t in uniq}
    max_doc, _ = index.collection_stats()
    tstats = index.term_stats(uniq)
    idf = {t: math.log(max_doc / (tstats.get(t, (0, 0))[0] + 1.0)) + 1.0
           for t in uniq}
    ssw = sum(mult[t] * idf[t] ** 2 for t in uniq)
    query_norm = 1.0 / math.sqrt(ssw) if ssw > 0 else 0.0
    value = {t: idf[t] * idf[t] * query_norm * mult[t] for t in uniq}
    vmap = F.create_map(*[x for t, v in value.items()
                          for x in (F.lit(t), F.lit(v).cast(stype))])
    # lengthNorm over the 64 quantized doc lengths — a tiny lookup array
    lnorm = [1.0 / math.sqrt(
        ln_steep * (abs(dl - ln_min) + abs(dl - ln_max) - (ln_max - ln_min))
        + 1.0) for dl in LQ64]
    lnorm_arr = F.array(*[F.lit(v).cast(stype) for v in lnorm])

    exploded = (index.postings.where(F.col("term").isin(uniq))
                .select("seg", "term", F.explode("postings").alias("p"))
                .select("seg", "term",
                        F.col("p.docid").alias("docid"),
                        F.col("p.freq").alias("freq"),
                        F.col("p.norm").alias("norm")))
    freq = F.col("freq").cast(stype)
    if tf_mode == "baseline":
        tf = F.when(freq <= F.lit(float(tf_min)),
                    F.lit(float(tf_base)).cast(stype)) \
             .otherwise(F.sqrt(freq + F.lit(tf_base * tf_base - tf_min)
                               .cast(stype)))
    elif tf_mode == "hyperbolic":
        x = freq - F.lit(hyper_xoffset).cast(stype)
        bx = F.pow(F.lit(hyper_base).cast(stype), x)
        bnx = F.pow(F.lit(hyper_base).cast(stype), -x)
        tf = (F.lit(hyper_min).cast(stype)
              + F.lit((hyper_max - hyper_min) / 2.0).cast(stype)
              * ((bx - bnx) / (bx + bnx) + F.lit(1.0).cast(stype)))
    else:
        raise ValueError(f"unknown tf_mode {tf_mode!r}")
    tf = F.when(freq == 0, F.lit(0.0).cast(stype)).otherwise(tf)
    decoded = F.element_at(lnorm_arr, F.col("norm") + 1)
    scored = exploded.withColumn("tscore", tf * vmap[F.col("term")] * decoded)
    mmap = F.create_map(*[x for t, m in mult.items()
                          for x in (F.lit(t), F.lit(m))])
    agg = scored.groupBy("seg", "docid").agg(
        F.sum("tscore").alias("_sum"),
        F.sum(mmap[F.col("term")]).alias("nmatched"))
    coord = (F.col("nmatched").cast(stype)
             / F.lit(float(len(terms))).cast(stype))
    return _topk(agg.select(
        "seg", "docid",
        (F.col("_sum") * coord).cast(stype).alias("score")), index, k,
        precision)
