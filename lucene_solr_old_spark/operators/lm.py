"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020 filter web pages by LM perplexity; the
production pipelines behind most published web corpora keep the
lowest-perplexity band).

Spark-first shape, fully relational:

  * :func:`build_lm_table` — ONE pass over the training corpus builds
    the model as two tables: unigram counts and bigram counts (a
    groupBy each, map-side combinable).  The model IS a DataFrame —
    persist or write it like any other table; at 100 TB the LM tables
    shard naturally by their key and the scoring join shuffles on the
    same key.
  * :func:`score_perplexity` — tokens -> (w1, w2) pairs via a window
    lag, LEFT JOIN against the bigram and unigram tables, stupid
    backoff (Brants et al. 2007: P = c(w1 w2)/c(w1) if seen, else
    alpha * c(w2)/N — no discounting, designed exactly for this
    web-scale distributed setting), per-document mean of -ln P, and
    perplexity = exp(mean).  Out-of-vocabulary words get a 1/N floor
    so unseen text scores high but finite.

Everything is Catalyst (window + joins + aggregations): no UDFs, no
collect; the plan survives a 100x scale-up by sharding on the join
keys.  ``ppl_filter`` keeps documents under a perplexity ceiling —
CCNet's "head/middle/tail" banding is two such cuts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["build_lm_table", "score_perplexity", "ppl_filter"]

ALPHA = 0.4  # stupid-backoff weight (Brants et al. 2007)


def _pairs(docs: DataFrame, key_col: str, text_col: str) -> DataFrame:
    toks = docs.select(
        F.col(key_col).alias("key"),
        F.posexplode(F.filter(F.split(F.lower(F.col(text_col)), " "),
                              lambda x: x != F.lit("")))
        .alias("pos", "w"))
    w = Window.partitionBy("key").orderBy("pos")
    return (toks.withColumn("w1", F.lag("w").over(w))
            .where(F.col("w1").isNotNull())
            .select("key", "w1", F.col("w").alias("w2")))


def build_lm_table(train: DataFrame, key_col: str = "doc_id",
                   text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """-> (unigrams(w, c), bigrams(w1, w2, c)) from the training corpus
    (whitespace-lowercase tokens; swap the tokenizer upstream for an
    analyzed variant)."""
    toks = train.select(
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), " "),
                           lambda x: x != F.lit(""))).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    big = (_pairs(train, key_col, text_col)
           .groupBy("w1", "w2").agg(F.count("*").alias("c")))
    return uni, big


def score_perplexity(docs: DataFrame, uni: DataFrame, big: DataFrame,
                     key_col: str = "doc_id", text_col: str = "text",
                     alpha: float = ALPHA) -> DataFrame:
    """(key, n_bigrams, ppl) — stupid-backoff bigram perplexity of each
    document under the (uni, big) model."""
    n_total = uni.agg(F.sum("c")).collect()[0][0] or 1
    pairs = _pairs(docs, key_col, text_col)
    scored = (pairs
              .join(big.withColumnRenamed("c", "c12"), ["w1", "w2"],
                    "left")
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("c").alias("c1")), "w1", "left")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("c").alias("c2")), "w2", "left")
              .withColumn(
                  "p",
                  F.when(F.col("c12").isNotNull() & F.col("c1").isNotNull(),
                         F.col("c12") / F.col("c1"))
                  .otherwise(F.lit(alpha)
                             * F.coalesce(F.col("c2"), F.lit(1.0))
                             / F.lit(float(n_total)))))
    return (scored.groupBy("key")
            .agg(F.count("*").alias("n_bigrams"),
                 F.exp(F.avg(-F.log("p"))).alias("ppl")))


def ppl_filter(docs: DataFrame, uni: DataFrame, big: DataFrame,
               max_ppl: float, key_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Keep documents whose model perplexity is <= max_ppl (the CCNet
    head/middle band cut)."""
    keep = (score_perplexity(docs, uni, big, key_col, text_col)
            .where(F.col("ppl") <= max_ppl)
            .select(F.col("key").alias(key_col)))
    return docs.join(keep, key_col, "left_semi")
