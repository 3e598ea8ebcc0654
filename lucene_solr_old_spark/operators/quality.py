"""Retrieval-quality evaluation — the ``lucene/benchmark/src/java/org/
apache/lucene/benchmark/quality`` package (QualityBenchmark +
QualityStats: precision@k, recall, average precision, MRR; submission
reports) restated as one relational pass.

Input frames:
  * results: (qid, doc_id, rank) — rank 1-based in score order, one
    ranking per query,
  * qrels:   (qid, doc_id, rel) — graded relevance judgments (rel > 0 is
    relevant; TREC qrels style, unjudged docs simply absent).

Everything is joins + one cumulative window per query + groupBys: at any
scale this is a couple of shuffles on qid, no collects, no per-query
loops (the reference iterates queries one at a time —
``QualityBenchmark.execute``; here all queries evaluate in one plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["eval_ranking"]


def eval_ranking(results: DataFrame, qrels: DataFrame,
                 k: int = 10) -> DataFrame:
    """Per-query metrics (qid, n_rel, p_at_k, recall_at_k, ap, rr,
    ndcg_at_k), each rounded to 6:

      * ``p_at_k`` / ``recall_at_k`` — QualityStats precision/recall at
        the cutoff,
      * ``ap`` — average precision at k over the query's relevant count
        (the MAP component; QualityStats.getAvp),
      * ``rr`` — reciprocal rank of the first relevant hit (MRR
        component; 0 when none ranked),
      * ``ndcg_at_k`` — burst-gain DCG ``(2^rel - 1)/log2(rank+1)``
        against the ideal ordering of that query's judgments.

    Queries with no judged-relevant docs score 0 across the board (the
    reference skips them in the MAP mean; filter ``n_rel > 0`` before
    averaging to reproduce that)."""
    rel = F.coalesce(F.col("rel"), F.lit(0))
    j = (results.join(qrels, ["qid", "doc_id"], "left")
         .select("qid", "doc_id", "rank", rel.alias("rel"))
         .where(F.col("rank") <= k))
    w = Window.partitionBy("qid").orderBy("rank")
    cum = j.withColumn(
        "n_rel_at", F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).over(w))
    gain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0) \
        / F.log2(F.col("rank").cast("double") + 1.0)
    per_q = cum.groupBy("qid").agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("hits"),
        F.sum(F.when(F.col("rel") > 0,
                     F.col("n_rel_at").cast("double") / F.col("rank"))
              .otherwise(0.0)).alias("ap_num"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(gain).alias("dcg"))
    # per-query totals + the ideal DCG from the judgments themselves
    wi = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (qrels.where(F.col("rel") > 0)
             .withColumn("irank", F.row_number().over(wi))
             .groupBy("qid").agg(
                 F.count("*").alias("n_rel"),
                 F.sum(F.when(
                     F.col("irank") <= k,
                     (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0)
                     / F.log2(F.col("irank").cast("double") + 1.0))
                     .otherwise(0.0)).alias("idcg")))
    out = (per_q.join(ideal, "qid", "full")
           .select(
               "qid",
               F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
               F.round(F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                       / k, 6).alias("p_at_k"),
               F.round(F.when(
                   F.coalesce("n_rel", F.lit(0)) > 0,
                   F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                   / F.col("n_rel")).otherwise(0.0), 6)
               .alias("recall_at_k"),
               F.round(F.when(
                   F.coalesce("n_rel", F.lit(0)) > 0,
                   F.coalesce("ap_num", F.lit(0.0)) / F.col("n_rel"))
                   .otherwise(0.0), 6).alias("ap"),
               F.round(F.when(F.col("first_rel").isNotNull(),
                              F.lit(1.0) / F.col("first_rel"))
                       .otherwise(0.0), 6).alias("rr"),
               F.round(F.when((F.coalesce("idcg", F.lit(0.0)) > 0),
                              F.coalesce("dcg", F.lit(0.0))
                              / F.col("idcg")).otherwise(0.0), 6)
               .alias("ndcg_at_k")))
    return out
