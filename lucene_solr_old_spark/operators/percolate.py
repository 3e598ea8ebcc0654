"""Percolation — MemoryIndex's production use-case, Spark-first.

The reference's ``lucene/memory/.../MemoryIndex.java`` builds a throwaway
single-document index so STORED QUERIES can be run against one incoming
doc (alerting / reverse search).  One doc per index is exactly the wrong
shape for Spark; the equivalent semantics distribute as queries-as-data:

  * stored queries -> broadcast (qid, term, required) table;
  * incoming docs  -> one Arrow analysis pass -> (key, term) rows;
  * a single broadcast join + groupBy(key, qid) decides every
    (doc, query) match in one job — millions of docs x thousands of
    queries with no per-doc index build at all.

Matching semantics per query: OR = any term present; AND = every distinct
term present (BooleanQuery over the single doc, scores irrelevant — the
percolator wants the MATCH SET).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import get_analyzer

__all__ = ["percolate"]


def percolate(docs: DataFrame, queries: list[tuple],
              analyzer: str = "english", key_col: str = "url",
              text_col: str = "text") -> DataFrame:
    """queries: [(qid, query_text, mode)] with mode in {"OR", "AND"}.
    Returns (key, qid) — which stored queries match which docs."""
    analyze_fn = get_analyzer(analyzer)
    spark = docs.sparkSession
    qrows = []
    nterms: dict[int, int] = {}
    for qid, text, mode in queries:
        terms = sorted({t.term for t in analyze_fn(text)})
        nterms[qid] = len(terms)
        for t in terms:
            qrows.append((qid, t, mode.upper() == "AND"))
    if not qrows:
        return spark.createDataFrame([], "key STRING, qid INT")
    qdf = spark.createDataFrame(qrows, "qid INT, term STRING, is_and BOOLEAN")
    need = F.create_map(*[x for qid, n in nterms.items()
                          for x in (F.lit(qid), F.lit(n))])

    def tokenize(batches):
        import pandas as pd
        for pdf in batches:
            keys, terms = [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                for t in {tok.term for tok in analyze_fn(text or "")}:
                    keys.append(key)
                    terms.append(t)
            yield pd.DataFrame({"key": keys, "term": terms})

    doc_terms = docs.select(F.col(key_col), F.col(text_col)).mapInPandas(
        tokenize, schema="key STRING, term STRING")
    joined = doc_terms.join(F.broadcast(qdf), "term")
    agg = joined.groupBy("key", "qid").agg(
        F.count("*").alias("nmatched"),
        F.first("is_and").alias("is_and"))
    return (agg.where(~F.col("is_and")
                      | (F.col("nmatched") == need[F.col("qid")]))
            .select("key", "qid"))
