"""Classification over the index — the reference's classification module.

Reference: ``lucene/classification/src/java/org/apache/lucene/classification/``

  * :func:`train_naive_bayes` / :func:`nb_classify` —
    ``SimpleNaiveBayesClassifier.java:59-172``.  Lucene's formulation:
    prior(c) = docFreq(class=c) / docsWithClass; per input token w,
    P(w|c) = (docs(text:w AND class:c) + 1)
             / (avgUniqueTermsPerDoc * docsWithClass(c) + docsWithClass)
    with avgUniqueTermsPerDoc = sumDocFreq(text)/docCount — and the
    token list keeps DUPLICATES (each occurrence multiplies).  The
    reference multiplies raw probabilities (its own TODO notes the
    missing log scale); this engine scores in LOG space — the same
    argmax, no underflow at corpus scale — and returns the log score.
    Ties break exactly like the reference: TermsEnum iterates classes
    in ascending order and only a STRICTLY greater score replaces the
    current winner, i.e. (score desc, class asc).
  * :func:`knn_classify` — ``KNearestNeighborClassifier.java:60-108``:
    MoreLikeThis top-k neighbors, majority class vote, score =
    votes / k.  (The reference's tie-break is HashMap iteration order —
    not deterministic; this engine uses (votes desc, class asc).)

Scale shape: training materializes three small frames (word-class doc
counts, per-class stats, two scalars); classification is a
broadcast-joined aggregation over the input tokens — no per-class
queries, no driver loops (the reference runs one BooleanQuery per
(token, class); the relational form is one join).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["NaiveBayesModel", "train_naive_bayes", "nb_classify",
           "knn_classify"]


def _tokens(docs: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """(key, term) with multiplicity — whitespace+lowercase chain (the
    SQL-parity analyzer; pass pre-tokenized frames for custom chains)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "),
                    lambda x: x != F.lit(""))
    return docs.select(F.col(key_col).alias("key"),
                       F.explode(toks).alias("term"))


@dataclass
class NaiveBayesModel:
    classes: DataFrame      # (cls, docs_with_c, log_prior, log_den)
    word_class: DataFrame   # (term, cls, hits)  doc-level counts
    docs_with_class: int
    avg_unique_terms: float


def train_naive_bayes(docs: DataFrame, class_col: str = "lang",
                      key_col: str = "doc_id",
                      text_col: str = "text") -> NaiveBayesModel:
    """SimpleNaiveBayesClassifier.train: collect the class/word statistics
    once (three aggregations); everything downstream is a join."""
    toks = _tokens(docs, key_col, text_col)
    doc_terms = toks.distinct()                       # (key, term) pairs
    classes_of = docs.select(F.col(key_col).alias("key"),
                             F.col(class_col).alias("cls"))

    sum_doc_freq = doc_terms.count()                  # term/doc pairs
    doc_count = docs.count()
    avg_unique = sum_doc_freq / doc_count
    docs_with_class = docs.where(F.col(class_col).isNotNull()).count()

    word_class = (doc_terms.join(classes_of, "key")
                  .groupBy("term", "cls")
                  .agg(F.countDistinct("key").alias("hits")))
    classes = (classes_of.groupBy("cls")
               .agg(F.countDistinct("key").alias("docs_with_c"))
               .withColumn("log_prior",
                           F.log(F.col("docs_with_c")
                                 / F.lit(docs_with_class)))
               .withColumn("log_den",
                           F.log(F.lit(avg_unique) * F.col("docs_with_c")
                                 + F.lit(docs_with_class))))
    return NaiveBayesModel(classes=classes, word_class=word_class,
                           docs_with_class=docs_with_class,
                           avg_unique_terms=avg_unique)


def nb_classify(model: NaiveBayesModel, docs: DataFrame,
                key_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(key, cls, log_score) — the argmax class per input doc.

    log_score(d, c) = log_prior(c)
                    + sum_w n_w(d) * ln(hits(w,c) + 1)
                    - |d| * log_den(c)
    over ALL tokens of d (unseen words contribute ln(1) = 0 via the
    add-one smoothing, exactly like the reference's hits+1)."""
    toks = (_tokens(docs, key_col, text_col)
            .groupBy("key", "term").agg(F.count("*").alias("n_w")))
    doclen = toks.groupBy("key").agg(F.sum("n_w").alias("n_tokens"))

    classes = F.broadcast(model.classes)
    pairs = toks.crossJoin(classes.select("cls"))
    scored = (pairs.join(model.word_class, ["term", "cls"], "left")
              .withColumn("hits", F.coalesce("hits", F.lit(0)))
              .groupBy("key", "cls")
              .agg(F.sum(F.col("n_w") * F.log(F.col("hits") + F.lit(1.0)))
                   .alias("num")))
    total = (scored
             .join(doclen, "key")
             .join(classes, "cls")
             .select("key", "cls",
                     (F.col("log_prior") + F.col("num")
                      - F.col("n_tokens") * F.col("log_den"))
                     .alias("log_score")))
    # deterministic argmax (ties -> class asc, the TermsEnum order)
    from pyspark.sql import Window
    w = Window.partitionBy("key").orderBy(F.desc("log_score"),
                                          F.asc("cls"))
    return (total.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(F.col("key").alias(key_col), "cls",
                    F.round("log_score", 6).alias("log_score")))


def knn_classify(index, train_classes: DataFrame, docs: DataFrame,
                 k: int = 10, key_col: str = "doc_id",
                 text_col: str = "text",
                 max_query_terms: int = 25) -> DataFrame:
    """(key, cls, score) — KNearestNeighborClassifier: BM25 top-k
    neighbors of each input doc (MoreLikeThis: the doc's terms as a
    disjunction, capped at ``max_query_terms`` by tf), majority vote,
    score = votes/k; ties (votes desc, class asc).

    ``train_classes`` must carry (key, cls) in the INDEX's key space."""
    from .batch import batch_search

    toks = (_tokens(docs, key_col, text_col)
            .groupBy("key", "term").agg(F.count("*").alias("tf")))
    from pyspark.sql import Window
    w = Window.partitionBy("key").orderBy(F.desc("tf"), F.asc("term"))
    top_terms = (toks.withColumn("_r", F.row_number().over(w))
                 .where(F.col("_r") <= max_query_terms))
    queries = (top_terms.groupBy("key")
               .agg(F.concat_ws(" ", F.collect_list("term")).alias("q"))
               .collect())
    batch = [(r["key"], r["q"], "OR") for r in queries]
    hits = batch_search(index, batch, k=k)       # (qid, rank, key, score)
    votes = (hits
             .join(train_classes
                   .select(F.col("key").alias("nkey"), F.col("cls")),
                   hits["key"] == F.col("nkey"))
             .groupBy("qid", "cls").agg(F.count("*").alias("votes")))
    w2 = Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("cls"))
    return (votes.withColumn("_rk", F.row_number().over(w2))
            .where(F.col("_rk") == 1)
            .select(F.col("qid").alias(key_col), "cls",
                    F.round(F.col("votes") / F.lit(float(k)), 6)
                    .alias("score")))
