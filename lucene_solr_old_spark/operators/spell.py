"""Spellcheck + suggest over the term dictionary.

  * spellcheck — ``DirectSpellChecker`` semantics (``lucene/suggest/.../
    spell/DirectSpellChecker.java``): candidate terms within max_edits
    Levenshtein distance of the input, ranked by (distance asc, docFreq
    desc, term asc); the FuzzyQuery machinery reused as a suggester.
  * suggest_prefix — ``AnalyzingSuggester``-lite (``suggest/analyzing/
    AnalyzingSuggester.java``): top-k dictionary terms by weight (ttf)
    under a prefix.
  * term_range — ``TermRangeQuery`` (``search/TermRangeQuery.java``):
    lexicographic term-dictionary slice.

All are small scans of the term dictionary (a DataFrame); on a cluster the
dictionary scan is parquet-pruned by the term column's min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .indexer import InvertedIndex

__all__ = ["spellcheck", "suggest_prefix", "term_range"]


def _global_terms(index: InvertedIndex) -> DataFrame:
    return (index.postings.groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"),
                 F.sum("ttf").cast("long").alias("ttf")))


def spellcheck(index: InvertedIndex, word: str, max_edits: int = 2,
               k: int = 5, min_df: int = 1) -> DataFrame:
    """(term, dist, df) — correction candidates for ``word``."""
    terms = _global_terms(index)
    cand = (terms
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(word)))
            .where((F.col("dist") <= max_edits) & (F.col("dist") > 0)
                   & (F.col("df") >= min_df)))
    return (cand.select("term", "dist", "df")
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(k))


def suggest_prefix(index: InvertedIndex, prefix: str, k: int = 10) -> DataFrame:
    """(term, weight) — completion suggestions, weight = total term freq."""
    terms = _global_terms(index)
    return (terms.where(F.col("term").startswith(prefix))
            .select("term", F.col("ttf").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term"))
            .limit(k))


def term_range(index: InvertedIndex, lower: str | None, upper: str | None,
               include_lower: bool = True, include_upper: bool = False,
               limit: int = 1000) -> DataFrame:
    """(term, df, ttf) in lexicographic [lower, upper) — TermRangeQuery's
    dictionary slice (constant-score doc sets come from joining postings)."""
    terms = _global_terms(index)
    if lower is not None:
        terms = terms.where(F.col("term") >= lower if include_lower
                            else F.col("term") > lower)
    if upper is not None:
        terms = terms.where(F.col("term") <= upper if include_upper
                            else F.col("term") < upper)
    return terms.orderBy("term").limit(limit)
