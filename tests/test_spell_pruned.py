"""The r6 pruned fuzzy/spell expansion (length-band + pigeonhole substring
anchors + thresholded levenshtein) must be a pure speedup: candidate SETS
identical to the unpruned full-dictionary scan, with the prefilter passing
only a small fraction of the dictionary.

Reference for the pruning idea: ``search/FuzzyTermsEnum.java`` /
``util/automaton/LevenshteinAutomata.java`` visit only automaton-viable
terms; the pigeonhole chunk filter is the automaton-free equivalent bound.
"""

import random

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.spell import edit_candidate_pred


def _vocab(n=20000, seed=17):
    rng = random.Random(seed)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = set()
    while len(words) < n:
        ln = rng.randint(2, 14)
        words.add("".join(rng.choice(alphabet) for _ in range(ln)))
    return sorted(words)


@pytest.fixture(scope="module")
def vocab_df(spark):
    return spark.createDataFrame(
        [(w,) for w in _vocab()], "term STRING").persist()


@pytest.mark.parametrize("word,max_edits", [
    ("spark", 1), ("spark", 2), ("relational", 2), ("me", 1), ("a", 2),
    ("qqqqqqqq", 2), ("meeting", 1),
])
def test_pruned_candidates_identical(vocab_df, word, max_edits):
    unpruned = {
        (r["term"], r["dist"]) for r in vocab_df
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(word)))
        .where(F.col("dist") <= max_edits).collect()}
    pruned = {
        (r["term"], r["dist"]) for r in vocab_df
        .where(edit_candidate_pred(word, max_edits))
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(word),
                                          max_edits))
        .where(F.col("dist") >= 0).collect()}
    assert pruned == unpruned


def test_prefilter_is_bounded(vocab_df):
    """The point of the prune: the exact-distance computation runs on a
    small fraction of the dictionary, not all of it."""
    total = vocab_df.count()
    for word, k in [("spark", 1), ("relational", 2), ("meeting", 1)]:
        cand = vocab_df.where(edit_candidate_pred(word, k)).count()
        assert cand < total * 0.2, (word, k, cand, total)


def test_fuzzy_query_and_spellcheck_unchanged(spark):
    """End-to-end: _fuzzy_terms and spellcheck over a real index return the
    same rows as the pre-prune full-scan formulation."""
    from lucene_solr_old_spark.operators.indexer import build_index
    from lucene_solr_old_spark.operators.spell import spellcheck
    from lucene_solr_old_spark.plans.query import FuzzyClause, _fuzzy_terms

    docs = spark.createDataFrame(
        [(f"d{i:03d}", " ".join(w)) for i, w in enumerate(
            [("spark", "sprk", "spork"), ("stark", "shark", "spar"),
             ("sparks", "park", "lark"), ("spade", "space", "spare")])],
        "k STRING, t STRING")
    idx = build_index(docs, key_col="k", text_col="t", num_segments=2,
                      analyzer="ws_lower").persist()
    idx.postings.count()

    got = _fuzzy_terms(idx, FuzzyClause("spark", max_edits=1))
    # unpruned reference, computed inline
    ref = sorted(r["term"] for r in idx.terms_dict()
                 .withColumn("d", F.levenshtein("term", F.lit("spark")))
                 .where(F.col("d") <= 1).orderBy(F.asc("d"), F.asc("term"))
                 .limit(50).collect())
    assert got == ref

    sc_rows = [tuple(r) for r in spellcheck(idx, "spark", max_edits=2,
                                            k=5).collect()]
    ref_rows = [tuple(r) for r in idx.terms_dict()
                .withColumn("dist", F.levenshtein("term", F.lit("spark")))
                .where((F.col("dist") <= 2) & (F.col("dist") > 0))
                .select("term", "dist", "df")
                .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
                .limit(5).collect()]
    assert sc_rows == ref_rows
