"""Stupid-backoff bigram LM perplexity (operators/lm.py)."""

import math

from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.lm import (build_lm_table,
                                                ppl_filter,
                                                score_perplexity)


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def test_seen_bigrams_score_low(spark):
    train = _docs(spark, ["the cat sat on the mat"] * 3)
    uni, big = build_lm_table(train)
    rows = {r["key"]: r for r in
            score_perplexity(_docs(spark, ["the cat sat"]),
                             uni, big).collect()}
    # (the,cat) p=0.5 (the also precedes mat), (cat,sat) p=1
    assert rows[0]["n_bigrams"] == 2
    assert abs(rows[0]["ppl"] - 2 ** 0.5) < 1e-9  # p = [0.5, 1.0]


def test_unseen_text_scores_high(spark):
    train = _docs(spark, ["the cat sat on the mat"] * 3)
    uni, big = build_lm_table(train)
    got = {r["key"]: r["ppl"] for r in score_perplexity(
        _docs(spark, ["the cat sat", "zebra quark flux"]),
        uni, big).collect()}
    assert got[1] > 10 * got[0]


def test_backoff_matches_formula(spark):
    train = _docs(spark, ["a b", "a c"])
    uni, big = build_lm_table(train)
    # score "b c": bigram (b,c) unseen -> 0.4 * c(c)/N = 0.4 * 1/4
    got = score_perplexity(_docs(spark, ["b c"]), uni, big).collect()[0]
    assert abs(got["ppl"] - 1.0 / (0.4 * 0.25)) < 1e-9


def test_ppl_filter_keeps_fluent_docs(spark):
    train = _docs(spark, ["the cat sat on the mat"] * 3)
    uni, big = build_lm_table(train)
    docs = _docs(spark, ["the cat sat on the mat", "qq zz xx yy ww vv"])
    kept = ppl_filter(docs, uni, big, max_ppl=10.0).collect()
    assert [r["doc_id"] for r in kept] == [0]


def test_plan_is_relational_no_python(spark):
    train = _docs(spark, ["a b c a b"])
    uni, big = build_lm_table(train)
    plan = score_perplexity(_docs(spark, ["a b"]), uni, big)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- exact substring duplication spans (operators/dedup.py) ----------------

def test_duplicate_ngram_spans_semantics(spark):
    from lucene_solr_old_spark.operators.dedup import duplicate_ngram_spans

    docs = _docs(spark, ["a b c d e", "x y a b c", "p q r s t"])
    got = sorted((r["key"], r["start"], r["n_occurrences"])
                 for r in duplicate_ngram_spans(docs, n=3).collect())
    # only "a b c" recurs (doc0 @0, doc1 @2)
    assert got == [(0, 0, 2), (1, 2, 2)]


def test_duplicate_ngram_spans_within_doc(spark):
    from lucene_solr_old_spark.operators.dedup import duplicate_ngram_spans

    docs = _docs(spark, ["a b a b a b"])
    got = duplicate_ngram_spans(docs, n=4).collect()
    # "a b a b" at 0 and 2 (same doc) -> both flagged
    assert sorted(r["start"] for r in got) == [0, 2]


def test_duplicate_ngram_spans_plan(spark):
    from lucene_solr_old_spark.operators.dedup import duplicate_ngram_spans

    docs = _docs(spark, ["a b c d e"])
    plan = duplicate_ngram_spans(docs, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # r5: row-local window assembly — no Window operator (and hence no
    # partitionBy(key) shuffle); the only hash exchange is the global
    # gram_hash count
    assert "Window" not in plan
    # every exchange shuffles on gram_hash (count agg + join-back, which
    # AQE demotes to broadcast at runtime); none re-partitions by key
    import re
    for m in re.findall(r"Exchange hashpartitioning\((\w+)", plan):
        assert m.startswith("gram_hash")


def test_duplicate_ngram_spans_short_docs_excluded(spark):
    from lucene_solr_old_spark.operators.dedup import duplicate_ngram_spans

    # sequence(0, negative) would DESCEND; docs shorter than n must
    # contribute no windows rather than phantom negative starts
    docs = _docs(spark, ["a b", "a b", "a b c d"])
    assert duplicate_ngram_spans(docs, n=3).count() == 0
