"""Classification module (operators/classify.py) — SimpleNaiveBayes and
KNearestNeighbor classifiers; nb_classify is also driver-certified by its
gate against a full DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.classify import (
    knn_classify, nb_classify, train_naive_bayes)
from lucene_solr_old_spark.operators.indexer import build_index

DOCS = [
    # two separable topics
    (1, "spark shuffle executor partition spark", "eng"),
    (2, "executor shuffle stage spark partition", "eng"),
    (3, "spark partition codegen executor", "eng"),
    (4, "recipe butter sugar flour oven", "cook"),
    (5, "oven sugar dough butter recipe", "cook"),
    (6, "flour dough butter oven recipe", "cook"),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING, cls STRING")


def test_nb_classifies_held_out(spark, frame):
    model = train_naive_bayes(frame, class_col="cls")
    probe = spark.createDataFrame(
        [(100, "spark executor shuffle"), (101, "butter oven dough")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: r.cls for r in nb_classify(model, probe).collect()}
    assert got == {100: "eng", 101: "cook"}


def test_nb_matches_hand_computation(spark, frame):
    # hand-compute the reference formula for doc 100 = "spark"
    model = train_naive_bayes(frame, class_col="cls")
    probe = spark.createDataFrame([(100, "spark")], "doc_id LONG, text STRING")
    row = nb_classify(model, probe).collect()[0]
    # stats: 6 docs, doc_terms pairs = 4+5+4+5+5+5 = 28 -> avg_unique=28/6
    # eng: docs_with_c=3, hits(spark,eng)=3; prior=3/6
    # den = 28/6*3 + 6 = 20 ; score = ln(0.5) + ln(4) - ln(20)
    want = math.log(0.5) + math.log(4.0) - math.log(28 / 6 * 3 + 6)
    assert row.cls == "eng"
    assert abs(row.log_score - round(want, 6)) < 1e-6


def test_nb_tie_breaks_ascending_class(spark):
    # identical corpora per class -> identical scores; "a" must win
    df = spark.createDataFrame(
        [(1, "x y", "b"), (2, "x y", "a")], "doc_id LONG, text STRING, cls STRING")
    model = train_naive_bayes(df, class_col="cls")
    probe = spark.createDataFrame([(9, "x")], "doc_id LONG, text STRING")
    assert nb_classify(model, probe).collect()[0].cls == "a"


def test_knn_majority_vote(spark, frame):
    idx = build_index(
        frame.select(F.col("doc_id").cast("string").alias("key"), "text"),
        key_col="key", text_col="text", num_segments=2,
        analyzer="ws_stop").persist()
    train_classes = frame.select(
        F.col("doc_id").cast("string").alias("key"), "cls")
    probe = spark.createDataFrame(
        [(200, "spark shuffle partition"), (201, "sugar flour oven")],
        "doc_id LONG, text STRING")
    out = {r.doc_id: (r.cls, r.score)
           for r in knn_classify(idx, train_classes, probe, k=3).collect()}
    assert out[200][0] == "eng" and out[201][0] == "cook"
    assert out[200][1] == 1.0          # all 3 neighbors agree


def test_spellcheck_collate(spark):
    from lucene_solr_old_spark.operators.spell import spellcheck_collate

    df = spark.createDataFrame(
        [("d1", "alpha beta gamma"), ("d2", "alpha beta delta"),
         ("d3", "alpha gamma delta")],
        "key STRING, text STRING")
    idx = build_index(df, key_col="key", text_col="text",
                      num_segments=2, analyzer="ws_stop").persist()
    # "alpha betaa" -> collation "alpha beta", hits = docs with both
    out = spellcheck_collate(idx, "alpha betaa", max_edits=2).collect()
    assert out, "expected at least one collation"
    top = out[0]
    assert top.collation == "alpha beta"
    assert top.hits == 2                      # d1 and d2
    assert top.total_dist == 1

    # an unknown term with no candidate in range -> empty result
    none = spellcheck_collate(idx, "zzzzzzzzzq", max_edits=1).collect()
    assert none == []


def test_mlt_knobs(spark):
    from lucene_solr_old_spark.operators.mlt import (interesting_terms,
                                                     more_like_this)

    rows = [("s", "common common common rare midf midf")]
    rows += [(f"d{i}", "common filler" + str(i)) for i in range(6)]
    rows += [(f"m{i}", "midf x" + str(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "key STRING, text STRING")
    idx = build_index(df, key_col="key", text_col="text",
                      num_segments=2, analyzer="ws_stop").persist()

    # min_term_freq prunes tf<2 ("rare" tf=1); min_doc_freq prunes df<4
    # ("midf" df=4 passes, "rare" df=1 would anyway fail tf)
    terms = {r.term for r in interesting_terms(
        idx, "s", min_term_freq=2, min_doc_freq=4,
        max_query_terms=25).collect()}
    assert terms == {"common", "midf"}
    # max_doc_freq prunes the stop-wordy "common" (df=7)
    terms2 = {r.term for r in interesting_terms(
        idx, "s", min_term_freq=2, min_doc_freq=1, max_doc_freq=5,
        max_query_terms=25).collect()}
    assert "common" not in terms2 and "midf" in terms2
    # max_query_terms caps the queue
    one = interesting_terms(idx, "s", min_term_freq=1, min_doc_freq=1,
                            max_query_terms=1).collect()
    assert len(one) == 1

    # the query excludes the source doc
    out = more_like_this(idx, "s", k=5, min_term_freq=1, min_doc_freq=1)
    assert "s" not in {r.key for r in out.collect()}


def test_nb_classify_broadcasts_classes(spark, frame):
    # the per-class constants table must be broadcast (tiny dim), not
    # shuffled against the token frame
    model = train_naive_bayes(frame, class_col="cls")
    probe = spark.createDataFrame([(1, "spark oven")],
                                  "doc_id LONG, text STRING")
    plan = (nb_classify(model, probe)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
