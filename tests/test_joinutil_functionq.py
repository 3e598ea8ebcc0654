"""JoinUtil score modes, Solr scale()/recip()/linear() function queries,
and the suggester ContextQuery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.blockjoin import join_util_search
from lucene_solr_old_spark.operators.functionq import (
    linear, recip, scale_column)
from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.operators.spell import (
    build_suggest_table, context_suggest)


@pytest.fixture(scope="module")
def join_fixture(spark):
    docs = spark.createDataFrame(
        [("d1", "hit hit hit", "red"),     # strong from-doc, key red
         ("d2", "hit miss xx", "red"),     # weak from-doc, key red
         ("d3", "hit yy zz", "blue"),      # key blue
         ("d4", "nothing here", "green")],
        "key string, text string, color string")
    idx = build_index(docs.select("key", "text"), key_col="key",
                      text_col="text", num_segments=1,
                      analyzer="ws_stop").persist()
    from_dims = docs.select("key", "color")
    to_docs = spark.createDataFrame(
        [("p1", "red"), ("p2", "blue"), ("p3", "green"), ("p4", "black")],
        "to_id string, color string")
    return idx, from_dims, to_docs


def _scores(df):
    return {r["to_key"]: r["score"] for r in df.collect()}


def test_join_util_modes(spark, join_fixture):
    idx, from_dims, to_docs = join_fixture
    args = dict(from_query="hit", from_dims=from_dims, from_field="color",
                to_docs=to_docs, to_field="color", key_col="to_id",
                precision="float64")
    total = _scores(join_util_search(idx, mode="total", **args))
    avg = _scores(join_util_search(idx, mode="avg", **args))
    mx = _scores(join_util_search(idx, mode="max", **args))
    none = _scores(join_util_search(idx, mode="none", **args))
    # green's from-doc doesn't match 'hit'; black has no from-doc at all
    for got in (total, avg, mx, none):
        assert set(got) == {"p1", "p2"}
    assert none == {"p1": 1.0, "p2": 1.0}
    # red aggregates TWO from-docs: total = d1+d2, avg strictly between
    assert total["p1"] > mx["p1"] > avg["p1"]
    # blue has exactly one from-doc: all three scoring modes agree
    assert total["p2"] == avg["p2"] == mx["p2"]


def test_join_util_plan_broadcasts_aggregate(spark, join_fixture):
    idx, from_dims, to_docs = join_fixture
    df = join_util_search(idx, "hit", from_dims, "color", to_docs,
                          "color", mode="avg", key_col="to_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scale_column(spark):
    docs = spark.createDataFrame([(0, 10), (1, 20), (2, 30)],
                                 "doc_id long, x long")
    out = {r["doc_id"]: r["x_scaled"]
           for r in scale_column(docs, "x", 0.0, 10.0).collect()}
    assert out == {0: 0.0, 1: 5.0, 2: 10.0}


def test_scale_column_constant_guard(spark):
    docs = spark.createDataFrame([(0, 7), (1, 7)], "doc_id long, x long")
    out = scale_column(docs, "x", 2.0, 5.0).collect()
    assert all(r["x_scaled"] == 2.0 for r in out)


def test_recip_and_linear(spark):
    docs = spark.createDataFrame([(0, 4)], "doc_id long, x long")
    row = docs.select(
        recip(F.col("x"), 1.0, 10.0, 1.0).alias("r"),
        linear(F.col("x"), 3.0, 1.0).alias("l")).collect()[0]
    assert row["r"] == 2.0 and row["l"] == 13.0


def test_context_suggest_filter_and_boost(spark):
    surfaces = spark.createDataFrame(
        [("apple pie", 10, ["food"]),
         ("apple watch", 10, ["tech"]),
         ("apple tree", 10, ["nature"]),
         ("banana", 99, ["food"])],
        "surface string, weight long, ctx array<string>")
    table = build_suggest_table(surfaces, analyzer="english",
                                contexts_col="ctx")
    out = context_suggest(table, "apple", {"food": 1.0, "tech": 3.0}, k=10)
    rows = [(r["surface"], r["score"]) for r in out.collect()]
    # nature filtered out; tech boosted over food; banana fails the prefix
    assert rows == [("apple watch", 30.0), ("apple pie", 10.0)]


def test_context_suggest_multi_context_takes_max_boost(spark):
    surfaces = spark.createDataFrame(
        [("apple dual", 10, ["food", "tech"])],
        "surface string, weight long, ctx array<string>")
    table = build_suggest_table(surfaces, analyzer="english",
                                contexts_col="ctx")
    out = context_suggest(table, "apple", {"food": 1.0, "tech": 3.0}, k=10)
    assert out.collect()[0]["score"] == 30.0


def test_rescore_moves_second_query_match_up(spark):
    from lucene_solr_old_spark.operators.search import rescore, search_terms

    docs = spark.createDataFrame(
        [("d1", "alpha alpha alpha common"),
         ("d2", "alpha beta common pad"),
         ("d3", "beta beta pad pad")],
        "key string, text string")
    idx = build_index(docs, key_col="key", text_col="text",
                      num_segments=1, analyzer="ws_stop")
    first = [r["key"] for r in
             search_terms(idx, "alpha", k=3, precision="float64").collect()]
    assert first[0] == "d1"
    # heavy weight on 'beta' lifts d2 over d1 in the rescored order
    res = [r["key"] for r in
           rescore(idx, "alpha", "beta", n=10, k=3, weight=50.0,
                   precision="float64").collect()]
    assert res[0] == "d2"
    # docs outside the first-pass top-n never enter (d3 matches only beta)
    assert "d3" not in res


def test_rescore_weight_zero_preserves_first_pass(spark):
    from lucene_solr_old_spark.operators.search import rescore, search_terms

    docs = spark.createDataFrame(
        [("a", "one two"), ("b", "one one"), ("c", "two two")],
        "key string, text string")
    idx = build_index(docs, key_col="key", text_col="text",
                      num_segments=1, analyzer="ws_stop")
    base = [(r["key"], r["score"]) for r in
            search_terms(idx, "one", k=5, precision="float64").collect()]
    re0 = [(r["key"], r["score"]) for r in
           rescore(idx, "one", "two", n=5, k=5, weight=0.0,
                   precision="float64").collect()]
    assert base == re0
