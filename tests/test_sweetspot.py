"""SweetSpotSimilarity (operators/tfidf.search_sweetspot)."""

from __future__ import annotations

import math

import pytest

from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.operators.tfidf import (
    search_sweetspot, search_tfidf)


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [("d1", "cat dog"),                       # len 2: inside [1,4]
         ("d2", "cat " + "pad " * 30 + "end"),    # len 32: far outside
         ("d3", "cat one two")],                  # len 3: inside
        "key string, text string")
    return build_index(docs, key_col="key", text_col="text",
                       num_segments=1, analyzer="ws_stop").persist()


def test_plateau_means_no_length_penalty(spark, idx):
    # ln_min..ln_max covers d1 and d3's lengths: equal tf/idf -> equal score
    out = {r["key"]: r["score"]
           for r in search_sweetspot(idx, "cat", k=10, ln_min=1, ln_max=4,
                                     precision="float64").collect()}
    assert out["d1"] == pytest.approx(out["d3"], rel=1e-12)
    # the long doc is outside the plateau and pays the steep penalty
    assert out["d2"] < out["d1"]


def test_plateau_norm_formula(spark, idx):
    # reference lengthNorm: 1/sqrt(steep*(|l-min|+|l-max|-(max-min)) + 1)
    # over the engine's LQ64-QUANTIZED doc length (the norm-byte decode)
    from lucene_solr_old_spark.functions.smallfloat import doclen_to_norm
    from lucene_solr_old_spark.operators.search import LQ64

    out = {r["key"]: r["score"]
           for r in search_sweetspot(idx, "cat", k=10, ln_min=1, ln_max=1,
                                     ln_steep=0.5,
                                     precision="float64").collect()}
    lq2, lq3 = LQ64[doclen_to_norm(2)], LQ64[doclen_to_norm(3)]
    # min=max=1, steep=.5: norm(l) = 1/sqrt(0.5*2*|lq-1| + 1) = 1/sqrt(lq)
    ratio = out["d1"] / out["d3"]
    assert ratio == pytest.approx(math.sqrt(lq3 / lq2), rel=1e-9)


def test_baseline_tf_min_floor(spark, idx):
    # tf_min=1, tf_base=0: a freq-1 term tf==0 -> zero score everywhere
    out = search_sweetspot(idx, "dog", k=10, tf_min=1, tf_base=0.0,
                           precision="float64").collect()
    assert all(r["score"] == 0.0 for r in out)


def test_hyperbolic_tf_saturates(spark):
    docs = [("mid", "term " * 12), ("hi", "term " * 40)]
    spark_df = spark.createDataFrame(docs, "key string, text string")
    idx2 = build_index(spark_df, key_col="key", text_col="text",
                       num_segments=1, analyzer="ws_stop")
    # ln plateau [1,64] covers both lengths -> norm 1; tanh saturation:
    # past the xoffset both tf values sit at ~hyper_max, so freq 40 beats
    # freq 12 by under 2%, not 3.3x
    out = {r["key"]: r["score"]
           for r in search_sweetspot(idx2, "term", k=10,
                                     tf_mode="hyperbolic",
                                     ln_min=1, ln_max=64,
                                     precision="float64").collect()}
    assert out["mid"] < out["hi"] < out["mid"] * 1.02


def test_defaults_match_classic_ordering(spark, idx):
    # with the default baseline tf (sqrt(freq)) the ranking agrees with
    # ClassicSimilarity on this corpus (norms differ only monotonically)
    ss = [r["key"] for r in search_sweetspot(idx, "cat", k=10,
                                             ln_min=1, ln_max=1).collect()]
    cl = [r["key"] for r in search_tfidf(idx, "cat", k=10).collect()]
    assert ss == cl
