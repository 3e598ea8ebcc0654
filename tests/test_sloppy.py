"""Sloppy phrase (slop > 0) semantics on a hand-built mini corpus."""

import numpy as np
import pytest

from lucene_solr_old_spark.functions.bm25 import Bm25Stats
from lucene_solr_old_spark.functions.smallfloat import doclen_to_norm
from lucene_solr_old_spark.operators import search as S
from lucene_solr_old_spark.operators.indexer import build_index

DOCS = [
    ("d1", "alpha beta gamma"),          # "alpha beta" exact
    ("d2", "alpha gamma beta"),          # one gap: dist 1
    ("d3", "alpha gamma gamma beta"),    # dist 2
    ("d4", "beta alpha"),                # reversed: dist 2 (|0-(1+1)|)
    ("d5", "alpha gamma gamma gamma beta"),  # dist 3 (> slop 2)
    ("d6", "nothing here"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, "url STRING, text STRING")
    return build_index(df, num_segments=2, analyzer="ws_stop").persist()


def rows(df):
    return {r["key"]: float(r["score"]) for r in df.collect()}


def expected_score(pfreq: float, doc_len: int, idx) -> float:
    max_doc, sum_ttf = idx.collection_stats()
    stats = Bm25Stats(max_doc, sum_ttf)
    # summed idf over both phrase terms (df(alpha)=5, df(beta)=5)
    w = (stats.idf(5) + stats.idf(5)) * (stats.k1 + np.float32(1.0))
    cache = stats.cache[int(doclen_to_norm(doc_len))]
    pf = np.float32(pfreq)
    return float((np.float32(w) * pf) / (pf + cache))


def test_slop0_is_exact(idx):
    got = rows(S.search_phrase(idx, "alpha beta", k=10, slop=0))
    assert set(got) == {"d1"}


def test_slop1_includes_one_gap(idx):
    got = rows(S.search_phrase(idx, "alpha beta", k=10, slop=1))
    assert set(got) == {"d1", "d2"}
    # d2: one match at dist 1 -> pfreq = 1/2
    assert got["d2"] == pytest.approx(expected_score(0.5, 3, idx), rel=1e-6)
    # d1: exact -> pfreq 1
    assert got["d1"] == pytest.approx(expected_score(1.0, 3, idx), rel=1e-6)


def test_slop2_includes_reversal_and_dist2(idx):
    got = rows(S.search_phrase(idx, "alpha beta", k=10, slop=2))
    assert set(got) == {"d1", "d2", "d3", "d4"}
    assert got["d3"] == pytest.approx(expected_score(1 / 3, 4, idx), rel=1e-6)
    assert got["d4"] == pytest.approx(expected_score(1 / 3, 2, idx), rel=1e-6)


def test_slop_excludes_beyond(idx):
    got = rows(S.search_phrase(idx, "alpha beta", k=10, slop=2))
    assert "d5" not in got and "d6" not in got


def test_ngram_phrase_equals_full_phrase(spark):
    """NGramPhraseQuery rewrite matches the SAME docs as the full gram
    phrase (overlapping stride-n grams + last cover every char)."""
    from lucene_solr_old_spark.functions.filters import char_ngram_tokens
    from lucene_solr_old_spark.functions.tokenizer import register_analyzer
    from lucene_solr_old_spark.operators.indexer import build_index
    from lucene_solr_old_spark.operators.search import (ngram_phrase_search,
                                                        phrase_score_frame)

    register_analyzer("ngram2_test", lambda t: char_ngram_tokens(t, 2))
    docs = [("d1", "sparkling water"), ("d2", "spark plug"),
            ("d3", "parking lot"), ("d4", "no match here")]
    df = spark.createDataFrame(docs, "url STRING, text STRING")
    idx = build_index(df, num_segments=2, analyzer="ngram2_test").persist()
    got = {r["key"] for r in
           ngram_phrase_search(idx, "spark", n=2, k=10).collect()}
    assert got == {"d1", "d2"}
    # full (unoptimized) gram phrase: same match set
    grams = ["sp", "pa", "ar", "rk"]
    full = phrase_score_frame(idx, grams, slop=0,
                              offsets=list(range(4)))
    full_keys = {r["key"] for r in
                 full.join(idx.docmeta.select("seg", "docid", "key"),
                           ["seg", "docid"]).select("key").collect()}
    assert full_keys == got
