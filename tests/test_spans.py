"""SpanNear + CommonTermsQuery semantics on a hand-built corpus."""

import pytest

from lucene_solr_old_spark.operators import search as S
from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.operators.spans import common_terms_query, span_near

DOCS = [
    ("d1", "alpha beta gamma delta"),       # alpha..gamma ordered span 3
    ("d2", "gamma xx alpha"),               # unordered span 3, not ordered
    ("d3", "alpha xx xx xx xx gamma"),      # span 6 (> slop budget)
    ("d4", "alpha gamma"),                  # tight ordered span 2
    ("d5", "gamma alpha gamma"),            # both orders available
    ("d6", "alpha beta"),                   # missing gamma
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, "url STRING, text STRING")
    return build_index(df, num_segments=2, analyzer="ws_stop").persist()


def keys(df):
    return {r["key"] for r in df.collect()}


def test_span_near_ordered(idx):
    # window budget = 2 terms + slop 1 = 3 positions
    got = keys(span_near(idx, "alpha gamma", slop=1, in_order=True, k=10))
    assert got == {"d1", "d4", "d5"}


def test_span_near_unordered(idx):
    got = keys(span_near(idx, "alpha gamma", slop=1, in_order=False, k=10))
    assert got == {"d1", "d2", "d4", "d5"}


def test_span_near_slop_zero_adjacent_only(idx):
    got = keys(span_near(idx, "alpha gamma", slop=0, in_order=True, k=10))
    assert got == {"d4", "d5"}


def test_span_near_wide_slop(idx):
    got = keys(span_near(idx, "alpha gamma", slop=4, in_order=True, k=10))
    assert got == {"d1", "d3", "d4", "d5"}


def test_common_terms_matches_low_df_docs_only(spark, idx):
    # 'alpha' df=5/6 (high at ratio 0.5), 'beta' df=2/6 (low)
    got = common_terms_query(idx, "alpha beta", max_df_ratio=0.5, k=10)
    gk = keys(got)
    assert gk == {"d1", "d6"}  # only docs containing the low-df term
    # scores include the high-df contribution where present
    or_scores = {r["key"]: r["score"]
                 for r in S.search_or(idx, "alpha beta", k=10).collect()}
    ct_scores = {r["key"]: r["score"] for r in got.collect()}
    for k_ in gk:
        assert ct_scores[k_] == pytest.approx(or_scores[k_], rel=1e-6)


def test_common_terms_all_high_falls_back(idx):
    got = common_terms_query(idx, "alpha gamma", max_df_ratio=0.01, k=10)
    assert len(keys(got)) > 0  # falls back to plain disjunction


def test_multi_phrase(idx, spark):
    from lucene_solr_old_spark.operators.spans import multi_phrase

    # "alpha (beta|gamma)" — beta path matches d1/d6; gamma path d4/d5
    got = keys(multi_phrase(idx, [["alpha"], ["beta", "gamma"]], k=10))
    assert got == {"d1", "d4", "d5", "d6"}
    # single-member slots degrade to exact phrase
    exact = keys(multi_phrase(idx, [["alpha"], ["gamma"]], k=10))
    from lucene_solr_old_spark.operators.search import search_phrase
    assert exact == keys(search_phrase(idx, "alpha gamma", k=10))


def test_highlight_analyzed(spark):
    from lucene_solr_old_spark.operators.highlight import highlight_analyzed

    df = spark.createDataFrame(
        [("a", "The Running foxes were meeting near the river."),
         ("b", "nothing to see here"),
         ("c", "run " + "x" * 200 + " running")],
        "key STRING, text STRING")
    out = {r["key"]: r["snippet"]
           for r in highlight_analyzed(df, "running", frag=10).collect()}
    assert "b" not in out
    assert "<em>Running</em>" in out["a"]     # stem match, original casing
    assert out["c"].startswith("<em>run</em>")  # first match wins the fragment
