"""FuzzyQuery TopTermsRewrite cap + (later) Lucene RegExp queries.

Reference: ``search/FuzzyQuery.java:54-83`` (defaultMaxExpansions = 50),
``search/TopTermsRewrite.java`` (keep the closest candidates, priority
ordered).
"""

from __future__ import annotations

import pytest

from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.plans.query import FuzzyClause, _fuzzy_terms


@pytest.fixture(scope="module")
def fuzzy_index(spark):
    # 11 dictionary terms within edit distance <=1 of "dog":
    # "dog" itself (d=0) and "doga".."dogj" (d=1, one insertion each)
    words = ["dog"] + [f"dog{c}" for c in "abcdefghij"]
    rows = [(f"u{i}", f"{w} filler{i}") for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "url STRING, text STRING")
    idx = build_index(df, key_col="url", text_col="text", num_segments=2)
    idx.persist()
    return idx


def test_top_terms_rewrite_cap_and_priority(fuzzy_index):
    """With more candidates than max_expansions, keep exactly the
    (distance asc, term asc) priority prefix — the reference's
    TopTermsRewrite order."""
    kept = _fuzzy_terms(
        fuzzy_index, FuzzyClause("dog", max_edits=1, max_expansions=4))
    assert kept == ["dog", "doga", "dogb", "dogc"]


def test_default_expansion_covers_all_when_under_cap(fuzzy_index):
    kept = _fuzzy_terms(fuzzy_index, FuzzyClause("dog", max_edits=1))
    assert len(kept) == 11 and kept[0] == "dog"
