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


# ---------------------------------------------------------------------------
# Lucene RegExp (util/automaton/RegExp.java syntax)
# ---------------------------------------------------------------------------

from lucene_solr_old_spark.functions.regexp import (  # noqa: E402
    RegexpSyntaxError, matches, parse_regexp, to_java_regex)


class TestRegexpLanguage:
    def test_core_operators(self):
        assert matches("ab*c", "ac") and matches("ab*c", "abbbc")
        assert not matches("ab+c", "ac")
        assert matches("a|bc", "bc") and not matches("a|bc", "ab")
        assert matches("[a-c]x", "bx") and not matches("[^a-c]x", "bx")
        assert matches("a{2,3}", "aaa") and not matches("a{2,3}", "aaaa")

    def test_lucene_specific_operators(self):
        # @ anystring, ~ complement, & intersection, # empty language
        assert matches("sp@", "spark") and not matches("sp@", "s")
        assert matches("~(abc)", "abd") and not matches("~(abc)", "abc")
        assert matches("[a-z]+&~(spark)", "spork")
        assert not matches("[a-z]+&~(spark)", "spark")
        assert not matches("#", "") and matches("#|x", "x")
        assert matches('"a|b"', "a|b") and not matches('"a|b"', "a")

    def test_decimal_intervals(self):
        assert matches("<1-100>", "42") and not matches("<1-100>", "101")
        assert matches("<1-100>", "042")        # non-fixed: leading zeros ok
        assert matches("<01-12>", "07") and not matches("<01-12>", "7")

    def test_invalid_syntax_raises(self):
        for bad in ["(a", "a)", "[a", "a{3,2}", '"open', "<1-", "*a"]:
            try:
                parse_regexp(bad)
                assert False, f"no error for {bad!r}"
            except RegexpSyntaxError:
                pass

    def test_java_translation_fast_path(self):
        assert to_java_regex("sp@") == "^(?:sp.*)$"
        assert to_java_regex("~x") is None          # complement -> NFA path
        assert to_java_regex("a&b") is None
        assert to_java_regex("<01-12>") is not None  # small fixed interval


class TestRegexpClause:
    def test_classic_parser_slash_syntax(self, fuzzy_index):
        from lucene_solr_old_spark.plans.query import (
            RegexpClause, execute, parse_query)

        q = parse_query("/dog[a-c]/")
        assert isinstance(q.should[0], RegexpClause)
        hits = execute(fuzzy_index, q, k=10).collect()
        assert len(hits) == 3  # doga, dogb, dogc docs

    def test_nfa_fallback_complement(self, fuzzy_index):
        from lucene_solr_old_spark.plans.query import execute

        # all dog-family terms EXCEPT the bare "dog" (complement needs NFA)
        hits = execute(fuzzy_index, "/dog[a-z]*&~(dog)/", k=20).collect()
        assert len(hits) == 10


# ---- r5: classic-parser slop + fuzzy prefixLength --------------------------

def test_parse_phrase_slop():
    from lucene_solr_old_spark.plans.query import PhraseClause, parse_query

    q = parse_query('"bank of england"~2^3 plain "exact one"')
    ph = [c for c in q.should if isinstance(c, PhraseClause)]
    assert ph[0].slop == 2 and ph[0].boost == 3.0
    assert ph[1].slop == 0 and ph[1].boost == 1.0


def test_sloppy_phrase_via_parser(spark):
    from lucene_solr_old_spark.operators.indexer import build_index
    from lucene_solr_old_spark.plans.query import execute

    docs = spark.createDataFrame(
        [("a", "bank merger of england"), ("b", "bank of england"),
         ("c", "england bank")], "url string, text string")
    idx = build_index(docs, num_segments=1, analyzer="ws_lower")
    exact = {r["key"] for r in execute(idx, '"bank england"', k=5).collect()}
    sloppy = {r["key"] for r in
              execute(idx, '"bank england"~2', k=5).collect()}
    assert exact == set()
    # slop 2 reaches both "bank ~ ~ england" (2 moves) and the
    # transposed "england bank"
    assert sloppy == {"a", "b", "c"}


def test_fuzzy_prefix_length(spark):
    from lucene_solr_old_spark.operators.indexer import build_index
    from lucene_solr_old_spark.plans.query import (FuzzyClause, BoolQuery,
                                                   execute)

    docs = spark.createDataFrame(
        [("a", "roam home"), ("b", "foam soap")],
        "url string, text string")
    idx = build_index(docs, num_segments=1, analyzer="ws_lower")
    free = BoolQuery(should=[FuzzyClause("roam", max_edits=1)])
    pinned = BoolQuery(should=[FuzzyClause("roam", max_edits=1,
                                           prefix_length=1)])
    assert {r["key"] for r in execute(idx, free, k=5).collect()} == {"a", "b"}
    # prefixLength=1 keeps only candidates sharing 'r': foam drops
    assert {r["key"] for r in
            execute(idx, pinned, k=5).collect()} == {"a"}
