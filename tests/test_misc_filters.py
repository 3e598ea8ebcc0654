"""Miscellaneous token filters (functions/filters.py additions), the
CustomScoreQuery analogue, facet.prefix/missing, and the blended infix
suggester."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_solr_old_spark.functions.filters import (
    capitalization_filter, fingerprint_filter, length_filter,
    limit_token_count, pattern_replace, remove_duplicates, reverse_filter,
    trim_filter, truncate_filter)
from lucene_solr_old_spark.functions.tokenizer import Token


def _toks(*terms, pos=None):
    return [Token(t, i if pos is None else pos[i], i * 10, i * 10 + len(t))
            for i, t in enumerate(terms)]


def test_length_filter_preserves_position_holes():
    out = length_filter(_toks("a", "abc", "abcdef"), min_len=2, max_len=5)
    assert [(t.term, t.pos) for t in out] == [("abc", 1)]


def test_trim_and_truncate_and_reverse():
    assert [t.term for t in trim_filter(_toks("  pad  "))] == ["pad"]
    assert [t.term for t in truncate_filter(_toks("abcdefgh"), 3)] == ["abc"]
    assert [t.term for t in reverse_filter(_toks("abc"))] == ["cba"]
    # offsets untouched by all three
    assert trim_filter(_toks("  pad  "))[0][2:] == (0, 7)


def test_capitalization_filter():
    out = capitalization_filter(_toks("hello", "WORLD", "mIxEd"))
    assert [t.term for t in out] == ["Hello", "World", "Mixed"]


def test_remove_duplicates_same_position_only():
    toks = [Token("run", 0, 0, 3), Token("run", 0, 0, 3),
            Token("run", 1, 4, 7)]
    out = remove_duplicates(toks)
    assert [(t.term, t.pos) for t in out] == [("run", 0), ("run", 1)]


def test_limit_token_count():
    assert len(limit_token_count(_toks("a", "b", "c", "d"), 2)) == 2


def test_pattern_replace_all_vs_first():
    toks = _toks("a-b-c")
    assert pattern_replace(toks, "-", "_")[0].term == "a_b_c"
    assert pattern_replace(toks, "-", "_",
                           replace_all=False)[0].term == "a_b-c"


def test_fingerprint_sorted_unique_single_token():
    out = fingerprint_filter(_toks("beta", "alpha", "beta", "gamma"))
    assert len(out) == 1
    assert out[0].term == "alpha beta gamma"
    assert out[0].pos == 0


def test_fingerprint_max_output_guard_and_empty():
    assert fingerprint_filter([]) == []
    assert fingerprint_filter(_toks("aaaa", "bbbb"), max_output_size=5) == []


# ------------------------------------------------------------ spark-side

def test_custom_score_reorders_before_cut(spark):
    from lucene_solr_old_spark.operators.indexer import build_index
    from lucene_solr_old_spark.operators.search import custom_score_search

    docs = spark.createDataFrame(
        [("d1", "spark spark spark"), ("d2", "spark other words"),
         ("d3", "unrelated text")],
        "key string, text string")
    idx = build_index(docs, key_col="key", text_col="text",
                      num_segments=1, analyzer="ws_stop")
    # a huge boost on the weaker-BM25 doc must move it to rank 1 even
    # with k=1 (the boost applies before the collector cut)
    boosts = spark.createDataFrame(
        [("d1", 1.0), ("d2", 100.0), ("d3", 1.0)], "key string, boost double")
    top = custom_score_search(idx, "spark", boosts, k=1).collect()
    assert top[0]["key"] == "d2"


def test_facet_prefix_and_missing(spark):
    from lucene_solr_old_spark.operators.facets import facet_field

    hits = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)],
                                 "key string")
    dims = spark.createDataFrame(
        [("a", "src1"), ("b", "src10"), ("c", "other"), ("d", None)],
        "key string, source string")
    out = facet_field(hits, dims, "source", prefix="src1", missing=True)
    rows = {r["value"]: r["cnt"] for r in out.collect()}
    assert rows == {"src1": 1, "src10": 1, None: 1}


def test_blended_infix_linear_and_reciprocal(spark):
    from lucene_solr_old_spark.operators.spell import (
        blended_infix_suggest, build_suggest_table)

    surfaces = spark.createDataFrame(
        [("star wars", 10), ("the star", 10), ("alpha beta star", 10),
         ("no match here", 99)],
        "surface string, weight long")
    table = build_suggest_table(surfaces, analyzer="english")
    lin = blended_infix_suggest(table, "star", k=10).collect()
    # 'the' is a stopword: "the star" analyzes to key "star" -> pos 0
    got = {r["surface"]: (r["pos"], r["blended_weight"]) for r in lin}
    assert got == {"star wars": (0, 10.0), "the star": (0, 10.0),
                   "alpha beta star": (2, 8.0)}
    rec = blended_infix_suggest(table, "star", k=10,
                                blender="reciprocal").collect()
    got_r = {r["surface"]: r["blended_weight"] for r in rec}
    assert got_r["alpha beta star"] == round(10 / 3, 6)


def test_icu_fold():
    from lucene_solr_old_spark.functions.filters import icu_fold

    assert icu_fold("Ｗｅｉß Straße") == "weiss strasse"
    assert icu_fold("ÅNGSTRÖM ﬁn") == "angstrom fin"
    assert icu_fold("Ελλάς") == "ελλασ"   # case-folded final sigma, accent off
    assert icu_fold("plain") == "plain"
