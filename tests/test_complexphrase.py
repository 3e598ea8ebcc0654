"""ComplexPhraseQueryParser analogue (plans/query.complex_phrase_search)
and classic-parser ^boost handling."""

from __future__ import annotations

import pytest

from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.plans.query import (
    complex_phrase_search, execute, parse_query)


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [("d1", "big data rocks here"),
         ("d2", "bad data rocks too"),
         ("d3", "data big backwards"),
         ("d4", "unrelated words only")],
        "key string, text string")
    return build_index(docs, key_col="key", text_col="text",
                       num_segments=1, analyzer="ws_stop",
                       with_positions=True).persist()


def test_wildcard_slot_expands_and_matches_adjacency(idx):
    keys = {r["key"] for r in
            complex_phrase_search(idx, "b* data", k=10).collect()}
    assert keys == {"d1", "d2"}          # 'data big' is NOT adjacent in order


def test_question_mark_wildcard(idx):
    keys = {r["key"] for r in
            complex_phrase_search(idx, "b?g data", k=10).collect()}
    assert keys == {"d1"}                # 'bad' has no g


def test_fuzzy_slot(idx):
    keys = {r["key"] for r in
            complex_phrase_search(idx, "dsta~ rocks", k=10).collect()}
    assert keys == {"d1", "d2"}


def test_empty_expansion_matches_nothing(idx):
    assert complex_phrase_search(idx, "zz* data", k=10).count() == 0


def test_max_expansions_cap_is_term_ordered(idx):
    # dictionary b-terms in term order: backwards < bad < big.  Cap 2
    # keeps {backwards, bad} -> only 'bad data' (d2) completes the phrase;
    # cap 3 would re-admit 'big' (d1).
    keys = {r["key"] for r in
            complex_phrase_search(idx, "b* data", k=10,
                                  max_expansions=2).collect()}
    assert keys == {"d2"}


def test_parser_boost_doubles_clause_contribution(idx):
    plain = {r["key"]: r["score"]
             for r in execute(idx, "big", k=10,
                              precision="float64").collect()}
    boosted = {r["key"]: r["score"]
               for r in execute(idx, "big^2", k=10,
                                precision="float64").collect()}
    assert set(plain) == set(boosted) and plain
    for key, s in plain.items():
        assert boosted[key] == pytest.approx(2.0 * s, rel=1e-12)


def test_parser_boost_syntax_parses_on_phrase_and_term():
    q = parse_query('"big data"^3 rocks^1.5')
    assert q.should[0].boost == 3.0
    assert q.should[1].boost == 1.5
