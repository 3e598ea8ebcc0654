"""Payload postings + PayloadTermQuery functions (operators/payloads.py);
the payload_term gate certifies the avg path against a DuckDB oracle."""

from __future__ import annotations

import pytest

from lucene_solr_old_spark.operators.payloads import (
    build_payload_postings, delimited_payload_tokens, payload_term_search)


@pytest.fixture(scope="module")
def postings(spark):
    df = spark.createDataFrame(
        [(1, "cat|2.0 dog|0.5 cat|4.0"),
         (2, "cat dog|3.0"),            # bare cat: NULL payload
         (3, "bird|9.0")],
        "doc_id LONG, text STRING")
    return build_payload_postings(df).persist()


def test_tokens_parse_payloads(spark):
    df = spark.createDataFrame([(1, "Cat|2.5 plain x|y|7")],
                               "doc_id LONG, text STRING")
    rows = {(r.pos): (r.term, r.payload)
            for r in delimited_payload_tokens(df).collect()}
    assert rows[0] == ("cat", 2.5)          # lowercased, payload split
    assert rows[1] == ("plain", None)       # no delimiter: no payload
    assert rows[2][0] == "x|y"              # split at the LAST delimiter
    assert rows[2][1] == 7.0


def test_postings_shape(postings):
    row = {r.term: r for r in postings.where("key = 1").collect()}
    assert row["cat"].freq == 2
    assert row["cat"].positions == [0, 2]
    assert row["cat"].payloads == [2.0, 4.0]


def test_avg_min_max_functions(postings):
    avg = {r.key: r.score
           for r in payload_term_search(postings, "cat", "avg").collect()}
    assert avg[1] == pytest.approx(3.0)     # (2+4)/2
    assert avg[2] == pytest.approx(1.0)     # bare token -> default 1.0
    mn = {r.key: r.score
          for r in payload_term_search(postings, "cat", "min").collect()}
    assert mn[1] == pytest.approx(2.0)
    mx = {r.key: r.score
          for r in payload_term_search(postings, "cat", "max").collect()}
    assert mx[1] == pytest.approx(4.0)


def test_unknown_function_rejected(postings):
    with pytest.raises(ValueError):
        payload_term_search(postings, "cat", "median")
