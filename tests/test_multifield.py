"""Multi-field indexing + fielded query tests."""

import numpy as np
import pytest

from lucene_solr_old_spark.functions.bm25 import Bm25Stats
from lucene_solr_old_spark.functions.smallfloat import doclen_to_norm
from lucene_solr_old_spark.operators import search as S
from lucene_solr_old_spark.operators.multifield import (
    build_multifield_index, parse_fielded, search_fielded)

DOCS = [
    ("u1", "spark engine overview", "the spark engine indexes documents"),
    ("u2", "merge policies", "tiered merges compact spark segments"),
    ("u3", "query parsing", "boolean queries and phrase queries"),
    ("u4", "spark tuning", "shuffle partitions and memory tuning"),
]


@pytest.fixture(scope="module")
def mfi(spark):
    df = spark.createDataFrame(DOCS, "url STRING, title STRING, body STRING")
    return build_multifield_index(
        df, key_col="url", fields={"title": "title", "body": "body"},
        default_field="body", num_segments=2)


def test_parse_fielded():
    assert parse_fielded("title:foo bar body:baz", "body") == [
        ("title", "foo"), ("body", "bar"), ("body", "baz")]


def test_field_isolation(mfi):
    # 'tune' (stem of tuning) in title only for u4; body only for u4 too —
    # use 'overview': title-only u1
    r = {x["key"] for x in search_fielded(mfi, "title:overview", k=10).collect()}
    assert r == {"u1"}
    r2 = {x["key"] for x in search_fielded(mfi, "body:overview", k=10).collect()}
    assert r2 == set()


def test_default_field(mfi):
    r = {x["key"] for x in search_fielded(mfi, "shuffle", k=10).collect()}
    assert r == {"u4"}


def test_per_field_stats(mfi):
    """'spark' scores against each field's OWN df/avgdl — the title hit and
    body hit have different idf; the single-field oracle checks one side."""
    title_idx = mfi.field("title")
    got = {r["key"]: r["score"]
           for r in search_fielded(mfi, "title:spark", k=10).collect()}
    exp = {r["key"]: r["score"]
           for r in S.search_or(title_idx, "spark", k=10).collect()}
    assert got == exp


def test_cross_field_sum(mfi):
    """title:spark body:spark == float sum of per-field scores per doc."""
    t = {r["key"]: float(r["score"])
         for r in search_fielded(mfi, "title:spark", k=10).collect()}
    b = {r["key"]: float(r["score"])
         for r in search_fielded(mfi, "body:spark", k=10).collect()}
    both = {r["key"]: float(r["score"])
            for r in search_fielded(mfi, "title:spark body:spark",
                                    k=10).collect()}
    for key in both:
        exp = t.get(key, 0.0) + b.get(key, 0.0)
        assert both[key] == pytest.approx(exp, rel=1e-6), key
