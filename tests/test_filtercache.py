"""Solr filterCache analogue (SolrIndexSearcher.java:120-149)."""

from __future__ import annotations

import pytest

from lucene_solr_old_spark.operators.cache import FilterCache
from lucene_solr_old_spark.operators.indexer import build_index


@pytest.fixture(scope="module")
def index(spark):
    rows = [(f"d{i}", f"spark merge w{i % 5} filler") for i in range(40)]
    df = spark.createDataFrame(rows, "k STRING, text STRING")
    idx = build_index(df, key_col="k", text_col="text", num_segments=2,
                      analyzer="ws_stop")
    idx.persist()
    return idx


def test_second_identical_fq_reuses_cached_plan(spark, index):
    fc = FilterCache(max_size=4)
    a = fc.get(index, ["spark"])
    assert a.count() == 40
    b = fc.get(index, ["spark"])
    assert b is a and fc.hits == 1 and fc.misses == 1
    # the reused frame scans the in-memory cache, not the postings join
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_normalized_key_order_and_mode(spark, index):
    fc = FilterCache(max_size=4)
    a = fc.get(index, ["spark", "merge"], mode="and")
    b = fc.get(index, ["merge", "spark"], mode="AND")
    assert b is a
    c = fc.get(index, ["spark", "merge"], mode="OR")
    assert c is not a


def test_lru_eviction_unpersists(spark, index):
    fc = FilterCache(max_size=2)
    a = fc.get(index, ["w0"])
    a.count()
    fc.get(index, ["w1"])
    fc.get(index, ["w2"])          # evicts w0
    assert a.storageLevel.useMemory is False
    assert len(fc._entries) == 2
    fc.clear()
    assert len(fc._entries) == 0
