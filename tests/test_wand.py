"""Block-max kernel vs the relational path: differential equality on the
same corpus (the TestBoolean2 cross-scorer-verification analogue,
SURVEY.md §5 #3)."""

import pytest

from lucene_solr_old_spark.operators import search as S
from lucene_solr_old_spark.operators.indexer import build_index, compress_index
from lucene_solr_old_spark.operators.wand import wand_search
from lucene_solr_old_spark.sources.pages import gen_pages

N_DOCS = 300


@pytest.fixture(scope="module")
def both_indexes(spark):
    corpus = gen_pages(N_DOCS, seed=11)
    df = spark.createDataFrame(
        corpus, schema="url STRING, warc_ts TIMESTAMP, html BINARY, "
                       "text STRING, lang STRING")
    raw = build_index(df, num_segments=5).persist()
    comp = compress_index(raw).persist()
    comp.postings.count()
    return raw, comp


def pairs(df):
    return [(r["key"], round(float(r["score"]), 5)) for r in df.collect()]


QUERIES = ["running", "running meetings", "caresses ponies relational",
           "the running", "zzznothing", "don't", "meetings meetings running"]


def test_wand_or_matches_relational(both_indexes):
    raw, comp = both_indexes
    for q in QUERIES:
        rel = pairs(S.search_or(raw, q, k=10))
        wnd = pairs(wand_search(comp, q, k=10, mode="OR"))
        assert wnd == rel, q


def test_wand_and_matches_relational(both_indexes):
    raw, comp = both_indexes
    for q in ["running meetings", "caresses ponies", "running zzznothing"]:
        rel = pairs(S.search_and(raw, q, k=10))
        wnd = pairs(wand_search(comp, q, k=10, mode="AND"))
        assert wnd == rel, q


def test_wand_k_larger_than_hits(both_indexes):
    raw, comp = both_indexes
    rel = pairs(S.search_or(raw, "caresses", k=500))
    wnd = pairs(wand_search(comp, "caresses", k=500))
    assert wnd == rel


def test_compressed_save_load_roundtrip(spark, both_indexes, tmp_path):
    from lucene_solr_old_spark.operators.indexer import load_index

    _raw, comp = both_indexes
    path = str(tmp_path / "idx")
    comp.save(path)
    loaded = load_index(spark, path)
    got = pairs(wand_search(loaded, "running meetings", k=10))
    exp = pairs(wand_search(comp, "running meetings", k=10))
    assert got == exp
