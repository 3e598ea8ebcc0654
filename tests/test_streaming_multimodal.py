"""Structured-Streaming incremental indexing + multimodal plumbing +
query-parser tests."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators import search as S
from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.operators.multimodal import (
    extract_features, frame_sample, sniff_media_meta)
from lucene_solr_old_spark.plans.query import execute, parse_query
from lucene_solr_old_spark.sources.pages import PAGES_SCHEMA, gen_pages
from lucene_solr_old_spark.streaming.incremental import (
    open_nrt_reader, start_incremental_indexer)


def pairs(df):
    return [(r["key"], round(float(r["score"]), 5)) for r in df.collect()]


def test_incremental_equals_batch(spark, tmp_path):
    corpus = gen_pages(120, seed=31)
    src_dir = str(tmp_path / "src")
    idx_dir = str(tmp_path / "idx")
    ck_dir = str(tmp_path / "ck")
    # stage the corpus as 3 parquet drops (3 micro-batches at most)
    df = spark.createDataFrame(corpus, schema=PAGES_SCHEMA)
    for i in range(3):
        df.where(F.crc32(F.col("url")) % 3 == i).write.mode(
            "append").parquet(src_dir)
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", "4").parquet(src_dir))
    q = start_incremental_indexer(stream, idx_dir, ck_dir,
                                  segments_per_batch=2, trigger_once=True)
    q.awaitTermination(300)

    nrt = open_nrt_reader(spark, idx_dir)
    batch = build_index(df, num_segments=4)
    assert nrt.collection_stats() == batch.collection_stats()
    for query in ["running meetings", "caresses"]:
        assert pairs(S.search_or(nrt, query, k=10)) == \
            pairs(S.search_or(batch, query, k=10)), query


def test_streaming_resume_is_exactly_once(spark, tmp_path):
    """Re-running the same stream with the same checkpoint adds nothing."""
    corpus = gen_pages(40, seed=5)
    src_dir = str(tmp_path / "src")
    idx_dir = str(tmp_path / "idx")
    ck_dir = str(tmp_path / "ck")
    df = spark.createDataFrame(corpus, schema=PAGES_SCHEMA)
    df.write.parquet(src_dir)
    for _ in range(2):  # second run must be a no-op (checkpoint replay)
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src_dir)
        q = start_incremental_indexer(stream, idx_dir, ck_dir,
                                      trigger_once=True)
        q.awaitTermination(300)
    nrt = open_nrt_reader(spark, idx_dir)
    assert nrt.collection_stats()[0] == 40


# --- multimodal --------------------------------------------------------------

PNG = b"\x89PNG\r\n\x1a\n" + b"x" * 100
JPG = b"\xff\xd8\xff\xe0" + b"y" * 300
MP3 = b"ID3\x04" + b"z" * 50


@pytest.fixture()
def media_df(spark):
    rows = [("a", PNG), ("b", JPG), ("c", MP3), ("d", b""), ("e", None)]
    return spark.createDataFrame(rows, "key STRING, payload BINARY")


def test_sniff_media_meta(media_df):
    got = {r["key"]: (r["format"], r["kind"], r["n_bytes"])
           for r in sniff_media_meta(media_df).collect()}
    assert got["a"] == ("png", "image", 108)
    assert got["b"] == ("jpeg", "image", 304)
    assert got["c"] == ("mp3", "audio", 54)
    assert got["d"] == ("unknown", "binary", 0)
    assert got["e"] == ("unknown", "binary", 0)


def test_extract_features_deterministic(media_df):
    f1 = {r["key"]: r["feature"] for r in extract_features(media_df).collect()}
    f2 = {r["key"]: r["feature"] for r in extract_features(media_df).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    assert f1["a"] != f1["b"]


def test_extract_features_strict_raises(media_df):
    with pytest.raises(Exception, match="media decode requires"):
        extract_features(media_df, strict=True).collect()


def test_frame_sample_shapes(media_df):
    rows = frame_sample(media_df, every_n_bytes=100, frame_bytes=16).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    assert len(by_key["b"]) == 3  # 304 bytes / 100 stride
    assert all(len(r["frame"]) <= 16 for r in rows)
    assert [r["frame_no"] for r in sorted(by_key["b"], key=lambda x: x["frame_no"])] == [0, 1, 2]


# --- query parser ------------------------------------------------------------

def test_parse_query_clauses():
    q = parse_query('+running -vector "batch batch" meetings^2 NOT slow')
    assert [c.text for c in q.must] == ["running"]
    assert [c.text for c in q.must_not] == ["vector", "slow"]
    assert [(c.text, c.boost) for c in q.should] == [
        ("batch batch", 1.0), ("meetings", 2.0)]


def test_parse_infix_and():
    q = parse_query("a AND b")
    assert [c.text for c in q.must] == ["a", "b"]
    q2 = parse_query("a OR b")
    assert [c.text for c in q2.should] == ["a", "b"]


@pytest.fixture(scope="module")
def pidx(spark):
    corpus = gen_pages(150, seed=77)
    df = spark.createDataFrame(corpus, schema=PAGES_SCHEMA)
    return build_index(df, num_segments=3).persist(), corpus


def test_execute_matches_primitive_ops(spark, pidx):
    idx, _ = pidx
    # pure disjunction == search_or
    got = pairs(execute(idx, "running meetings", k=10))
    exp = pairs(S.search_or(idx, "running meetings", k=10))
    assert got == exp
    # pure conjunction == search_and
    got = pairs(execute(idx, "+running +meetings", k=10))
    exp = pairs(S.search_and(idx, "running meetings", k=10))
    assert got == exp
    # must_not == exclude
    got = pairs(execute(idx, "running -meetings", k=10))
    exp = pairs(S.search_terms(idx, "running", exclude_text="meetings", k=10))
    assert got == exp


def test_execute_mixed_must_should(spark, pidx):
    idx, corpus = pidx
    res = execute(idx, "+running meetings", k=200).collect()
    keys = {r["key"] for r in res}
    only_running = {r["key"] for r in S.search_or(idx, "running", k=10**6).collect()}
    assert keys <= only_running  # every hit contains the MUST term


def test_execute_boost_scales_scores(spark, pidx):
    idx, _ = pidx
    base = pairs(execute(idx, "running", k=5))
    boosted = pairs(execute(idx, "running^2", k=5))
    assert [k for k, _ in base] == [k for k, _ in boosted]
    for (_, s1), (_, s2) in zip(base, boosted):
        assert s2 == pytest.approx(2 * s1, rel=1e-5)


def test_flush_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-flushing the same batch_id (crash
    between write and checkpoint commit) must not duplicate segments,
    docids, or segstats rows."""
    from lucene_solr_old_spark.streaming.incremental import flush_index_batch

    idx_dir = str(tmp_path / "replay_idx")
    pages = gen_pages(30, seed=11)
    df = spark.createDataFrame(pages, schema=PAGES_SCHEMA)
    flush_index_batch(df, batch_id=0, index_path=idx_dir,
                      segments_per_batch=2)
    before = open_nrt_reader(spark, idx_dir)
    n_docs, n_ttf = before.collection_stats()
    n_post = before.postings.count()
    # replay the SAME batch (simulated crash-after-write)
    flush_index_batch(df, batch_id=0, index_path=idx_dir,
                      segments_per_batch=2)
    after = open_nrt_reader(spark, idx_dir)
    assert after.collection_stats() == (n_docs, n_ttf)
    assert after.postings.count() == n_post
    assert after.segstats.count() == 2
    # a different batch still lands as new segments
    df2 = spark.createDataFrame(gen_pages(10, seed=12), schema=PAGES_SCHEMA)
    flush_index_batch(df2, batch_id=1, index_path=idx_dir,
                      segments_per_batch=2)
    grown = open_nrt_reader(spark, idx_dir)
    assert grown.collection_stats()[0] == n_docs + 10
    assert grown.segstats.count() == 4


def test_parser_multiterm_clauses(spark, pidx):
    """Wildcard/fuzzy/range syntax in the classic parser."""
    from lucene_solr_old_spark.plans.query import execute, parse_query

    q = parse_query('+run* -[zzz TO zzzz] meeting~1')
    from lucene_solr_old_spark.plans.query import (FuzzyClause,
                                                   RangeClause,
                                                   WildcardClause)
    idx, _ = pidx
    assert isinstance(q.must[0], WildcardClause)
    assert isinstance(q.must_not[0], RangeClause)
    assert isinstance(q.should[0], FuzzyClause)
    got = execute(idx, '+run*', k=10).collect()
    assert len(got) > 0
    # every hit has the constant MUST score folded in; wildcard matches
    # stemmed 'run' terms
    got2 = execute(idx, 'te?m', k=10)
    got2.collect()  # wildcard single-char path executes
