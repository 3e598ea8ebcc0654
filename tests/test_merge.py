"""Tiered merge planner + merge job + resumable checkpointed build tests."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators import search as S
from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.operators.merge import (
    SegmentMeta, TieredMergePlanner, delete_docs, force_merge, merge_segments)
from lucene_solr_old_spark.sources.pages import gen_pages
from lucene_solr_old_spark.sources.segments import (
    checkpointed_build, checkpoint_status, load_checkpointed)

MB = 1024 * 1024


class TestPlanner:
    def test_no_merge_when_under_budget(self):
        p = TieredMergePlanner()
        segs = [SegmentMeta(i, 10 * MB) for i in range(5)]
        assert p.find_merges(segs) == []

    def test_merge_proposed_when_over_budget(self):
        p = TieredMergePlanner()
        # 25 segments of 3MB: budget is ~ten 3MB-level segments + change
        segs = [SegmentMeta(i, 3 * MB) for i in range(25)]
        merges = p.find_merges(segs)
        assert merges, "over-budget index must propose a merge"
        for m in merges:
            assert 2 <= len(m) <= p.max_merge_at_once
        flat = [s for m in merges for s in m]
        assert len(flat) == len(set(flat)), "segments picked at most once"

    def test_over_large_segments_graced(self):
        p = TieredMergePlanner()
        segs = [SegmentMeta(0, 6 * 1024 * MB)] + [
            SegmentMeta(i, 3 * MB) for i in range(1, 26)]
        merges = p.find_merges(segs)
        assert all(0 not in m for m in merges)

    def test_delete_heavy_merge_preferred(self):
        p = TieredMergePlanner(segs_per_tier=2.0, max_merge_at_once=2)
        # two equal windows, one with huge delete ratio -> lower score
        segs = [SegmentMeta(0, 10 * MB, del_bytes=8 * MB),
                SegmentMeta(1, 10 * MB, del_bytes=8 * MB)] + [
            SegmentMeta(i, 10 * MB) for i in range(2, 12)]
        merges = p.find_merges(segs)
        assert merges
        assert set(merges[0]) == {0, 1}


@pytest.fixture(scope="module")
def corpus():
    return gen_pages(200, seed=23)


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    return spark.createDataFrame(
        corpus, schema="url STRING, warc_ts TIMESTAMP, html BINARY, "
                       "text STRING, lang STRING").persist()


def pairs(df):
    return [(r["key"], round(float(r["score"]), 5)) for r in df.collect()]


QUERIES = ["running meetings", "caresses", "relational hopeful"]


def test_merge_preserves_results(spark, docs_df):
    idx = build_index(docs_df, num_segments=6).persist()
    before = {q: pairs(S.search_or(idx, q, k=10)) for q in QUERIES}
    merged = merge_segments(idx, [0, 1, 2], target_seg=100)
    # segment bookkeeping
    segs = sorted(r["seg"] for r in merged.segstats.collect())
    assert 100 in segs and not {0, 1, 2} & set(segs)
    assert merged.collection_stats() == idx.collection_stats()
    for q in QUERIES:
        assert pairs(S.search_or(merged, q, k=10)) == before[q], q


def test_force_merge_single_segment(spark, docs_df):
    idx = build_index(docs_df, num_segments=5)
    merged = force_merge(idx)
    assert [r["seg"] for r in merged.segstats.collect()] == [0]
    assert pairs(S.search_or(merged, "running meetings", k=10)) == \
        pairs(S.search_or(idx, "running meetings", k=10))


def test_merge_with_deletes_matches_fresh_build(spark, docs_df, corpus):
    idx = build_index(docs_df, num_segments=3)
    # delete 10 docs (wherever they live; merge all segments so deletes
    # apply globally)
    del_keys = [corpus[i][0] for i in range(0, 100, 10)]
    del_df = spark.createDataFrame([(k,) for k in del_keys], "key STRING")
    merged = force_merge(idx, deleted_keys=del_df)
    fresh = build_index(
        docs_df.where(~F.col("url").isin(del_keys)), num_segments=2)
    assert merged.collection_stats() == fresh.collection_stats()
    for q in QUERIES:
        assert pairs(S.search_or(merged, q, k=10)) == \
            pairs(S.search_or(fresh, q, k=10)), q


def test_delete_docs_without_merge(spark, docs_df, corpus):
    idx = build_index(docs_df, num_segments=3)
    del_keys = [corpus[i][0] for i in range(5)]
    del_df = spark.createDataFrame([(k,) for k in del_keys], "key STRING")
    pruned = delete_docs(idx, del_df)
    fresh = build_index(docs_df.where(~F.col("url").isin(del_keys)),
                        num_segments=3)
    assert pruned.collection_stats() == fresh.collection_stats()
    for q in QUERIES:
        assert pairs(S.search_or(pruned, q, k=10)) == \
            pairs(S.search_or(fresh, q, k=10)), q


def test_checkpointed_build_resume(spark, docs_df, tmp_path):
    path = str(tmp_path / "ck")
    # fail after 2 of 4 shards
    with pytest.raises(RuntimeError, match="injected failure"):
        checkpointed_build(spark, docs_df, path, n_shards=4,
                           segments_per_shard=2, fail_after_shards=2,
                           source_desc="pages-200")
    st = checkpoint_status(path, 4)
    assert len(st) == 2, "two shards checkpointed before the failure"
    # resume: completes remaining shards only
    idx = checkpointed_build(spark, docs_df, path, n_shards=4,
                             segments_per_shard=2, source_desc="pages-200")
    st = checkpoint_status(path, 4)
    assert len(st) == 4
    assert all(v["status"] == "complete" for v in st.values())
    assert all(v["metrics"]["docs"] > 0 for v in st.values())
    # results identical to a plain build
    plain = build_index(docs_df, num_segments=4)
    for q in QUERIES:
        assert pairs(S.search_or(idx, q, k=10)) == \
            pairs(S.search_or(plain, q, k=10)), q
    # reload from disk
    loaded = load_checkpointed(spark, path, 4)
    assert pairs(S.search_or(loaded, "running meetings", k=10)) == \
        pairs(S.search_or(plain, "running meetings", k=10))


def test_upsert_docs(spark, docs_df, corpus):
    from lucene_solr_old_spark.operators.merge import upsert_docs

    idx = build_index(docs_df, num_segments=3)
    # replace 3 docs with new text, add 2 brand-new docs
    replaced = [(corpus[i][0], "running meetings replacement text")
                for i in range(3)]
    added = [(f"https://new{i}.com/x", "caresses ponies fresh")
             for i in range(2)]
    new_df = spark.createDataFrame(replaced + added, "url STRING, text STRING")
    up = upsert_docs(idx, new_df)
    # corpus size grew by exactly the brand-new docs
    assert up.collection_stats()[0] == len(corpus) + 2
    # replaced docs score under their NEW content
    from lucene_solr_old_spark.operators.checkindex import validate_index
    hits = {r["key"] for r in
            S.search_and(up, "running meetings replacement", k=50).collect()}
    assert {corpus[i][0] for i in range(3)} <= hits
    # equivalent fresh build gives identical results
    from pyspark.sql import functions as F2
    repl_keys = [r[0] for r in replaced]
    fresh_df = docs_df.where(~F2.col("url").isin(repl_keys)) \
        .select("url", "text").unionByName(new_df)
    fresh = build_index(fresh_df, num_segments=3)
    for q in ["running meetings", "caresses ponies fresh"]:
        assert pairs(S.search_or(up, q, k=10)) == \
            pairs(S.search_or(fresh, q, k=10)), q


def test_merge_renumbering_has_no_global_window(spark, docs_df):
    """MergeState.DocMap renumbering must not funnel all rows through one
    task: the docid-rebase plan may not contain a single-partition
    exchange (the WindowExec-with-empty-partitionBy smell)."""
    idx = build_index(docs_df, num_segments=3)
    merged = merge_segments(idx, [0, 1, 2], target_seg=0)
    plan = merged.docmeta._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_delete_docs_keep_stats(spark, docs_df, corpus):
    """keep_stats=True preserves pre-delete collection stats (the reference
    counts deleted docs in maxDoc/sumTotalTermFreq until merge), so scores
    are unchanged by a delete-without-merge for surviving docs."""
    from lucene_solr_old_spark.operators.checkindex import validate_index

    idx = build_index(docs_df, num_segments=3)
    stats_before = idx.collection_stats()
    del_keys = [corpus[i][0] for i in range(5)]
    del_df = spark.createDataFrame([(k,) for k in del_keys], "key STRING")
    masked = delete_docs(idx, del_df, keep_stats=True)
    assert masked.collection_stats() == stats_before
    # deleted docs never surface
    hits = {r["key"] for r in S.search_or(masked, "running", k=200).collect()}
    assert not (set(del_keys) & hits)
    # masked-delete validation accepts holes + over-counted stats
    report = validate_index(masked, masked_deletes=True)
    assert all(v == 0 for v in report.values()), report
    # strict validation still flags the holes (documented divergence)
    strict = validate_index(masked)
    assert strict["bad_segstats"] > 0 or strict["non_dense_docids"] > 0


def test_versioned_upsert_optimistic_concurrency(spark, docs_df, corpus):
    """DistributedUpdateProcessor.versionAdd: stale update rejected, newer
    wins; within a batch the highest version per key wins."""
    from lucene_solr_old_spark.operators.merge import versioned_upsert

    idx = build_index(docs_df, num_segments=3)
    versions = docs_df.select(
        F.col("url").alias("key"),
        F.unix_timestamp("warc_ts").cast("long").alias("version"))
    stale_key, fresh_key = corpus[0][0], corpus[1][0]
    cur = {r["key"]: r["version"] for r in versions.collect()}
    batch = [
        (stale_key, cur[stale_key] - 100, "stale replacement zzzstale"),
        (fresh_key, cur[fresh_key] + 100, "fresh replacement zzzfresh"),
        (fresh_key, cur[fresh_key] + 50, "superseded within batch zzzmid"),
        ("https://brand.new/doc", 1, "brand new doc zzznew"),
    ]
    new_df = spark.createDataFrame(
        batch, "url STRING, version LONG, text STRING")
    up, new_versions = versioned_upsert(
        idx, versions, new_df, version_col="version")
    assert up.collection_stats()[0] == len(corpus) + 1
    got = {r["key"] for r in S.search_or(up, "zzzstale", k=5).collect()}
    assert got == set(), "stale update must be rejected"
    got = {r["key"] for r in S.search_or(up, "zzzfresh", k=5).collect()}
    assert got == {fresh_key}, "newer update must win"
    got = {r["key"] for r in S.search_or(up, "zzzmid", k=5).collect()}
    assert got == set(), "within-batch superseded version must lose"
    got = {r["key"] for r in S.search_or(up, "zzznew", k=5).collect()}
    assert got == {"https://brand.new/doc"}
    vmap = {r["key"]: r["version"] for r in new_versions.collect()}
    assert vmap[stale_key] == cur[stale_key]
    assert vmap[fresh_key] == cur[fresh_key] + 100
    assert vmap["https://brand.new/doc"] == 1


def test_merge_many_one_job_equals_sequential(spark, docs_df):
    """All planned merges in one pass == sequential merge_segments."""
    from lucene_solr_old_spark.operators.merge import merge_many

    idx = build_index(docs_df, num_segments=6)
    many = merge_many(idx, [[0, 1, 2], [3, 4]])
    seq = merge_segments(idx, [0, 1, 2], target_seg=0)
    seq = merge_segments(seq, [3, 4], target_seg=3)
    assert sorted(r["seg"] for r in many.segstats.collect()) == \
        sorted(r["seg"] for r in seq.segstats.collect()) == [0, 3, 5]
    assert many.collection_stats() == seq.collection_stats()
    for q in QUERIES:
        assert pairs(S.search_or(many, q, k=10)) == \
            pairs(S.search_or(seq, q, k=10)), q
    # no single-partition exchange in the combined renumber
    plan = many.docmeta._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
