"""EarlyTerminatingSortingCollector analogue (operators/earlyterm.py).

Reference: lucene/misc/.../index/sorter/EarlyTerminatingSortingCollector.java
(collect numDocsToCollect per sorted segment, then terminate) over
SortingMergePolicy-sorted segments (Sorter.java: in-segment docID order ==
sort order)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.earlyterm import (
    early_terminating_topk, load_sorted, save_sorted, sort_segments)


@pytest.fixture(scope="module")
def store(spark):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, 997)).alias("rank_val"),
        (F.col("id") % 7).alias("cat"))
    return sort_segments(docs, "rank_val", ascending=True,
                         num_segments=4).persist()


def test_seg_pos_is_sort_order(store):
    # within every segment, seg_pos ascends exactly with (rank_val, doc_id)
    rows = store.orderBy("seg", "seg_pos").collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.seg, []).append(r)
    assert len(by_seg) == 4
    for seg_rows in by_seg.values():
        keys = [(r.rank_val, r.doc_id) for r in seg_rows]
        assert keys == sorted(keys)
        assert [r.seg_pos for r in seg_rows] == list(range(len(seg_rows)))


def test_unfiltered_topk_matches_full_sort(store):
    got = early_terminating_topk(store, 20, sort_col="rank_val").collect()
    want = (store.orderBy(F.col("rank_val").asc(), F.col("doc_id").asc())
            .limit(20).collect())
    assert [(r.doc_id, r.rank_val) for r in got] == \
        [(r.doc_id, r.rank_val) for r in want]


def test_unfiltered_prune_reads_k_per_segment(store):
    # the "terminate after k" rule: the pre-merge frame is exactly
    # k x n_segments rows, regardless of corpus size
    pruned = store.where(F.col("seg_pos") < 20)
    assert pruned.count() == 20 * 4


def test_filtered_topk_matches_full_sort(store):
    cond = F.col("cat") == 3
    got = early_terminating_topk(store, 15, sort_col="rank_val",
                                 where=cond).collect()
    want = (store.where(cond)
            .orderBy(F.col("rank_val").asc(), F.col("doc_id").asc())
            .limit(15).collect())
    assert [(r.doc_id, r.rank_val) for r in got] == \
        [(r.doc_id, r.rank_val) for r in want]


def test_descending(store):
    # a store sorted ascending serves ascending queries; build a desc store
    docs = store.select("doc_id", "rank_val", "cat")
    desc_store = sort_segments(docs, "rank_val", ascending=False,
                               num_segments=4)
    got = early_terminating_topk(desc_store, 10, sort_col="rank_val",
                                 ascending=False).collect()
    want = (docs.orderBy(F.col("rank_val").desc(), F.col("doc_id").asc())
            .limit(10).collect())
    assert [(r.doc_id, r.rank_val) for r in got] == \
        [(r.doc_id, r.rank_val) for r in want]


def test_pushdown_and_merge_plan(spark, store, tmp_path):
    # storage-level early termination: the seg_pos<k predicate must reach
    # the parquet scan (PushedFilters), and the global merge must be a
    # TakeOrderedAndProject, not a full Sort
    path = str(tmp_path / "sorted_store")
    save_sorted(store, path)
    loaded = load_sorted(spark, path)
    plan = (early_terminating_topk(loaded, 20, sort_col="rank_val")
            ._jdf.queryExecution().executedPlan().toString())
    assert "seg_pos" in plan and "PushedFilters" in plan
    assert "LessThan(seg_pos,20)" in plan.replace(" ", "")
    assert "TakeOrderedAndProject" in plan
    # and the result still matches the full sort
    got = early_terminating_topk(loaded, 20, sort_col="rank_val").collect()
    want = (store.orderBy(F.col("rank_val").asc(), F.col("doc_id").asc())
            .limit(20).collect())
    assert [(r.doc_id, r.rank_val) for r in got] == \
        [(r.doc_id, r.rank_val) for r in want]
