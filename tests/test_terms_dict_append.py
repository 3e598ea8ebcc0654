"""Correctness fixes from the r5 advisor: a stored terms_dict must not
survive appends (it would silently drop newly indexed terms from every
multi-term expansion and from term_stats), and packed layout is
write-once."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.indexer import build_index, load_index


def _idx(spark, rows):
    df = spark.createDataFrame(rows, "k STRING, t STRING")
    return build_index(df, key_col="k", text_col="t", num_segments=2,
                       analyzer="ws_lower")


def test_save_append_drops_stored_terms_dict(spark, tmp_path):
    path = str(tmp_path / "idx")
    _idx(spark, [("a", "alpha beta"), ("b", "beta gamma")]).save(path)
    assert os.path.isdir(os.path.join(path, "terms_dict"))

    idx2 = _idx(spark, [("c", "delta epsilon")])
    idx2.postings = idx2.postings.withColumn(
        "seg", (F.col("seg") + 2).cast("int"))
    idx2.docmeta = idx2.docmeta.withColumn(
        "seg", (F.col("seg") + 2).cast("int"))
    idx2.segstats = idx2.segstats.withColumn(
        "seg", (F.col("seg") + 2).cast("int"))
    idx2.save(path, mode="append")

    # the stale stored dict is gone, and a reloaded index sees the NEW terms
    assert not os.path.isdir(os.path.join(path, "terms_dict"))
    reloaded = load_index(spark, path)
    stats = reloaded.term_stats(["delta", "beta"])
    assert stats["delta"][0] == 1
    assert stats["beta"][0] == 2
    terms = {r["term"] for r in reloaded.terms_dict().collect()}
    assert {"alpha", "beta", "gamma", "delta", "epsilon"} <= terms


def test_flush_index_batch_drops_stored_terms_dict(spark, tmp_path):
    from lucene_solr_old_spark.streaming.incremental import flush_index_batch

    path = str(tmp_path / "idx")
    _idx(spark, [("a", "alpha beta")]).save(path)
    assert os.path.isdir(os.path.join(path, "terms_dict"))

    batch = spark.createDataFrame([("c", "delta epsilon")],
                                  "k STRING, t STRING")
    flush_index_batch(batch, batch_id=7, index_path=path, key_col="k",
                      text_col="t", analyzer="ws_lower")
    assert not os.path.isdir(os.path.join(path, "terms_dict"))
    reloaded = load_index(spark, path)
    assert reloaded.term_stats(["delta"])["delta"][0] == 1


def test_packed_layout_rejects_append(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx = _idx(spark, [("a", "alpha beta")])
    with pytest.raises(ValueError, match="write-once"):
        idx.save(path, mode="append", layout="packed")
