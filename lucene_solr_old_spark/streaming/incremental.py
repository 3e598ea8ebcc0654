"""Incremental (near-real-time) indexing via Structured Streaming.

The reference's NRT surface (SURVEY.md §2.9) re-expressed:

  * ``DirectoryReader.open(IndexWriter)`` / soft commit ->
    each micro-batch flushes new SEGMENTS (parquet appends); any reader
    loading the index afterwards sees them — snapshot semantics come from
    the storage layer (Iceberg snapshots in production; parquet dirs here);
  * transaction log / replay (``UpdateLog.java:779-812``) ->
    Structured Streaming's checkpoint dir replays the failed micro-batch
    (at-least-once); the flush itself is made idempotent per batch_id via
    dynamic partition overwrite, so replay achieves effective exactly-once;
  * ``CommitTracker`` auto-commit thresholds -> the stream trigger.

Each micro-batch builds ``segments_per_batch`` segments labeled
``batch_id * segments_per_batch + local`` — globally unique, so the
accumulated index is just the union of all flushed segments, and query
results are IDENTICAL to a one-shot batch build of the same rows (global
stats are computed from segstats at query time).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.indexer import InvertedIndex, build_index, load_index

__all__ = ["start_incremental_indexer", "open_nrt_reader",
           "flush_index_batch"]


def _require_segdir_layout(index_path: str) -> None:
    """Appends write ``seg=`` partition directories; a ``packed``
    (bulk-ingest) index stores plain range files, and Spark cannot read
    a directory mixing both — so a packed target must be rejected UP
    FRONT, not discovered as a corrupt read later (indexer.save
    docstring: packed is write-once)."""
    import json
    import os

    meta_path = os.path.join(index_path, "index_meta.json")
    if not os.path.exists(meta_path):
        return  # fresh directory — this batch creates it as segdir
    with open(meta_path) as f:
        layout = json.load(f).get("layout", "segdir")
    if layout != "segdir":
        raise ValueError(
            f"index at {index_path!r} has layout={layout!r}; incremental "
            "appends require layout='segdir' (re-save the index with the "
            "default layout, or bulk-rebuild instead of appending)")


def flush_index_batch(batch_df: DataFrame, batch_id: int, index_path: str,
                      key_col: str = "url", text_col: str = "text",
                      html_col: str | None = None,
                      analyzer: str = "english",
                      segments_per_batch: int = 2) -> None:
    """Build and publish one micro-batch's segments — idempotent per
    batch_id (safe under foreachBatch's at-least-once replay)."""
    _require_segdir_layout(index_path)
    if batch_df.isEmpty():
        return
    idx = build_index(batch_df, key_col=key_col, text_col=text_col,
                      html_col=html_col, analyzer=analyzer,
                      num_segments=segments_per_batch)
    base = batch_id * segments_per_batch
    relabeled = InvertedIndex(
        idx.postings.withColumn("seg", (F.col("seg") + base).cast("int")),
        idx.docmeta.withColumn("seg", (F.col("seg") + base).cast("int")),
        idx.segstats.withColumn("seg", (F.col("seg") + base).cast("int")),
        idx.with_positions, idx.analyzer)
    # IDEMPOTENT flush: foreachBatch is at-least-once (a crash between
    # the write and the streaming-checkpoint commit replays the batch),
    # so a blind append would duplicate the batch's segments.  Segment
    # ids are a pure function of batch_id, so dynamic partition
    # overwrite (replace exactly the seg= partitions this batch owns,
    # leave all others) makes the replay rewrite the same segments
    # instead of appending twins — the transaction-log replay semantics
    # of ``update/UpdateLog.java:779-812`` (replayed ops overwrite,
    # not duplicate).  segstats is written seg-partitioned too so its
    # rows are replaced by the same mechanism.
    spark = batch_df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        relabeled.postings.write.mode("overwrite") \
            .partitionBy("seg").parquet(os.path.join(index_path, "postings"))
        relabeled.docmeta.write.mode("overwrite") \
            .partitionBy("seg").parquet(os.path.join(index_path, "docmeta"))
        relabeled.segstats.write.mode("overwrite") \
            .partitionBy("seg").parquet(os.path.join(index_path, "segstats"))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # a flushed batch makes any stored terms_dict stale (it predates the
    # new segments' terms); drop it so readers opened via load_index
    # re-derive the dictionary lazily instead of silently losing the new
    # terms from multi-term expansions and term_stats
    from ..operators.indexer import _drop_stored_terms_dict
    _drop_stored_terms_dict(index_path)


def start_incremental_indexer(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    key_col: str = "url",
    text_col: str = "text",
    html_col: str | None = None,
    analyzer: str = "english",
    segments_per_batch: int = 2,
    trigger_once: bool = True,
):
    """Attach a foreachBatch sink that publishes index segments per batch.
    Returns the StreamingQuery (caller awaits/stops)."""

    def flush_batch(batch_df: DataFrame, batch_id: int) -> None:
        flush_index_batch(batch_df, batch_id, index_path, key_col=key_col,
                          text_col=text_col, html_col=html_col,
                          analyzer=analyzer,
                          segments_per_batch=segments_per_batch)

    writer = (stream_df.writeStream
              .foreachBatch(flush_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def open_nrt_reader(spark: SparkSession, index_path: str,
                    analyzer: str = "english",
                    with_positions: bool = True) -> InvertedIndex:
    """Point-in-time reader over whatever segments have been flushed —
    the SearcherManager.maybeRefresh analogue (re-open to see new docs)."""
    idx = load_index(spark, index_path)
    idx.analyzer = analyzer
    idx.with_positions = with_positions
    return idx
