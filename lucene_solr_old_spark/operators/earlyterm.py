"""Early-terminating collection over index-time-sorted segments.

Reference semantics: ``lucene/misc/src/java/org/apache/lucene/index/sorter/``
— ``SortingMergePolicy.java`` re-sorts every segment by a ``Sort`` at merge
time (so in-segment docID order == sort order, ``Sorter.java:60-120``), and
``EarlyTerminatingSortingCollector.java:40-96`` then collects only the first
``numDocsToCollect`` hits of each segment and throws
``CollectionTerminatedException`` — the rest of the segment can never beat
the already-collected docs under the same sort.

Spark-first translation:

* :func:`sort_segments` — the SortingMergePolicy analogue, paid once at
  build time: route docs to segments, order each segment by the sort key,
  and stamp ``seg_pos`` (the in-segment docID; under an index-time sort,
  docID order IS sort order).  One shuffle (the routing exchange) + an
  in-partition sort — the same cost shape as the fused index build.
* :func:`save_sorted` / :func:`load_sorted` — persist the sorted store so
  every file holds one segment in ``seg_pos`` order; parquet row-group
  min/max stats on ``seg_pos`` then make the early-termination predicate a
  storage-level prune, not just a scan filter.
* :func:`early_terminating_topk` — the collector analogue.  Unfiltered,
  the "collect k then terminate" rule is literally ``seg_pos < k``: a
  static predicate Catalyst pushes to the scan (each segment reads ~k rows
  and skips later row groups entirely — the 100-TB shape: a top-20 over a
  sorted store reads 20 x n_segments rows, not the corpus).  With a match
  filter, the per-segment cut is a row_number window over the (already
  sorted) matches — TopFieldCollector-per-leaf — so the global merge sees
  at most k x n_segments rows instead of every match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["sort_segments", "save_sorted", "load_sorted",
           "early_terminating_topk"]


def sort_segments(docs: DataFrame, sort_col: str, *, ascending: bool = True,
                  num_segments: int = 8, key_col: str = "doc_id") -> DataFrame:
    """Index-time sort (SortingMergePolicy): deterministic hash routing to
    ``num_segments`` segments, each ordered by ``(sort_col, key_col)`` with
    ``seg_pos`` = in-segment docID.  Ties break on the doc key so the order
    is total and reproducible."""
    order = [F.col(sort_col).asc() if ascending else F.col(sort_col).desc(),
             F.col(key_col).asc()]
    routed = docs.withColumn(
        "seg", F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                      F.lit(num_segments)).cast("int"))
    w = Window.partitionBy("seg").orderBy(*order)
    return routed.withColumn("seg_pos", F.row_number().over(w) - F.lit(1))


def save_sorted(sorted_docs: DataFrame, path: str,
                mode: str = "overwrite") -> None:
    """Write one file per segment, rows in ``seg_pos`` order, so parquet
    row-group stats on ``seg_pos`` are monotone and the ``seg_pos < k``
    prune skips whole row groups."""
    (sorted_docs.repartition("seg")
     .sortWithinPartitions("seg", "seg_pos")
     .write.mode(mode).partitionBy("seg").parquet(path))


def load_sorted(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def early_terminating_topk(sorted_docs: DataFrame, k: int, *,
                           sort_col: str, ascending: bool = True,
                           key_col: str = "doc_id",
                           where=None) -> DataFrame:
    """Top-``k`` by the store's index-time sort.

    ``where=None``: the EarlyTerminatingSortingCollector fast path — each
    segment contributes exactly its first ``k`` docs (``seg_pos < k``; a
    pushed-down scan predicate), then one global
    TakeOrderedAndProject merges the k x n_segments survivors.

    With ``where``: hits are cut to the first ``k`` *matching* docs per
    segment (the collector counts collected == matching docs,
    ``EarlyTerminatingSortingCollector.java:88-94``) via a row_number
    window in ``seg_pos`` order, then merged the same way.
    """
    order = [F.col(sort_col).asc() if ascending else F.col(sort_col).desc(),
             F.col(key_col).asc()]
    if where is None:
        pruned = sorted_docs.where(F.col("seg_pos") < k)
    else:
        matches = sorted_docs.where(where)
        w = Window.partitionBy("seg").orderBy(F.col("seg_pos").asc())
        pruned = (matches.withColumn("_etsc_rank", F.row_number().over(w))
                  .where(F.col("_etsc_rank") <= k).drop("_etsc_rank"))
    return pruned.orderBy(*order).limit(k)
