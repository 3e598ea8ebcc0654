"""Segment merging: tiered merge planning + the distributed merge job.

Planner re-derives TieredMergePolicy's algorithm
(``lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java:268-409``):

  * segments sorted by (delete-discounted) size descending; over-large
    segments (>= maxMergedSegmentBytes/2) graced out;
  * allowed segment count from tier geometry: per level of ``segsPerTier``
    segments of ``levelSize`` (starting at the floored min segment size,
    multiplying by ``maxMergeAtOnce`` per tier);
  * when over budget, every window of <= maxMergeAtOnce consecutive
    (size-sorted) eligible segments is scored:
    ``skew * totAfterMergeBytes^0.05 * nonDelRatio^reclaimDeletesWeight``
    (:430-470); lowest score wins; repeat until within budget.

Defaults mirror the reference: maxMergeAtOnce=10, segsPerTier=10,
floor=2MB, maxMergedSegment=5GB, reclaimDeletesWeight=2
(``TieredMergePolicy.java:81-88``).

The merge job itself is the Spark restatement of ``SegmentMerger.merge()``
(``index/SegmentMerger.java:85-135``): docIDs are rebased per source
segment (``MergeState.DocMap``), deleted docs dropped and the survivors
renumbered densely, posting lists concatenated in rebased-docID order
(no re-sort needed: source lists are docid-sorted and rebased ranges are
disjoint and ordered), per-term stats re-summed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window, functions as F

from .indexer import InvertedIndex

__all__ = ["TieredMergePlanner", "SegmentMeta", "merge_segments",
           "delete_docs", "force_merge", "upsert_docs"]


@dataclass
class SegmentMeta:
    seg: int
    size_bytes: int
    del_bytes: int = 0  # estimated bytes attributable to deleted docs

    @property
    def live_size(self) -> int:
        return max(0, self.size_bytes - self.del_bytes)


@dataclass
class TieredMergePlanner:
    max_merge_at_once: int = 10
    segs_per_tier: float = 10.0
    floor_segment_bytes: int = 2 * 1024 * 1024
    max_merged_segment_bytes: int = 5 * 1024 * 1024 * 1024
    reclaim_deletes_weight: float = 2.0

    def _floor(self, nbytes: float) -> float:
        return max(self.floor_segment_bytes, nbytes)

    def find_merges(self, segments: list[SegmentMeta]) -> list[list[int]]:
        """-> list of merges, each a list of seg ids (size-desc windows)."""
        if not segments:
            return []
        inf = sorted(segments, key=lambda s: -s.live_size)
        tot = sum(s.live_size for s in inf)
        too_big = 0
        while (too_big < len(inf)
               and inf[too_big].live_size >= self.max_merged_segment_bytes / 2.0):
            tot -= inf[too_big].live_size
            too_big += 1
        min_bytes = self._floor(min(s.live_size for s in inf))

        level_size = min_bytes
        bytes_left = float(tot)
        allowed = 0.0
        while True:
            level_count = bytes_left / level_size
            if level_count < self.segs_per_tier:
                allowed += -(-level_count // 1)  # ceil
                break
            allowed += self.segs_per_tier
            bytes_left -= self.segs_per_tier * level_size
            level_size *= self.max_merge_at_once
        allowed_int = int(allowed)

        picked: set[int] = set()
        merges: list[list[int]] = []
        while True:
            eligible = [s for s in inf[too_big:] if s.seg not in picked]
            if not eligible or len(eligible) < allowed_int:
                return merges
            best = None
            best_score = None
            # candidate windows start at 0..size-maxMergeAtOnce (reference
            # uses `startIdx <= eligible.size()-maxMergeAtOnce`)
            for start in range(0, max(0, len(eligible) - self.max_merge_at_once + 1)):
                cand: list[SegmentMeta] = []
                tot_after = 0
                hit_too_large = False
                for s in eligible[start:]:
                    if len(cand) >= self.max_merge_at_once:
                        break
                    if tot_after + s.live_size > self.max_merged_segment_bytes:
                        hit_too_large = True
                        continue  # keep packing smaller segments
                    cand.append(s)
                    tot_after += s.live_size
                if len(cand) < 2:
                    continue
                score = self._score(cand, hit_too_large)
                if best_score is None or score < best_score:
                    best, best_score = cand, score
            if not best:
                return merges
            merges.append([s.seg for s in best])
            picked.update(s.seg for s in best)

    def _score(self, cand: list[SegmentMeta], hit_too_large: bool) -> float:
        tot_after = sum(s.live_size for s in cand)
        tot_before = sum(s.size_bytes for s in cand)
        tot_floored = sum(self._floor(s.live_size) for s in cand)
        if hit_too_large:
            skew = 1.0 / self.max_merge_at_once
        else:
            skew = self._floor(cand[0].live_size) / tot_floored
        score = skew * (tot_after ** 0.05)
        non_del = tot_after / tot_before if tot_before else 1.0
        return score * (non_del ** self.reclaim_deletes_weight)


def _posting_cols(with_positions: bool):
    cols = [F.col("p.docid").alias("docid"), F.col("p.freq").alias("freq"),
            F.col("p.norm").alias("norm")]
    if with_positions:
        cols.append(F.col("p.positions").alias("positions"))
    return cols


def merge_segments(index: InvertedIndex, seg_ids: list[int],
                   target_seg: int,
                   deleted_keys: DataFrame | None = None) -> InvertedIndex:
    """Merge ``seg_ids`` into one segment ``target_seg``; optionally drop
    docs whose key appears in ``deleted_keys`` (a single-column 'key' frame
    — the BufferedDeletes application point, ``BufferedDeletesStream.java``).

    Returns a NEW InvertedIndex whose postings/docmeta have the merged
    segment replacing the sources (other segments pass through untouched).
    """
    wp = index.with_positions
    in_merge = F.col("seg").isin(seg_ids)

    # --- docmeta: drop deletes, renumber densely in (seg, docid) order ----
    src_meta = index.docmeta.where(in_merge)
    if deleted_keys is not None:
        src_meta = src_meta.join(deleted_keys, "key", "left_anti")
    w = Window.orderBy("seg", "docid")  # single merged segment: global order
    docmap = src_meta.select(
        "seg", "docid",
        (F.row_number().over(w) - 1).alias("new_docid"),
    )
    new_meta = (src_meta.join(docmap, ["seg", "docid"])
                .select(F.lit(target_seg).alias("seg"),
                        F.col("new_docid").alias("docid"),
                        "key", "doclen", "norm"))

    # --- postings: explode sources, remap docids, re-aggregate ------------
    src_posts = (index.postings.where(in_merge)
                 .select("seg", "term", F.explode("postings").alias("p"))
                 .select("seg", "term", *_posting_cols(wp)))
    remapped = (src_posts.join(docmap, ["seg", "docid"])
                .drop("docid").withColumnRenamed("new_docid", "docid"))
    pcols = [F.col("docid"), F.col("freq"), F.col("norm")]
    if wp:
        pcols.append(F.col("positions"))
    new_posts = (remapped.groupBy("term")
                 .agg(F.count("*").cast("int").alias("df"),
                      F.sum("freq").cast("long").alias("ttf"),
                      F.sort_array(F.collect_list(F.struct(*pcols)))
                      .alias("postings"))
                 .select(F.lit(target_seg).alias("seg"), "term", "df", "ttf",
                         "postings"))

    new_stats = new_meta.groupBy("seg").agg(
        F.count("*").alias("max_doc"), F.sum("doclen").alias("sum_ttf"))

    keep = ~in_merge
    return InvertedIndex(
        postings=index.postings.where(keep).unionByName(new_posts),
        docmeta=index.docmeta.where(keep).unionByName(new_meta),
        segstats=index.segstats.where(keep).unionByName(new_stats),
        with_positions=wp,
        analyzer=index.analyzer,
    )


def delete_docs(index: InvertedIndex, deleted_keys: DataFrame) -> InvertedIndex:
    """Buffered-delete application without merging: rebuild every affected
    segment's docmeta/postings minus the deleted keys (docids preserved —
    like liveDocs masking, holes allowed; maxDoc shrinks to live count)."""
    live_meta = index.docmeta.join(deleted_keys, "key", "left_anti")
    live_ids = live_meta.select("seg", "docid")
    wp = index.with_positions
    src = (index.postings
           .select("seg", "term", F.explode("postings").alias("p"))
           .select("seg", "term", *_posting_cols(wp)))
    kept = src.join(live_ids, ["seg", "docid"], "left_semi")
    pcols = [F.col("docid"), F.col("freq"), F.col("norm")]
    if wp:
        pcols.append(F.col("positions"))
    new_posts = (kept.groupBy("seg", "term")
                 .agg(F.count("*").cast("int").alias("df"),
                      F.sum("freq").cast("long").alias("ttf"),
                      F.sort_array(F.collect_list(F.struct(*pcols)))
                      .alias("postings")))
    new_stats = live_meta.groupBy("seg").agg(
        F.count("*").alias("max_doc"), F.sum("doclen").alias("sum_ttf"))
    return InvertedIndex(new_posts, live_meta, new_stats, wp, index.analyzer)


def force_merge(index: InvertedIndex,
                deleted_keys: DataFrame | None = None) -> InvertedIndex:
    """forceMerge(1) — collapse everything into segment 0
    (``IndexWriter.forceMerge``)."""
    segs = [r["seg"] for r in index.segstats.select("seg").collect()]
    return merge_segments(index, segs, 0, deleted_keys)


def upsert_docs(index: InvertedIndex, new_docs, key_col: str = "url",
                text_col: str = "text", html_col: str | None = None,
                next_seg: int | None = None) -> InvertedIndex:
    """updateDocument semantics (``IndexWriter.updateDocument`` = atomic
    delete-by-key + add; Solr's versioned upsert,
    ``DistributedUpdateProcessor.versionAdd``): rows in ``new_docs`` replace
    any existing docs with the same key, landing as fresh segments.

    The delete applies lazily through `delete_docs` (liveDocs-style masking
    of the old segments); the adds build new segments numbered from
    ``next_seg`` (default: max existing + 1).
    """
    from .indexer import build_index

    if next_seg is None:
        row = index.segstats.agg(F.max("seg")).collect()[0]
        next_seg = int(row[0] or -1) + 1
    keys = new_docs.select(F.col(key_col).alias("key")).distinct()
    pruned = delete_docs(index, keys)
    added = build_index(new_docs, key_col=key_col, text_col=text_col,
                        html_col=html_col, num_segments=2,
                        analyzer=index.analyzer,
                        with_positions=index.with_positions)
    shift = F.col("seg") + next_seg
    return InvertedIndex(
        pruned.postings.unionByName(
            added.postings.withColumn("seg", shift.cast("int"))),
        pruned.docmeta.unionByName(
            added.docmeta.withColumn("seg", shift.cast("int"))),
        pruned.segstats.unionByName(
            added.segstats.withColumn("seg", shift.cast("int"))),
        index.with_positions, index.analyzer)
