"""Index build: documents DataFrame -> segmented inverted index DataFrames.

Spark-first restatement of the reference build pipeline (SURVEY.md §3.1):

  * partition == DocumentsWriterPerThread: hash ``repartition(n, key)`` +
    ``sortWithinPartitions(key)`` gives deterministic segment membership and
    a deterministic segment-local docID (= rank of key within segment) under
    ANY parallelism — the engine's substitute for Lucene's insertion-order
    docIDs (``index/DocumentsWriterPerThread.java``);
  * analysis + local inversion run inside ``mapInPandas`` with no shuffle;
  * the ONE shuffle of the build is ``groupBy(seg, term)`` building
    docID-sorted posting lists (``FreqProxTermsWriterPerField.java:100-239``'s
    in-memory postings, re-expressed as a Spark aggregation);
  * optional salted two-phase aggregation splits head terms into
    ``docid % salt`` sub-keys and re-merges — build-time skew handling for
    Zipf head terms (north_rule; the CommonTermsQuery high-df split idea at
    build time, ``queries/CommonTermsQuery.java``);
  * per-segment stats (maxDoc, sumTotalTermFreq) == the term dict's
    FieldSummary (``codecs/BlockTreeTermsWriter.java:113-117``).

Posting lists embed each doc's norm byte so query-time scoring needs no
docmeta join (Lucene reads norms from a per-segment column during scoring;
we inline them — same data, join-free plan).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .analysis import (TERMDOC_SCHEMA, TERMDOC_SCHEMA_OFFSETS,
                       make_analyze_partition)

__all__ = ["InvertedIndex", "build_index", "load_index"]


@dataclass
class InvertedIndex:
    """postings(seg, term, df, ttf, postings: array<struct<docid,freq,norm[,positions]>>)
    docmeta(seg, docid, key, doclen, norm)
    segstats(seg, max_doc, sum_ttf)
    """

    postings: DataFrame
    docmeta: DataFrame
    segstats: DataFrame
    with_positions: bool = True
    analyzer: str = "english"
    with_offsets: bool = False
    _stats: tuple | None = field(default=None, repr=False)
    _terms_dict: DataFrame | None = field(default=None, repr=False)

    def collection_stats(self) -> tuple[int, int]:
        """(maxDoc, sumTotalTermFreq) over the whole index — global exact
        stats (unlike per-shard Solr idf; SURVEY.md §3.3)."""
        if self._stats is None:
            row = self.segstats.agg(
                F.sum("max_doc").alias("md"), F.sum("sum_ttf").alias("st")
            ).collect()[0]
            self._stats = (int(row["md"] or 0), int(row["st"] or 0))
        return self._stats

    def terms_dict(self) -> DataFrame:
        """(term, df, ttf) — the materialized GLOBAL term dictionary.

        The reference precomputes its term dictionary at index time and
        queries SEEK it (``codecs/BlockTreeTermsWriter.java:177-187``); this
        is the Spark analogue: computed ONCE per index (the single
        (seg,term)->term aggregation), persisted, and PROBED by every
        multi-term expansion (fuzzy/wildcard/regexp/prefix/surround-trunc,
        spellcheck, suggesters, MLT).  Without it each wildcard clause
        re-aggregates the postings table — a full (seg,term) scan+shuffle
        per clause at 100-TB scale.  ``save()`` writes it term-range-
        partitioned so prefix/range probes prune parquet files via min/max
        stats; ``load_index`` reads the stored table, so query plans over a
        loaded index contain a plain parquet scan, no aggregate."""
        if self._terms_dict is None:
            self._terms_dict = (
                self.postings.groupBy("term")
                .agg(F.sum("df").cast("long").alias("df"),
                     F.sum("ttf").cast("long").alias("ttf"))
                .persist())
        return self._terms_dict

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """Global (df, ttf) per term — the TermStatistics lookup
        (``search/TermStatistics.java``); small driver-side collect, exactly
        like Lucene's term-dictionary seek before scoring.  Probes the
        materialized :meth:`terms_dict` when one exists (loaded or already
        built); otherwise a term-pruned aggregate over postings — cheaper
        than building the whole dictionary for a handful of terms."""
        if not terms:
            return {}
        if not hasattr(self, "_term_cache"):
            self._term_cache: dict[str, tuple[int, int]] = {}
        missing = [t for t in set(terms) if t not in self._term_cache]
        if missing:
            if self._terms_dict is not None:
                rows = (self._terms_dict
                        .where(F.col("term").isin(missing)).collect())
                found = {r["term"]: (int(r["df"]), int(r["ttf"]))
                         for r in rows}
            else:
                # per-seg rows summed driver-side: <= |segments| x |terms|
                # tiny rows, ONE stage (no shuffle, no AQE round) — vs the
                # groupBy form this halves the per-query "term dict seek"
                # job's latency; exact same integer sums
                rows = (
                    self.postings.where(F.col("term").isin(missing))
                    .select("term", "df", "ttf").collect()
                )
                found = {}
                for r in rows:
                    df0, ttf0 = found.get(r["term"], (0, 0))
                    found[r["term"]] = (df0 + int(r["df"]),
                                        ttf0 + int(r["ttf"]))
            for t in missing:
                self._term_cache[t] = found.get(t, (0, 0))
        return {t: self._term_cache[t] for t in set(terms)}

    def persist(self) -> "InvertedIndex":
        self.postings = self.postings.persist()
        self.docmeta = self.docmeta.persist()
        self.segstats = self.segstats.persist()
        return self

    def _write_terms_dict(self, path: str, mode: str) -> None:
        """Build-time term dictionary (BlockTreeTermsWriter analogue):
        few term-SORTED files so a prefix/range probe skips row groups
        whose min/max don't straddle it.  Derived from the parquet JUST
        WRITTEN, not the in-memory lineage: a column-pruned scan of the
        stored postings reads only term/df/ttf (a few MB), where the
        lineage re-reads the whole multi-GB analyzed cache — or, when
        the build is unpersisted, re-runs the entire fused analysis
        again.  Always equivalent by construction (stored postings ==
        the rows terms_dict() would aggregate), incl. delete-masked
        indexes.  Mirrors the reference, which writes its term dict
        from the flushed segment data
        (codecs/BlockTreeTermsWriter.java:177-187).  On append
        (incremental segments) the stored dict goes stale — the append
        paths (save(mode="append"), streaming flush_index_batch) DELETE
        it, so readers fall back to the lazily-aggregated dictionary."""
        spark = self.postings.sparkSession
        stored_postings = spark.read.parquet(os.path.join(path, "postings"))
        (stored_postings.groupBy("term")
         .agg(F.sum("df").cast("long").alias("df"),
              F.sum("ttf").cast("long").alias("ttf"))
         .coalesce(4)
         .sortWithinPartitions("term")
         .write.mode(mode).parquet(os.path.join(path, "terms_dict")))
        # the live object now probes the stored sorted dict too, exactly
        # like an index opened by load_index
        self._terms_dict = spark.read.parquet(
            os.path.join(path, "terms_dict"))

    def save(self, path: str, mode: str = "overwrite",
             layout: str = "segdir") -> None:
        """Persist the index.

        ``layout="segdir"`` (default): postings/docmeta partitioned by
        seg into ``seg=N`` directories (the Iceberg-style 'segment =
        partition' model, SURVEY.md §1.1) — one-plus file per segment.
        This is the layout incremental appends require (dynamic
        partition overwrite replaces exactly the seg= dirs a batch owns,
        streaming/incremental.py:56).

        ``layout="packed"``: bulk-ingest layout — range-partitioned by
        (seg, term) and sorted within files, so file count tracks WRITE
        PARALLELISM instead of segment count and per-seg reads prune on
        parquet row-group min/max of the plain ``seg`` column.  Writing
        one-plus file per segment serializes on per-file create/flush
        latency — on one shared disk that is a constant term that caps
        measured build scaling (BASELINE.md r5 decomposition); a range
        file layout keeps the sink embarrassingly parallel while giant
        segments split across files instead of forcing one huge file.
        Do NOT mix layouts in one directory (Spark cannot read
        partition-dir and plain files together): packed indexes are for
        write-once bulk ingest (``route="none"``), segdir for indexes
        that take incremental appends.
        """
        import json

        if layout not in ("segdir", "packed"):
            raise ValueError("layout must be 'segdir' or 'packed'")
        if layout == "packed" and mode != "overwrite":
            # packed is write-once bulk ingest: an append would lay plain
            # coalesced files next to existing ones (duplicating postings
            # rows) and skip the terms_dict refresh — mirror the
            # _require_segdir_layout guard on the streaming side
            raise ValueError(
                "layout='packed' is write-once (bulk ingest); use "
                "mode='overwrite', or the default segdir layout for "
                "indexes that take appends")
        if layout == "packed":
            # coalesce, NOT repartition/repartitionByRange: range
            # partitioning runs a SAMPLING pass that re-evaluates the
            # whole postings aggregation (+10s on the 1.2M bulk
            # protocol), and a hash repartition adds what would be the
            # ONLY exchange in the zero-shuffle route="none" fused build.
            # coalesce merges existing partitions map-side — the sink
            # stays embarrassingly parallel and data moves zero times.
            # Term-addressed probes go through terms_dict (below), which
            # IS term-sorted; packed postings trade the segdir layout's
            # per-seg file pruning for a parallel sink, which is the
            # right trade for write-once bulk ingest.
            # 2x slots per core: halves each writer's buffer footprint
            # and lets the scheduler rebalance around straggler
            # partitions and GC pauses; file count still tracks write
            # parallelism, not segment count.
            par = 2 * max(1, self.postings.sparkSession
                          .sparkContext.defaultParallelism)
            # Wave 1: the postings write ALONE.  It is the one heavy
            # pass, and running it first materializes the build cache as
            # a side effect — launching the sibling writes concurrently
            # with it would race the lazy cache population and duplicate
            # the fused-analysis work (concurrent tasks that miss a
            # still-computing cached partition recompute it).
            (self.postings.coalesce(par)
             .write.mode(mode).parquet(os.path.join(path, "postings")))
            # Wave 2: the remaining tables are independent warm-cache /
            # stored-parquet scans — overlap their jobs on driver
            # threads so none of them serializes behind another's
            # stragglers (the same overlap a multi-sink cluster job
            # gets for free).
            from concurrent.futures import ThreadPoolExecutor

            def _w_docmeta():
                (self.docmeta.coalesce(par)
                 .write.mode(mode).parquet(os.path.join(path, "docmeta")))

            def _w_segstats():
                self.segstats.write.mode(mode).parquet(
                    os.path.join(path, "segstats"))

            def _w_terms():
                if mode != "overwrite":
                    return
                self._write_terms_dict(path, mode)

            with ThreadPoolExecutor(max_workers=3) as ex:
                futs = [ex.submit(f)
                        for f in (_w_docmeta, _w_segstats, _w_terms)]
                for fu in futs:
                    fu.result()
        else:
            self.postings.write.mode(mode).partitionBy("seg").parquet(
                os.path.join(path, "postings"))
            self.docmeta.write.mode(mode).partitionBy("seg").parquet(
                os.path.join(path, "docmeta"))
            # segstats comes from self.segstats in BOTH layouts (NOT
            # re-derived from the stored docmeta): keep_stats=True
            # delete-masked indexes carry intentionally-stale stats
            # (Lucene's deleted-doc over-counting, merge.py:249) that a
            # fresh aggregation would erase.
            self.segstats.write.mode(mode).parquet(
                os.path.join(path, "segstats"))
            if mode == "overwrite":
                self._write_terms_dict(path, mode)
            else:
                # an append invalidates the stored dictionary (its rows no
                # longer cover the new segments' terms); drop it so
                # load_index falls back to the lazily-aggregated dict
                # instead of silently losing new terms from expansions
                _drop_stored_terms_dict(path)
                self._terms_dict = None
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "index_meta.json"), "w") as f:
            json.dump({"analyzer": self.analyzer,
                       "with_positions": self.with_positions,
                       "layout": layout,
                       "compressed": "blocks" in self.postings.columns}, f)


def _drop_stored_terms_dict(path: str) -> None:
    """Remove a stored terms_dict that an append has made stale (local
    filesystem, matching index_meta.json's existing locality assumption)."""
    import shutil

    td = os.path.join(path, "terms_dict")
    if os.path.isdir(td):
        shutil.rmtree(td, ignore_errors=True)


def load_index(spark: SparkSession, path: str) -> InvertedIndex:
    import json

    meta_path = os.path.join(path, "index_meta.json")
    meta = {"analyzer": "english", "with_positions": True}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    idx = InvertedIndex(
        postings=spark.read.parquet(os.path.join(path, "postings")),
        docmeta=spark.read.parquet(os.path.join(path, "docmeta")),
        segstats=spark.read.parquet(os.path.join(path, "segstats")),
        with_positions=meta["with_positions"],
        analyzer=meta["analyzer"],
    )
    td_path = os.path.join(path, "terms_dict")
    if os.path.isdir(td_path):
        # stored term dictionary: expansions become parquet scans with
        # min/max file pruning — no per-query postings aggregation.
        idx._terms_dict = spark.read.parquet(td_path)
    return idx


def _posting_struct(with_positions: bool, with_offsets: bool = False):
    cols = [F.col("docid"), F.col("freq"), F.col("norm")]
    if with_positions:
        cols.append(F.col("positions"))
    if with_offsets:
        cols.append(F.col("starts"))
        cols.append(F.col("ends"))
    return F.struct(*cols)


def build_index(
    docs: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    num_segments: int = 8,
    with_positions: bool = True,
    salt_partitions: int = 0,
    html_col: str | None = None,
    analyzer: str = "english",
    persist_termdoc: bool = True,
    with_offsets: bool = False,
    fused: bool | None = None,
    route: str = "hash",
) -> InvertedIndex:
    """Build the inverted index.

    Plan shape, DEFAULT (``fused=True``) — ONE shuffle total:
      1. hash-repartition by doc key (deterministic for a fixed
         ``num_segments`` under any input parallelism — the murmur3 doc
         routing analogue) + sortWithinPartitions(key): segment membership
         and segment-local docID (= key rank) are reproducible;
      2. ONE fused Arrow stage per partition: [html->text] -> analyze ->
         FULL in-memory inversion -> finished docID-sorted posting lists +
         docmeta sentinel rows (analysis.make_fused_postings_partition).
         A (seg, term) posting list is complete partition-locally because
         the whole segment IS the partition, so the term-grouping shuffle
         of the unfused plan is pure waste — this is the
         DocumentsWriterPerThread RAM inversion, and it makes build
         data movement exactly one exchange at any scale.

    ``fused=False`` (or with_offsets=True, which the fused stage doesn't
    carry yet) falls back to the two-shuffle plan: analyze -> term-doc
    rows -> groupBy(seg, term) aggregation, with ``salt_partitions > 0``
    enabling two-phase salted aggregation for head-term skew.  Use it when
    one segment's postings exceed Python-worker memory (the fused bound;
    Lucene bounds the same structure with its flush policy).

    ``route`` picks the doc->segment assignment:
      * ``"hash"`` (default) — one repartition by doc key: segment
        membership and docids are DETERMINISTIC under any input
        parallelism (the murmur3 doc-routing analogue; required for
        reproducible builds and key-addressed upserts).
      * ``"none"`` — ZERO-shuffle bulk ingest: segment = input partition,
        docid = arrival order within it — exactly Lucene's
        DocumentsWriterPerThread assignment (insertion-order docids, no
        routing at all; ``index/DocumentsWriterFlushControl``).  Query
        results are IDENTICAL to any other segmentation (global stats);
        only the internal seg/docid labels differ, so use it when
        reproducible labels don't matter — with ``fused``, the whole
        build then moves data zero times before the segment write.
    """
    if fused is None:
        fused = not with_offsets
    if route not in ("hash", "none"):
        raise ValueError("route must be 'hash' or 'none'")
    if html_col is not None:
        base = docs.select(F.col(key_col).alias("key"),
                           F.col(html_col).alias("text"))
        html_input = True
    else:
        base = docs.select(F.col(key_col).alias("key"),
                           F.col(text_col).alias("text"))
        html_input = False

    if route == "none":
        parted = base.withColumn("seg", F.spark_partition_id())
    else:
        parted = (
            base.repartition(num_segments, "key")
            .sortWithinPartitions("key")
            .withColumn("seg", F.spark_partition_id())
        )

    if fused and not with_offsets:
        from .analysis import FUSED_SCHEMA, make_fused_postings_partition

        out = parted.mapInPandas(
            make_fused_postings_partition(
                "key", "text", with_positions=with_positions,
                analyzer=analyzer, html_input=html_input),
            schema=FUSED_SCHEMA,
        )
        if persist_termdoc:
            out = out.persist()
        # reassemble struct arrays JVM-side from the parallel primitive
        # arrays (arrays_zip names struct fields after the aliases)
        zip_cols = [F.col("docids").alias("docid"),
                    F.col("freqs").alias("freq"),
                    F.col("norms").alias("norm")]
        if with_positions:
            zip_cols.append(F.col("poss").alias("positions"))
        postings = out.where(F.col("term").isNotNull()).select(
            "seg", "term", "df", "ttf",
            F.arrays_zip(*zip_cols).alias("postings"))
        docmeta = out.where(F.col("term").isNull()).select(
            "seg", "docid", "key", "doclen", "norm")
        segstats = docmeta.groupBy("seg").agg(
            F.count("*").alias("max_doc"),
            F.sum("doclen").alias("sum_ttf"),
        )
        return InvertedIndex(postings, docmeta, segstats, with_positions,
                             analyzer, False)
    # with_offsets stores per-occurrence char offsets in the postings
    # (IndexOptions ..._AND_OFFSETS — the PostingsHighlighter input); note
    # the merge/delete paths strip offsets (positions-only rebuild).
    termdoc = parted.mapInPandas(
        make_analyze_partition("key", "text", with_positions=with_positions,
                               analyzer=analyzer, html_input=html_input,
                               with_offsets=with_offsets),
        schema=TERMDOC_SCHEMA_OFFSETS if with_offsets else TERMDOC_SCHEMA,
    )
    if persist_termdoc:
        # avoids re-analyzing for the docmeta/segstats actions, at the cost
        # of pushing the analyzed stream through the block store (disk at
        # scale) — for one-shot build+save jobs recompute is often cheaper
        termdoc = termdoc.persist()

    # partition-local distinct: all rows of a doc are in one partition and
    # docid-ordered; carry the last docid across Arrow batches.
    def _dedup_meta(batches):
        import pandas as pd
        last = None
        for pdf in batches:
            sub = pdf[["seg", "docid", "key", "doclen", "norm"]]
            sub = sub[sub["docid"] != sub["docid"].shift(1)]
            if last is not None and len(sub) and sub["docid"].iloc[0] == last:
                sub = sub.iloc[1:]
            if len(sub):
                last = int(sub["docid"].iloc[-1])
                yield sub

    docmeta = termdoc.mapInPandas(
        _dedup_meta,
        schema="seg INT, docid INT, key STRING, doclen INT, norm INT")
    # token-less docs carry a NULL-term sentinel row (analysis.py) so they
    # keep a dense docID and count in maxDoc; drop sentinels from postings.
    termdoc = (termdoc.where(F.col("term").isNotNull())
               .drop("key", "doclen"))

    pstruct = _posting_struct(with_positions, with_offsets)
    if salt_partitions and salt_partitions > 1:
        # phase 1: partial sorted lists per (seg, term, docid % salt)
        partial = (
            termdoc.groupBy("seg", "term",
                            F.pmod(F.col("docid"), F.lit(salt_partitions)).alias("_salt"))
            .agg(
                F.count("*").alias("pdf"),
                F.sum("freq").alias("pttf"),
                F.sort_array(F.collect_list(pstruct)).alias("plist"),
            )
        )
        # phase 2: merge partials (salt classes interleave -> re-sort by docid)
        postings = (
            partial.groupBy("seg", "term")
            .agg(
                F.sum("pdf").cast("int").alias("df"),
                F.sum("pttf").cast("long").alias("ttf"),
                F.array_sort(F.flatten(F.collect_list("plist"))).alias("postings"),
            )
        )
    else:
        postings = (
            termdoc.groupBy("seg", "term")
            .agg(
                F.count("*").cast("int").alias("df"),
                F.sum("freq").cast("long").alias("ttf"),
                F.sort_array(F.collect_list(pstruct)).alias("postings"),
            )
        )

    segstats = docmeta.groupBy("seg").agg(
        F.count("*").alias("max_doc"),
        F.sum("doclen").alias("sum_ttf"),
    )
    return InvertedIndex(postings, docmeta, segstats, with_positions,
                         analyzer, with_offsets)


def compress_index(index: InvertedIndex) -> InvertedIndex:
    """Encode posting arrays into varbyte blocks with skip/max-impact
    metadata (codec.py) — the persistent, query-kernel-ready layout.

    The heavy lifting stays columnar: posting structs are converted to
    parallel primitive arrays with Catalyst `transform`/`flatten` (Arrow
    hands the UDF NumPy arrays, not dicts), then a mapInPandas stage runs
    the vectorized encoder.  No shuffle — encoding is partition-local.
    """
    import pandas as pd

    from .codec import BLOCKS_SCHEMA, encode_blocks

    p = index.postings
    wp = index.with_positions
    cols = [
        F.col("seg"), F.col("term"), F.col("df"), F.col("ttf"),
        F.transform("postings", lambda x: x["docid"]).alias("docids"),
        F.transform("postings", lambda x: x["freq"]).alias("freqs"),
        F.transform("postings", lambda x: x["norm"]).alias("norms"),
    ]
    if wp:
        cols.append(F.flatten(
            F.transform("postings", lambda x: x["positions"])).alias("posflat"))
    arrays = p.select(*cols)

    out_schema = (f"seg INT, term STRING, df INT, ttf LONG, "
                  f"blocks {BLOCKS_SCHEMA}")

    def encode_rows(batches):
        for pdf in batches:
            blocks_col = []
            for i in range(len(pdf)):
                pos = pdf["posflat"].iloc[i] if wp else None
                blocks_col.append(encode_blocks(
                    pdf["docids"].iloc[i], pdf["freqs"].iloc[i],
                    pdf["norms"].iloc[i], pos))
            yield pd.DataFrame({
                "seg": pdf["seg"], "term": pdf["term"],
                "df": pdf["df"], "ttf": pdf["ttf"],
                "blocks": blocks_col,
            })

    compressed = arrays.mapInPandas(encode_rows, schema=out_schema)
    out = InvertedIndex(compressed, index.docmeta, index.segstats,
                        index.with_positions, index.analyzer)
    # (seg,term,df,ttf) and docmeta/segstats are unchanged by encoding —
    # carry the dictionary AND the already-collected stat caches, so the
    # first query on the compressed index doesn't re-run the collection
    # stats / term-stats seek jobs the source index already paid for
    out._terms_dict = index._terms_dict
    out._stats = index._stats
    if hasattr(index, "_term_cache"):
        out._term_cache = index._term_cache
    return out
