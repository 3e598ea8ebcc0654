"""Streaming training-data pipeline operators.

The reference has no event-time streaming (SURVEY.md §2.9 — honest N/A);
these are the Structured-Streaming operators a web-scale ingest pipeline
needs IN FRONT of the indexer, built on the engine's dedup primitives:

  * :func:`dedup_stream` — exact dedup of a document stream with an
    event-time watermark: ``withWatermark`` bounds the dedup state (late
    arrivals beyond the watermark may re-emit — the documented tradeoff
    of bounded state at 10^12-doc scale), ``dropDuplicates`` on the
    normalized text hash keys the state store.
  * :func:`windowed_event_counts` — tumbling event-time windows + late
    data handling via watermark (the ingest-monitoring aggregation).
  * :func:`first_seen_filter` — ``applyInPandasWithState`` custom
    stateful operator: emits only the FIRST occurrence of each content
    hash, carrying seen-ness in the state store (exact streaming dedup
    when completeness matters more than bounded state; pair with a state
    TTL via timeouts in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dedup_stream", "windowed_event_counts", "first_seen_filter",
           "near_dedup_stream"]


def dedup_stream(stream_df: DataFrame, ts_col: str = "warc_ts",
                 text_col: str = "text",
                 watermark: str = "1 hour") -> DataFrame:
    """Watermarked exact dedup: one state-store entry per distinct
    (text_hash) inside the watermark horizon."""
    hashed = stream_df.withColumn(
        "text_hash", F.md5(F.lower(F.col(text_col))))
    return (hashed.withWatermark(ts_col, watermark)
            .dropDuplicates(["text_hash"]))


def windowed_event_counts(stream_df: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window counts with late-data tolerance — the standard
    watermark + window aggregation over the ingest stream."""
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col(key_col))
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("window_start"),
                    key_col, "cnt"))


def first_seen_filter(stream_df: DataFrame, key_col: str = "url",
                      text_col: str = "text") -> DataFrame:
    """Custom stateful operator: keep only the first occurrence of each
    content hash across ALL micro-batches (applyInPandasWithState; state
    = one boolean per hash)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream_df.select(
        F.md5(F.lower(F.col(text_col))).alias("text_hash"),
        F.col(key_col).alias("key"), F.col(text_col).alias("text"))

    def emit_first(key, pdfs, state):
        import pandas as pd
        if state.exists:
            # hash already emitted in an earlier batch: drop everything
            for _ in pdfs:
                pass
            yield pd.DataFrame({"text_hash": [], "key": [], "text": []})
            return
        first_row = None
        for pdf in pdfs:
            if len(pdf) and first_row is None:
                first_row = pdf.iloc[:1]
        state.update((1,))
        if first_row is not None:
            yield first_row[["text_hash", "key", "text"]]

    return (hashed.groupBy("text_hash")
            .applyInPandasWithState(
                emit_first,
                outputStructType="text_hash STRING, key STRING, text STRING",
                stateStructType="seen INT",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def near_dedup_stream(stream_df: DataFrame, key_col: str = "url",
                      text_col: str = "text", n_hashes: int = 8,
                      rows_per_band: int = 2,
                      shingle_n: int = 3) -> DataFrame:
    """Streaming NEAR-dup suppression: per-document MinHash signatures
    (computed row-local in an Arrow batch — no shuffle), banded into LSH
    buckets, then an ``applyInPandasWithState`` operator keyed by
    (band, bucket) that lets only each bucket's FIRST document through.
    A document survives only if it is first in EVERY one of its buckets
    within the micro-batch output (`n_buckets == n_first`), i.e. no
    earlier doc — in this or any previous batch — shared any band with
    it.

    This is the streaming face of the batch ``dedup.lsh_candidate_pairs``
    pipeline: same md5-seeded shingle sketch, so a stream and a backfill
    agree on signatures.  State = one entry per distinct bucket (pair
    with state TTL timeouts in production to bound it).

    Returns bucket-first events (key, band, bucket, first): a doc is
    NOVEL iff it owns the first event of every one of its buckets --
    aggregate downstream (a second stateful aggregation cannot ride the
    same streaming query), e.g. in foreachBatch:
    events.groupBy("key").count() == n_bands.
    """
    import hashlib

    from pyspark.sql.streaming.state import GroupStateTimeout

    n_bands = n_hashes // rows_per_band

    def sig_rows(batches):
        import pandas as pd
        for pdf in batches:
            keys, bands, buckets = [], [], []
            for key, text in zip(pdf["key"], pdf["text"]):
                toks = [t for t in (text or "").lower().split(" ") if t]
                shingles = {" ".join(toks[i:i + shingle_n])
                            for i in range(len(toks) - shingle_n + 1)}
                if not shingles:
                    shingles = {""}
                sig = [min(hashlib.md5(f"{h}:{s}".encode()).hexdigest()
                           for s in shingles)
                       for h in range(n_hashes)]
                for b in range(n_bands):
                    band_sig = "|".join(
                        sig[b * rows_per_band:(b + 1) * rows_per_band])
                    keys.append(key)
                    bands.append(b)
                    buckets.append(hashlib.md5(
                        f"{b}:{band_sig}".encode()).hexdigest())
            yield pd.DataFrame({"key": keys, "band": bands,
                                "bucket": buckets})

    banded = (stream_df
              .select(F.col(key_col).alias("key"),
                      F.col(text_col).alias("text"))
              .mapInPandas(sig_rows,
                           schema="key STRING, band INT, bucket STRING"))

    def first_in_bucket(bucket_key, pdfs, state):
        import pandas as pd
        rows = [pdf for pdf in pdfs if len(pdf)]
        if state.exists:
            yield pd.DataFrame({"key": [], "band": [],
                                "bucket": [], "first": []})
            return
        state.update((1,))
        if rows:
            # Winner must be deterministic and consistent ACROSS bands:
            # applyInPandasWithState delivers a group's rows in
            # shuffle-arrival order, so "first chunk, first row" could pick
            # a different document in different band groups of the same
            # micro-batch, splitting a novel doc's bucket-first wins and
            # suppressing every copy.  Sorting by key makes the min-key doc
            # win every band it occupies.
            allrows = pd.concat(rows, ignore_index=True)
            head = (allrows.sort_values("key", kind="mergesort")
                    .iloc[:1].copy())
            head["first"] = True
            yield head[["key", "band", "bucket", "first"]]

    firsts = (banded.groupBy("bucket")
              .applyInPandasWithState(
                  first_in_bucket,
                  outputStructType=("key STRING, band INT, bucket STRING, "
                                    "first BOOLEAN"),
                  stateStructType="seen INT",
                  outputMode="append",
                  timeoutConf=GroupStateTimeout.NoTimeout))
    return firsts
