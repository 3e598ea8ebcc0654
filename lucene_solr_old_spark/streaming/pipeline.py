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

__all__ = ["dedup_stream", "windowed_event_counts", "first_seen_filter"]


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
