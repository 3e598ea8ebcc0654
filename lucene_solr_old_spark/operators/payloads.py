"""Payloads — per-position weights in the postings, and payload scoring.

Reference:

  * ``lucene/analysis/common/.../payloads/DelimitedPayloadTokenFilter.java``
    + ``FloatEncoder.java`` — the standard way payloads enter the chain:
    tokens of the form ``term|weight`` carry an encoded float payload.
  * ``lucene/core/src/java/org/apache/lucene/search/payloads/
    PayloadTermQuery.java`` + ``AveragePayloadFunction/Min/Max`` — a span
    term query whose score is (or is multiplied by) a function of the
    payloads at the matched positions.

Spark-first translation: Lucene encodes payloads as per-position byte[]
inside the postings stream; a DataFrame engine stores them as a FLOAT
ARRAY column parallel to the positions array — same information, no
byte-codec detour, and Catalyst aggregates (``aggregate``/``size``) give
the avg/min/max payload functions JVM-side.  The payload postings frame
is (key, term, freq, positions, payloads) — one shuffle to build
(groupBy doc+term), broadcast-joined at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["delimited_payload_tokens", "build_payload_postings",
           "payload_term_search"]


def delimited_payload_tokens(docs: DataFrame, key_col: str = "doc_id",
                             text_col: str = "text",
                             delimiter: str = "|") -> DataFrame:
    """(key, pos, term, payload) — DelimitedPayloadTokenFilter with the
    FloatEncoder: whitespace tokens ``term|weight`` split at the LAST
    delimiter; tokens without a delimiter carry no payload (NULL, like
    the reference's payload-less positions).  Catalyst-only."""
    toks = F.filter(F.split(F.col(text_col), " "),
                    lambda x: x != F.lit(""))
    exploded = docs.select(F.col(key_col).alias("key"),
                           F.posexplode(toks).alias("pos", "raw"))
    d = "\\" + delimiter if delimiter in r"|\^$.*+?()[]{}" else delimiter
    has = F.col("raw").rlike(f".{d}[^{d}]*$")
    term = F.when(has, F.regexp_replace("raw", f"{d}[^{d}]*$", "")) \
            .otherwise(F.col("raw"))
    payload = F.when(has, F.regexp_extract("raw", f"{d}([^{d}]*)$", 1)
                     .cast("float"))
    return exploded.select("key", "pos",
                           F.lower(term).alias("term"),
                           payload.alias("payload"))


def build_payload_postings(docs: DataFrame, key_col: str = "doc_id",
                           text_col: str = "text",
                           delimiter: str = "|") -> DataFrame:
    """(key, term, freq, positions, payloads) — payload-carrying postings
    (positions sorted; payloads parallel, NULL where the token had
    none)."""
    toks = delimited_payload_tokens(docs, key_col, text_col, delimiter)
    return (toks.groupBy("key", "term")
            .agg(F.count("*").alias("freq"),
                 F.array_sort(
                     F.collect_list(F.struct("pos", "payload"))).alias("_pp"))
            .select("key", "term", "freq",
                    F.col("_pp.pos").alias("positions"),
                    F.col("_pp.payload").alias("payloads")))


def payload_term_search(postings: DataFrame, term: str,
                        func: str = "avg", default_payload: float = 1.0,
                        k: int = 10) -> DataFrame:
    """(key, score) top-k — PayloadTermQuery with includeSpanScore=false:
    the score IS the payload function over the matched positions
    (``PayloadTermQuery.java:141-149``; avg = AveragePayloadFunction's
    payloadScore/payloadsSeen).  Payload-less positions count with
    ``default_payload`` (the reference scores 1.0 when no payload is
    present).  ``func``: avg | min | max."""
    if func not in ("avg", "min", "max"):
        raise ValueError(f"unknown payload function {func!r}")
    pl = F.transform(F.col("payloads"),
                     lambda p: F.coalesce(p, F.lit(default_payload)))
    if func == "avg":
        score = (F.aggregate(pl, F.lit(0.0),
                             lambda acc, x: acc + x)
                 / F.size("payloads"))
    elif func == "min":
        score = F.array_min(pl)
    else:
        score = F.array_max(pl)
    return (postings.where(F.col("term") == term.lower())
            .select("key", score.cast("double").alias("score"))
            .orderBy(F.desc("score"), F.asc("key"))
            .limit(k))
