"""Solr function-query helpers (``solr/.../search/ValueSourceParser.java``
registry).  Most value sources map 1:1 onto Catalyst expressions and need
no wrapper (``sum``, ``product``, ``log``, ``sqrt``, ``if``, ``map`` ...);
this module adds the ones with non-local semantics or a fixed reference
formula:

  * :func:`scale_column` — ``scale(x, tgtMin, tgtMax)``: min-max rescaling
    over the WHOLE corpus (``ScaleFloatFunction.java``): needs a global
    aggregate, shaped here as agg -> broadcast -> map so it stays two
    narrow jobs with no driver collect and no global sort.
  * :func:`recip` / :func:`linear` — ``recip(x,m,a,b) = a/(m*x+b)`` (the
    canonical recency boost) and ``linear(x,m,c) = m*x+c``
    (``ReciprocalFloatFunction.java``, ``LinearFloatFunction.java``) as
    Column helpers.

``ord``/``rord`` (global sort ordinals) are deliberately absent: a global
rank is a total sort at 100 TB; the reference's own Javadoc steers users
to field values instead, and every ord use case here is served by
``scale_column`` or a window inside an explicit partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["scale_column", "recip", "linear"]


def scale_column(docs: DataFrame, col: str, tgt_min: float = 0.0,
                 tgt_max: float = 1.0, out_col: str | None = None,
                 ndigits: int | None = None) -> DataFrame:
    """Append ``out_col`` (default ``<col>_scaled``) =
    ``(x - min) / (max - min) * (tgt_max - tgt_min) + tgt_min`` with the
    min/max taken over ALL rows (``ScaleFloatFunction.createWeight``
    computes them once per searcher; here: one map-side-combinable global
    aggregate broadcast back onto the scan).  A constant column (min ==
    max) scales to ``tgt_min``, matching the reference's 0/0 guard."""
    out = out_col or f"{col}_scaled"
    bounds = docs.agg(F.min(col).cast("double").alias("_mn"),
                      F.max(col).cast("double").alias("_mx"))
    span = F.col("_mx") - F.col("_mn")
    scaled = F.when(
        span > 0,
        (F.col(col).cast("double") - F.col("_mn")) / span
        * F.lit(float(tgt_max - tgt_min)) + F.lit(float(tgt_min))) \
        .otherwise(F.lit(float(tgt_min)))
    if ndigits is not None:
        scaled = F.round(scaled, ndigits)
    return (docs.crossJoin(F.broadcast(bounds))
            .withColumn(out, scaled)
            .drop("_mn", "_mx"))


def recip(x: Column, m: float, a: float, b: float) -> Column:
    """``recip(x,m,a,b) = a / (m*x + b)`` — monotonic-decreasing boost
    (``ReciprocalFloatFunction.java``); with x = doc age this is Solr's
    standard recency boost."""
    return F.lit(float(a)) / (F.lit(float(m)) * x.cast("double")
                              + F.lit(float(b)))


def linear(x: Column, m: float, c: float) -> Column:
    """``linear(x,m,c) = m*x + c`` (``LinearFloatFunction.java``)."""
    return F.lit(float(m)) * x.cast("double") + F.lit(float(c))
