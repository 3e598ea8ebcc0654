"""Query elevation — the editorial pin/exclude component.

``solr/core/src/java/org/apache/solr/handler/component/
QueryElevationComponent.java`` (615 LoC): a config maps query text to an
ordered list of elevated doc ids (pinned to the top in config order, even
when they don't match organically) and optional excluded ids (removed).
The reference implements this with a custom sort comparator + boost sets
(:380-430 ElevationComparatorSource); the Spark restatement is a config
join + composite sort key — elevation flag desc, elevation rank asc,
organic score desc, key asc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .indexer import InvertedIndex
from .search import search_terms

__all__ = ["elevate_query"]


def elevate_query(index: InvertedIndex, query_text: str,
                  elevated_keys: list[str],
                  excluded_keys: list[str] | None = None,
                  k: int = 10, force_elevation: bool = True,
                  precision: str = "float32") -> DataFrame:
    """Top-k with elevation semantics.

    * elevated docs rank first, in config order (rank = list position);
    * ``force_elevation=True`` includes elevated docs even when the query
      doesn't match them (score 0.0 — QueryElevationComponent injects a
      match-all-elevated clause);
    * excluded docs never appear.
    Returns (key, score, elevated).
    """
    spark = index.docmeta.sparkSession
    stype = "double" if precision == "float64" else "float"
    organic = search_terms(index, query_text, "OR", k=1 << 30,
                           precision=precision)
    elev = spark.createDataFrame(
        [(key, rank) for rank, key in enumerate(elevated_keys)],
        "key STRING, elev_rank INT")
    joined = organic.join(F.broadcast(elev), "key", "full" if force_elevation
                          else "left")
    out = joined.select(
        "key",
        F.coalesce(F.col("score"), F.lit(0.0)).cast(stype).alias("score"),
        F.col("elev_rank"),
        F.col("elev_rank").isNotNull().alias("elevated"))
    if excluded_keys:
        out = out.where(~F.col("key").isin(list(excluded_keys)))
    return (out.orderBy(F.desc("elevated"), F.asc("elev_rank"),
                        F.desc("score"), F.asc("key"))
            .limit(k)
            .select("key", "score", "elevated"))
