"""Multi-field indexing + fielded queries.

Lucene documents carry many indexed fields, each with its own analyzer,
postings, norms and collection stats (``document/Document.java``,
``index/FieldInfos.java``); queries address fields as ``field:term`` with
per-field idf/avgdl (the classic QueryParser's fielded-term syntax,
``queryparser/classic/QueryParserBase.java``).

Spark shape: one InvertedIndex per field over the same key space (per-field
stats fall out for free — each field's segstats is its own), wrapped by
MultiFieldIndex; a fielded disjunction is the float sum of per-field BM25
frames grouped by doc key.  Cross-field scoring matches Lucene: each
(field, term) clause scores against ITS field's stats.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from .indexer import InvertedIndex, build_index
from .search import term_score_frame
from ..functions.tokenizer import get_analyzer

__all__ = ["MultiFieldIndex", "build_multifield_index", "search_fielded",
           "search_edismax"]


class MultiFieldIndex:
    def __init__(self, indexes: dict[str, InvertedIndex],
                 default_field: str):
        if default_field not in indexes:
            raise ValueError(f"default field {default_field!r} not indexed")
        self.indexes = indexes
        self.default_field = default_field

    def field(self, name: str) -> InvertedIndex:
        return self.indexes[name]


def build_multifield_index(
    docs: DataFrame,
    key_col: str,
    fields: dict[str, str],          # field name -> text column
    default_field: str,
    num_segments: int = 8,
    analyzers: dict[str, str] | None = None,
) -> MultiFieldIndex:
    analyzers = analyzers or {}
    indexes = {}
    for fname, col in fields.items():
        indexes[fname] = build_index(
            docs, key_col=key_col, text_col=col,
            num_segments=num_segments,
            analyzer=analyzers.get(fname, "english"))
    return MultiFieldIndex(indexes, default_field)


_FIELDED = re.compile(r"(?:([A-Za-z_][A-Za-z0-9_]*):)?(\S+)")


def parse_fielded(query: str, default_field: str) -> list[tuple[str, str]]:
    """'title:foo bar' -> [(title, foo), (default, bar)]."""
    out = []
    for m in _FIELDED.finditer(query):
        out.append((m.group(1) or default_field, m.group(2)))
    return out


def search_fielded(mfi: MultiFieldIndex, query: str, k: int = 10,
                   precision: str = "float32") -> DataFrame:
    """Cross-field disjunction: per-(field, term) BM25 against that field's
    stats, float-summed per doc key; top-k (key, score)."""
    clauses = parse_fielded(query, mfi.default_field)
    by_field: dict[str, list[str]] = {}
    for fname, raw in clauses:
        idx = mfi.indexes.get(fname)
        if idx is None:
            continue
        for t in get_analyzer(idx.analyzer)(raw):
            by_field.setdefault(fname, []).append(t.term)

    frames = []
    for fname, terms in by_field.items():
        idx = mfi.indexes[fname]
        scored, _ = term_score_frame(idx, terms, precision=precision)
        per_doc = scored.groupBy("seg", "docid").agg(
            F.sum("score").alias("score"))
        keyed = (per_doc.join(idx.docmeta.select("seg", "docid", "key"),
                              ["seg", "docid"])
                 .select("key", "score"))
        frames.append(keyed)
    if not frames:
        any_idx = mfi.indexes[mfi.default_field]
        return any_idx.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    stype = "double" if precision == "float64" else "float"
    return (union.groupBy("key")
            .agg(F.sum("score").cast(stype).alias("score"))
            .orderBy(F.desc("score"), F.asc("key"))
            .limit(k))


def search_edismax(mfi: MultiFieldIndex, query_text: str,
                   qf: dict[str, float], tie: float = 0.0,
                   mm: int = 0, k: int = 10,
                   precision: str = "float32") -> DataFrame:
    """ExtendedDisMax (``solr/core/src/java/org/apache/solr/search/
    ExtendedDismaxQParser.java``): each whitespace word of the user query
    becomes a DisjunctionMaxQuery across the ``qf`` fields (per-field
    analysis, per-field stats, per-field boost), clause score =
    max_field + tie * (sum - max); the clause dismaxes are summed, and
    ``mm`` (minimum-should-match) requires that many clauses to hit.

    Plan: per (clause, field) score frames keyed by doc key, ONE union ->
    groupBy(key, clause) computes the dismax -> groupBy(key) sums + counts
    matched clauses.  Cross-field alignment happens on the shared doc key
    (fields are sibling indexes over the same corpus).
    """
    stype = "double" if precision == "float64" else "float"
    words = [w for w in query_text.split() if w]
    frames = []
    for ci, word in enumerate(words):
        for fname, boost in qf.items():
            idx = mfi.indexes.get(fname)
            if idx is None:
                continue
            terms = [t.term for t in get_analyzer(idx.analyzer)(word)]
            if not terms:
                continue
            scored, _ = term_score_frame(idx, terms, boost=boost,
                                         precision=precision)
            per_doc = scored.groupBy("seg", "docid").agg(
                F.sum("score").alias("fscore"))
            keyed = (per_doc.join(idx.docmeta.select("seg", "docid", "key"),
                                  ["seg", "docid"])
                     .select("key", F.lit(ci).alias("clause"), "fscore"))
            frames.append(keyed)
    if not frames:
        any_idx = mfi.indexes[mfi.default_field]
        return any_idx.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    per_clause = union.groupBy("key", "clause").agg(
        (F.max("fscore")
         + F.lit(tie).cast(stype) * (F.sum("fscore") - F.max("fscore")))
        .alias("cscore"))
    agg = per_clause.groupBy("key").agg(
        F.sum("cscore").cast(stype).alias("score"),
        F.count("*").alias("nmatched"))
    if mm > 0:
        agg = agg.where(F.col("nmatched") >= mm)
    return (agg.select("key", "score")
            .orderBy(F.desc("score"), F.asc("key"))
            .limit(k))
