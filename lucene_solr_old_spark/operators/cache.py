"""Solr filterCache analogue.

``solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java:120-149``
keeps an LRU cache of fq -> DocSet so repeated filter queries skip
re-execution; Spark's equivalent of a cached DocSet is a persisted
``matching_docs`` frame (MEMORY_AND_DISK bitset-of-keys).  The cache is
keyed by (index identity, normalized filter), bounded, and unpersists on
LRU eviction so executor storage is reclaimed.

At scale this is the same win as in Solr: faceting dashboards re-issue the
same fq frames constantly; a persisted doc-set frame turns every repeat
into an InMemoryRelation scan (no postings join, no shuffle).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

from .facets import matching_docs
from .indexer import InvertedIndex

__all__ = ["FilterCache"]


class FilterCache:
    """LRU of persisted filter-query doc sets (key frames)."""

    def __init__(self, max_size: int = 64):
        if max_size < 1:
            raise ValueError("max_size must be >= 1")
        self.max_size = max_size
        self._entries: OrderedDict[tuple, DataFrame] = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _key(index: InvertedIndex, terms: list[str], mode: str) -> tuple:
        return (id(index), tuple(sorted(set(terms))), mode.upper())

    def get(self, index: InvertedIndex, terms: list[str],
            mode: str = "OR") -> DataFrame:
        """Doc-set frame (key) for the filter; persisted + reused across
        identical calls, LRU-evicted (with unpersist) beyond max_size."""
        k = self._key(index, terms, mode)
        hit = self._entries.get(k)
        if hit is not None:
            self.hits += 1
            self._entries.move_to_end(k)
            return hit
        self.misses += 1
        df = matching_docs(index, terms, mode).persist()
        self._entries[k] = df
        while len(self._entries) > self.max_size:
            _, evicted = self._entries.popitem(last=False)
            evicted.unpersist()
        return df

    def clear(self) -> None:
        while self._entries:
            _, df = self._entries.popitem(last=False)
            df.unpersist()
