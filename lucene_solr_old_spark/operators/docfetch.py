"""Document fetch components.

  * get_docs — RealTimeGet analogue (``solr/.../handler/component/
    RealTimeGetComponent``): fetch docs by key from the freshest index
    state (with streaming ingest, re-opening the index sees new segments
    immediately — our "tlog" is the already-flushed segment, so get-by-key
    is a docmeta lookup + optional stored-field join).
  * term_vector — TermVectorComponent (``solr/.../handler/component/
    TermVectorComponent.java``): per-document term vector (term, freq,
    positions), recovered by re-analysis of the stored text (the same
    strategy the classic Highlighter uses when vectors aren't stored).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import get_analyzer
from .indexer import InvertedIndex

__all__ = ["get_docs", "term_vector"]


def get_docs(index: InvertedIndex, keys: list[str],
             stored: DataFrame | None = None,
             stored_key_col: str = "key") -> DataFrame:
    """(key, seg, docid, doclen, norm[, ...stored columns]) for ``keys``."""
    hits = index.docmeta.where(F.col("key").isin(keys))
    if stored is not None:
        st = (stored.withColumnRenamed(stored_key_col, "key")
              if stored_key_col != "key" else stored)
        hits = hits.join(st, "key", "left")
    return hits


def term_vector(docs: DataFrame, keys: list[str],
                analyzer: str = "english", key_col: str = "key",
                text_col: str = "text") -> DataFrame:
    """(key, term, freq, positions) for the requested docs."""
    analyze = get_analyzer(analyzer)
    subset = docs.where(F.col(key_col).isin(keys)).select(key_col, text_col)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            keys_o, terms, freqs, poss = [], [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                per_term: dict[str, list[int]] = {}
                for t in analyze(text or ""):
                    per_term.setdefault(t.term, []).append(t.pos)
                for term, ps in sorted(per_term.items()):
                    keys_o.append(key)
                    terms.append(term)
                    freqs.append(len(ps))
                    poss.append(ps)
            yield pd.DataFrame({key_col: keys_o, "term": terms,
                                "freq": freqs, "positions": poss})

    return subset.mapInPandas(
        run, schema=f"{key_col} STRING, term STRING, freq INT, "
                    f"positions ARRAY<INT>")
