"""Highlighting — snippet extraction around query matches.

Two variants of the classic re-analysis Highlighter
(``lucene/highlighter/.../highlight/Highlighter.java``: re-tokenize the
stored field, locate query-term tokens, emit best fragment):

  * ``highlight_first`` — Catalyst-only: fragment around the FIRST
    occurrence of any query term (locate + substr; JVM codegen, and
    ANSI-SQL-reproducible for the correctness gate);
  * ``highlight_analyzed`` — token-accurate: re-analyzes the stored text
    with the index's analyzer, finds matching tokens by TERM (so "Running"
    highlights for query "run" under the english chain), wraps matches in
    <em> tags within the best fragment — the faithful Highlighter behavior,
    as an Arrow-batched UDF.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import get_analyzer

__all__ = ["highlight_first", "highlight_analyzed"]


def highlight_first(docs: DataFrame, term: str, frag: int = 20,
                    key_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(key, snippet) for docs containing ``term`` as a substring —
    fragment = term ± ``frag`` chars.  Catalyst expressions only."""
    pos = F.locate(term, F.col(text_col))  # 1-based; 0 = no match
    start1 = F.greatest(F.lit(1), pos - frag)
    end1 = F.least(F.length(text_col), pos + len(term) - 1 + frag)
    return (docs.where(pos > 0)
            .select(F.col(key_col),
                    F.substring(F.col(text_col), start1,
                                end1 - start1 + 1).alias("snippet")))


def highlight_analyzed(docs: DataFrame, query_text: str,
                       analyzer: str = "english", frag: int = 30,
                       key_col: str = "key", text_col: str = "text",
                       pre: str = "<em>", post: str = "</em>") -> DataFrame:
    """(key, snippet) — token-accurate highlighting via re-analysis."""
    analyze = get_analyzer(analyzer)
    qterms = {t.term for t in analyze(query_text)}

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            keys, snippets = [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                text = text or ""
                matches = [(t.start, t.end) for t in analyze(text)
                           if t.term in qterms]
                if not matches:
                    continue
                s0, e0 = matches[0]
                lo = max(0, s0 - frag)
                hi = min(len(text), e0 + frag)
                # mark every match inside the fragment, right-to-left
                out = text[lo:hi]
                for s, e in reversed([m for m in matches
                                      if m[0] >= lo and m[1] <= hi]):
                    out = (out[:s - lo] + pre + out[s - lo:e - lo] + post
                           + out[e - lo:])
                keys.append(key)
                snippets.append(out)
            yield pd.DataFrame({key_col: keys, "snippet": snippets})

    return docs.select(key_col, text_col).mapInPandas(
        run, schema=f"{key_col} STRING, snippet STRING")
