"""Analysis operators: row -> analyzed term-doc rows, as Arrow-batched UDFs.

The Spark restatement of the reference indexing chain's analysis+inversion
steps (``DocInverterPerField.processFields`` ->
``FreqProxTermsWriterPerField.newTerm/addTerm``; SURVEY.md §3.1): each Spark
partition plays the role of a DocumentsWriterPerThread — documents are
analyzed and locally inverted with no cross-task coordination; the only
shuffle in the whole build is the later term grouping.

Everything is mapInPandas (Arrow batches); no per-row Python UDFs
(BASELINE.json input_hint mandate).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import numpy as np
import pandas as pd

from ..functions.htmlstrip import html_to_text
from ..functions.smallfloat import doclen_to_norm

# Output schema of analyze_partition: one row per (doc, distinct term),
# doc metadata repeated on each term row (docmeta is later distilled by a
# cheap distinct on (seg, docid)).
TERMDOC_SCHEMA = (
    "seg INT, docid INT, key STRING, doclen INT, norm INT, "
    "term STRING, freq INT, positions ARRAY<INT>"
)

# IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS: per-occurrence
# char offsets ride along in the postings (what PostingsHighlighter reads
# instead of re-analyzing — ``postingshighlight/PostingsHighlighter.java``)
TERMDOC_SCHEMA_OFFSETS = TERMDOC_SCHEMA + ", starts ARRAY<INT>, ends ARRAY<INT>"

EXTRACT_SCHEMA_SUFFIX = ", text STRING"


def make_analyze_partition(key_col: str, text_col: str, seg_col: str = "seg",
                           with_positions: bool = True,
                           analyzer: str = "english",
                           html_input: bool = False,
                           with_offsets: bool = False):
    """Returns a mapInPandas function assigning segment-local docIDs.

    Input partitions MUST be sorted by ``key_col`` (the caller does
    repartitionByRange + sortWithinPartitions) so docIDs are deterministic
    under any parallelism: docid = rank of key within segment
    (SURVEY.md §7 P2 — reference docIDs are insertion-order artifacts, ours
    are sort-derived).
    """

    from ..functions.tokenizer import get_analyzer
    analyze_fn = get_analyzer(analyzer)

    def analyze_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        next_docid = 0  # running counter across Arrow batches of ONE partition
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            segs = pdf[seg_col].to_numpy()
            keys = pdf[key_col].to_numpy()
            texts = pdf[text_col].to_numpy()
            out_seg, out_docid, out_key = [], [], []
            out_dl, out_norm, out_term, out_freq, out_pos = [], [], [], [], []
            out_starts, out_ends = [], []
            for i in range(n):
                docid = next_docid
                next_docid += 1
                raw = texts[i]
                if html_input:
                    # extraction fused into this pass: one Python stage,
                    # html bytes never cross a second Arrow boundary
                    raw = html_to_text(raw) if raw is not None else ""
                toks = analyze_fn(raw if raw is not None else "")
                doclen = len(toks)
                norm = int(doclen_to_norm(doclen))
                if doclen == 0:
                    # token-less docs still occupy a docID (Lucene counts
                    # them in maxDoc); sentinel row with NULL term.
                    out_seg.append(segs[i]); out_docid.append(docid)
                    out_key.append(keys[i]); out_dl.append(0)
                    out_norm.append(norm); out_term.append(None)
                    out_freq.append(0); out_pos.append([] if with_positions else None)
                    if with_offsets:
                        out_starts.append([]); out_ends.append([])
                    continue
                if with_positions or with_offsets:
                    per_term: dict[str, list] = {}
                    for t in toks:
                        per_term.setdefault(t.term, []).append(t)
                    items = ((term, len(ts), ts) for term, ts in per_term.items())
                else:
                    counts = Counter(t.term for t in toks)
                    items = ((term, c, None) for term, c in counts.items())
                for term, freq, ts in items:
                    out_seg.append(segs[i])
                    out_docid.append(docid)
                    out_key.append(keys[i])
                    out_dl.append(doclen)
                    out_norm.append(norm)
                    out_term.append(term)
                    out_freq.append(freq)
                    out_pos.append([t.pos for t in ts]
                                   if (with_positions and ts is not None)
                                   else (None if not with_positions else []))
                    if with_offsets:
                        out_starts.append([t.start for t in ts])
                        out_ends.append([t.end for t in ts])
            cols = {
                "seg": np.asarray(out_seg, dtype=np.int32),
                "docid": np.asarray(out_docid, dtype=np.int32),
                "key": out_key,
                "doclen": np.asarray(out_dl, dtype=np.int32),
                "norm": np.asarray(out_norm, dtype=np.int32),
                "term": out_term,
                "freq": np.asarray(out_freq, dtype=np.int32),
                "positions": out_pos,
            }
            if with_offsets:
                cols["starts"] = out_starts
                cols["ends"] = out_ends
            yield pd.DataFrame(cols)

    return analyze_partition


def make_html_extractor(html_col: str = "html"):
    """mapInPandas stage: html binary -> extracted text column appended.

    The normative extractor (functions/htmlstrip.py) — the byte-identical
    `text` invariant per url (BASELINE.json input_hint).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = [
                html_to_text(h) if h is not None else ""
                for h in pdf[html_col]
            ]
            yield pdf

    return extract
