"""Byte-pair-encoding subword tokenizer: distributed training + encoding.

A trainable tokenizer is the missing half of token accounting in a
pre-training pipeline: ``textstats.token_counts`` approximates token
budgets with whitespace/alpha-run counts, while this module learns a real
BPE merge table from the corpus and encodes documents with it, so token
counts, sequence packing (:mod:`.packing`) and context-length decisions
all use the same subword inventory the model will see.

Algorithms (public):

* Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
  with Subword Units" (ACL 2016): train = iterate "count adjacent symbol
  pairs over the word-frequency table, merge the most frequent pair";
  words carry an end-of-word marker so final subwords are distinguished.
* GPT-2 (Radford et al. 2019): regex pre-tokenization into
  letter/digit/punctuation runs before BPE, and the rank-table encoder
  (repeatedly merge the lowest-rank pair present).  Encoding by applying
  the merge list *in training order* is equivalent: a merged symbol is
  created by exactly one (later-ranked) merge, so applying merge *k* can
  never create an occurrence of a pair ranked < *k* (the property the
  GPT-2 encoder relies on; differentially tested in tests/test_bpe.py).

Scale shape (100 TB):

* :func:`pretokenize` / :func:`word_counts` — pure Catalyst
  (``regexp_extract_all`` + explode + one map-side-combined ``groupBy``):
  ONE shuffle whose key space is the word-type vocabulary, exactly like
  the index build's term aggregation.
* :func:`bpe_train` — runs on the *word-type table*, not the corpus: the
  standard practice (subword-nmt, SentencePiece, HF tokenizers all train
  from an in-memory word->count map).  The collect is bounded by
  ``max_types`` (count-desc top-K, ~tens of MB at the 1M default); the
  Zipf tail it drops contributes pair counts below any merge threshold.
  The merge loop itself is the incremental-update trainer (pair counts
  adjusted only for affected words), not the O(merges x types) recount.
* :func:`bpe_encode` — embarrassingly parallel over documents.  The
  ``catalyst`` path chains one JVM ``replace`` per merge (whole-stage
  codegen, no Python) and is what the DuckDB gate oracle mirrors; the
  ``pandas`` path broadcasts the rank table and encodes word-memoized
  (Zipf: a few thousand distinct words per batch) inside an Arrow batch
  — the path for production-sized (32k+) merge tables, where a
  32k-deep expression tree is not viable.  Both paths are differentially
  tested for equality.

Reference tie-in: the reference engine ships no trainable tokenizer (its
analyzers are rule/dictionary based — see ``functions/``); this module is
part of the beyond-reference training-data surface, like
:mod:`.dedup` / :mod:`.packing`.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

__all__ = ["PRETOKEN_RE", "pretokenize", "word_counts", "bpe_train",
           "bpe_encode", "encode_word", "wrap_symbols", "EOW"]

# GPT-2-style pre-tokenization, simplified to be RE2-compatible (no
# lookarounds) so Spark (java.util.regex) and DuckDB (RE2) agree:
# letter runs, digit runs, and non-alphanumeric-non-space runs, over
# lowercased text.
PRETOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

# End-of-word marker appended as a standalone symbol (Sennrich 2016 §3.2).
EOW = "</w>"

# Sentinel wrapping for the string-replace formulation of a merge:
# a symbol sequence [a, b, c] is the string "\x02a\x03\x02b\x03\x02c\x03",
# and merging pair (a, b) is replace("\x02a\x03\x02b\x03" -> "\x02ab\x03").
# Because every symbol is fully delimited and adjacent occurrences share no
# characters, plain left-to-right non-overlapping string replace performs
# exactly the simultaneous left-to-right BPE merge — with no lookbehind
# regex (RE2-unsupported) and no false sub-symbol matches ("xa b" can never
# match pattern "a b").  Words are joined with \x01 so document-level
# replace cannot merge across word boundaries.  Input text has the
# sentinel range replaced by spaces first (defensive; real control chars
# in web text act as separators), along with the code points where
# java.util.regex (ASCII ``\s``), RE2 (ASCII ``\s``) and Python re
# (UNICODE ``\s``) disagree: \x0b, \x7f, NEL, NBSP, OGHAM, the U+2000
# block, LS, PS, NNBSP, MMSP, IDEOGRAPHIC SPACE — so the Catalyst path,
# a DuckDB oracle, AND the pandas (Python re) path pre-tokenize
# identically; \t \n \f \r and the ASCII space survive (whitespace in
# ALL three engines).  NBSP is ubiquitous web text (&nbsp;), so turning
# it into a separator is also the semantically right call.
_S1, _S2, _S3 = "\x01", "\x02", "\x03"
_SENTINEL_SCRUB = ("[\x00-\x08\x0b\x0e-\x1f\x7f\u0085\u00a0"
                   "\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]")


def _words_col(text_col):
    clean = F.regexp_replace(F.lower(F.coalesce(text_col, F.lit(""))),
                             _SENTINEL_SCRUB, " ")
    return F.regexp_extract_all(clean, F.lit(PRETOKEN_RE), 0)


def pretokenize(docs: DataFrame, key_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(key, words array<string>): GPT-2-style regex pre-tokenization of
    lowercased text.  Pure Catalyst; zero shuffle."""
    return docs.select(F.col(key_col), _words_col(F.col(text_col))
                       .alias("words"))


def word_counts(docs: DataFrame, key_col: str = "doc_id",
                text_col: str = "text", method: str = "auto") -> DataFrame:
    """(word, count): corpus-wide pre-token frequency table — the training
    input for :func:`bpe_train`.  One map-side-combined shuffle keyed by
    word type (the same shape as the index build's term aggregation).

    ``method``: ``catalyst`` pre-tokenizes with JVM regex (the path the
    DuckDB gate oracle mirrors expression-for-expression); ``arrow``
    counts words per partition inside an Arrow batch stage (Python ``re``,
    which after the sentinel scrub agrees with java.util.regex / RE2 on
    ``PRETOKEN_RE`` by construction — the same identity
    :func:`bpe_encode`'s pandas path relies on) and shuffles only the
    per-partition partial counts.  Identical results (differentially
    tested); ``arrow`` is ~4x faster per pass because java.util.regex's
    extract-all + a 60x-corpus-size explode dominate the catalyst plan,
    while the arrow stage ships one bounded (word, partial-count) table
    per partition into the same map-side-combinable shuffle.  ``auto`` =
    ``arrow``.
    """
    if method == "auto":
        method = "arrow"
    if method == "catalyst":
        return (docs.select(F.explode(_words_col(F.col(text_col)))
                            .alias("word"))
                .groupBy("word").agg(F.count("*").cast("long").alias("count")))
    if method != "arrow":
        raise ValueError(f"unknown method {method!r}")

    import re
    from collections import Counter

    pre = re.compile(PRETOKEN_RE)
    scrub = re.compile(_SENTINEL_SCRUB)

    def partial_counts(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        counts: Counter = Counter()
        findall = pre.findall
        sub = scrub.sub
        for pdf in batches:
            for text in pdf[text_col]:
                counts.update(findall(sub(" ", (text or "").lower())))
        if counts:
            yield pd.DataFrame({"word": list(counts.keys()),
                                "count": list(counts.values())})

    partials = docs.select(text_col).mapInPandas(
        partial_counts, schema="word STRING, count LONG")
    return (partials.groupBy("word")
            .agg(F.sum("count").cast("long").alias("count")))


# --------------------------------------------------------------------------
# training (driver-side over the bounded word-type table)
# --------------------------------------------------------------------------

def _merge_symbols(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Simultaneous left-to-right merge of every occurrence of ``pair``."""
    a, b = pair
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(counts, num_merges: int, max_types: int = 1_000_000,
              min_count: int = 2, eow: str | None = EOW
              ) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a word-frequency table.

    ``counts`` is the DataFrame from :func:`word_counts` (or any iterable
    of ``(word, count)``).  Deterministic: types are taken count-desc then
    word-asc (``max_types`` bounds the driver collect), and each round
    merges the pair with the highest total count, ties broken by the
    lexicographically smallest pair — so the merge table is a pure
    function of the corpus, independent of layout/partitioning.

    Incremental trainer: pair counts and a pair->word index are updated
    only for the words containing the merged pair (subword-nmt's fast
    path), so cost is O(total pair churn), not O(merges x types).
    """
    if isinstance(counts, DataFrame):
        # fetch one extra row purely to DETECT truncation — "no silent
        # caps": the Zipf tail dropped here contributes pair counts below
        # any merge threshold, but the operator says so instead of hiding it
        rows = (counts.orderBy(F.desc("count"), F.asc("word"))
                .limit(max_types + 1).collect())
        if len(rows) > max_types:
            import logging
            logging.getLogger(__name__).warning(
                "bpe_train: corpus has more than max_types=%d word types; "
                "training on the top %d by (count desc, word asc) — raise "
                "max_types to include the dropped tail", max_types,
                max_types)
            rows = rows[:max_types]
        pairs_in = [(r["word"], r["count"]) for r in rows]
    else:
        pairs_in = sorted(counts, key=lambda wc: (-wc[1], wc[0]))[:max_types]

    words: list[list[str]] = []
    wcounts: list[int] = []
    for w, c in pairs_in:
        if not w:
            continue
        syms = list(w) + ([eow] if eow else [])
        words.append(syms)
        wcounts.append(int(c))

    pair_count: dict[tuple[str, str], int] = defaultdict(int)
    # superset index: word ids that *may* contain the pair (membership is
    # re-checked at merge time; stale entries are skipped, not corrected)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        c = wcounts[i]
        for p in zip(syms, syms[1:]):
            pair_count[p] += c
            pair_words[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_n = 0
        for p, n in pair_count.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < min_count:
            break
        merges.append(best)
        touched = pair_words.pop(best, set())
        pair_count.pop(best, None)
        for i in touched:
            syms = words[i]
            if best[0] not in syms:           # stale index entry
                continue
            has = any(p == best for p in zip(syms, syms[1:]))
            if not has:
                continue
            c = wcounts[i]
            for p in zip(syms, syms[1:]):
                if p != best:
                    left = pair_count[p] - c
                    if left > 0:
                        pair_count[p] = left
                    else:
                        pair_count.pop(p, None)
            new = _merge_symbols(syms, best)
            words[i] = new
            for p in zip(new, new[1:]):
                if p != best:
                    pair_count[p] += c
                    pair_words[p].add(i)
    return merges


# --------------------------------------------------------------------------
# encoding
# --------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int],
                eow: str | None = EOW) -> list[str]:
    """GPT-2-style encoder: repeatedly merge the lowest-rank adjacent pair
    until none of the word's pairs is in the rank table."""
    syms = list(word) + ([eow] if eow else [])
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_symbols(syms, best_pair)
    return syms


def wrap_symbols(word: str, eow: str | None = EOW) -> str:
    """The sentinel-wrapped initial symbol string for ``word``."""
    parts = [_S2 + ch + _S3 for ch in word]
    if eow:
        parts.append(_S2 + eow + _S3)
    return "".join(parts)


def _encode_catalyst(docs: DataFrame, merges, key_col, text_col, eow):
    words = _words_col(F.col(text_col))
    # per-word sentinel wrapping, words joined by \x01 so a document is ONE
    # string and each merge is ONE whole-stage-codegen replace over it
    wrapped = F.transform(
        words,
        lambda w: F.concat(
            F.array_join(
                F.transform(F.regexp_extract_all(w, F.lit("."), 0),
                            lambda c: F.concat(F.lit(_S2), c, F.lit(_S3))),
                ""),
            F.lit(_S2 + eow + _S3) if eow else F.lit("")))
    doc_str = F.array_join(wrapped, _S1)
    doc_str = functools.reduce(
        lambda s, ab: F.replace(
            s,
            F.lit(_S2 + ab[0] + _S3 + _S2 + ab[1] + _S3),
            F.lit(_S2 + ab[0] + ab[1] + _S3)),
        merges, doc_str)
    toks = F.regexp_extract_all(doc_str, F.lit(f"{_S2}([^{_S3}]*){_S3}"), 1)
    return docs.select(
        F.col(key_col),
        F.array_join(toks, " ").alias("tokens_str"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def _encode_pandas(docs: DataFrame, merges, key_col, text_col, eow):
    import re

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)
    pre = re.compile(PRETOKEN_RE)
    scrub = re.compile(_SENTINEL_SCRUB)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        rk = b_ranks.value
        memo: dict[str, list[str]] = {}

        def enc(text):
            toks: list[str] = []
            for w in pre.findall(scrub.sub(" ", (text or "").lower())):
                got = memo.get(w)
                if got is None:
                    got = encode_word(w, rk, eow)
                    memo[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            out_toks = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame({
                key_col: pdf[key_col],
                "tokens_str": [" ".join(t) for t in out_toks],
                "n_tokens": [len(t) for t in out_toks],
            })

    key_type = dict(docs.dtypes)[key_col]
    schema = f"{key_col} {key_type}, tokens_str STRING, n_tokens LONG"
    return docs.select(key_col, text_col).mapInPandas(run, schema=schema)


def bpe_encode(docs: DataFrame, merges: Iterable[tuple[str, str]],
               key_col: str = "doc_id", text_col: str = "text",
               eow: str | None = EOW, method: str = "auto") -> DataFrame:
    """(key, tokens_str, n_tokens): encode documents with a learned merge
    table (applied in training order; tokens joined by ' ' — subwords can
    never contain whitespace, so the join is lossless).

    ``method``: ``catalyst`` chains one JVM ``replace`` per merge (zero
    Python; mirrors the gate's DuckDB oracle) — right for small/medium
    merge tables; ``pandas`` broadcasts the rank table into a word-memoized
    Arrow encoder — right for production (32k+) vocabularies; ``auto``
    picks by table size.  The two are differentially tested equal.
    """
    merges = [tuple(p) for p in merges]
    for a, b in merges:
        bad = set(a + b) & set(_S1 + _S2 + _S3 + " \t\n\r\f\v")
        if bad or not a or not b:
            raise ValueError(
                f"merge pair ({a!r}, {b!r}) contains whitespace/sentinel "
                f"characters or an empty symbol — symbols must come from "
                f"pretokenized (whitespace-free, scrubbed) words, as "
                f"bpe_train produces")
    if method == "auto":
        method = "catalyst" if len(merges) <= 400 else "pandas"
    if method == "catalyst":
        return _encode_catalyst(docs, merges, key_col, text_col, eow)
    if method == "pandas":
        return _encode_pandas(docs, merges, key_col, text_col, eow)
    raise ValueError(f"unknown method {method!r}")
