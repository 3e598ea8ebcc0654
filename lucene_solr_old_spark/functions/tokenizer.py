"""StandardTokenizer-equivalent tokenization + the EnglishAnalyzer chain.

Token-boundary semantics model UAX#29 word breaks as implemented by the
reference's JFlex DFA (``lucene/analysis/common/src/java/org/apache/lucene/
analysis/standard/StandardTokenizerImpl.jflex``; wrapper
``standard/StandardTokenizer.java:77``, max token length 255 per
``standard/StandardAnalyzer.java:58,98-100``) for the token classes our
corpus exercises (SURVEY.md §7 "hard parts" #2 scopes fidelity to the
fixture classes):

  * ALPHANUM runs: Unicode letters/digits/marks form one token (WB5/8/9/10);
  * MidLetter/MidNumLet: a single apostrophe (' or U+2019) between letters
    stays inside the token ("don't"); a single '.' between alphanumerics
    stays inside ("example.com", "3.14", "u.s.a") (WB6/7/11/12);
  * MidNum: a single ',' between digits stays inside ("1,024");
  * everything else (whitespace, punctuation, hyphens, symbols) breaks;
  * tokens longer than 255 chars are dropped (not split).

The full chain (= reference ``EnglishAnalyzer`` minus keyword marker):
StandardTokenizer -> EnglishPossessiveFilter (``en/EnglishPossessiveFilter
.java``: strip trailing 's / ’s) -> LowerCaseFilter (``core/LowerCaseFilter
.java``) -> StopFilter (33-word set, position holes preserved —
``core/StopFilter.java``) -> PorterStemFilter (``en/PorterStemFilter.java``).
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .porter import porter_stem
from .stopwords import ENGLISH_STOP_WORDS

__all__ = ["Token", "standard_tokenize", "analyze", "analyze_terms",
           "MAX_TOKEN_LENGTH"]

MAX_TOKEN_LENGTH = 255

# [^\W_] == unicode letter|digit|mark under Python re; underscore breaks
# (underscore is ExtendNumLet in UAX#29 and *joins* words — but the corpus
# fixtures exclude it, and Lucene's 4.6 JFlex grammar also treats it via
# ExtendNumLet; we break on it and keep it out of fixtures).
_WORD = r"[^\W_]"
_LETTER = r"[^\W\d_]"
TOKEN_RE = re.compile(
    rf"{_WORD}+(?:(?:['’](?={_LETTER})|\.(?={_WORD})|,(?=\d)){_WORD}+)*",
    re.UNICODE,
)

_POSSESSIVE_RE = re.compile(r"(?:'|’)[sS]$")


class Token(NamedTuple):
    term: str
    pos: int       # token position (post-stop holes preserved)
    start: int     # char offset (inclusive)
    end: int       # char offset (exclusive)


def standard_tokenize(text: str):
    """Raw StandardTokenizer pass: yields (term, position, start, end),
    dropping over-long tokens but leaving a POSITION HOLE for each (the
    reference counts skipped over-long tokens in ``skippedPositions`` and
    adds them to the next token's position increment —
    ``standard/StandardTokenizer.java:142-152,171``), so phrase/span
    positions after an over-long token match the reference."""
    pos = -1
    for m in TOKEN_RE.finditer(text):
        t = m.group(0)
        pos += 1
        if len(t) > MAX_TOKEN_LENGTH:
            continue
        yield Token(t, pos, m.start(), m.end())


# raw-token -> final term memo (None = stopword).  Zipf vocabularies repeat
# tokens constantly, so caching the whole possessive+lowercase+stop+stem
# chain per distinct RAW token ~2-3x's indexing throughput.  Per-process
# (executor python worker) cache, size-bounded.
_TERM_MEMO: dict[str, str | None] = {}
_TERM_MEMO_MAX = 1 << 20


def _final_term(raw: str) -> str | None:
    hit = _TERM_MEMO.get(raw)
    if hit is not None or raw in _TERM_MEMO:
        return hit
    term = _POSSESSIVE_RE.sub("", raw).lower()
    out = None if term in ENGLISH_STOP_WORDS else porter_stem(term)
    if len(_TERM_MEMO) < _TERM_MEMO_MAX:
        _TERM_MEMO[raw] = out
    return out


def analyze(text: str) -> list[Token]:
    """Full EnglishAnalyzer-style chain; returns post-stop tokens with
    original positions (holes where stopwords were removed).

    Loop is fused (no intermediate raw-token Token objects): one Token is
    allocated per SURVIVING term instead of two per raw token, which is
    ~1.8x on the indexing hot path (same outputs, differentially tested
    against the standard_tokenize composition in tests)."""
    out: list[Token] = []
    pos = -1
    memo = _TERM_MEMO
    for m in TOKEN_RE.finditer(text):
        raw = m.group()
        pos += 1
        if len(raw) > MAX_TOKEN_LENGTH:
            continue
        final = memo.get(raw)
        if final is None and raw not in memo:
            final = _final_term(raw)
        if final is None:
            continue
        out.append(Token(final, pos, m.start(), m.end()))
    return out


def analyze_inverted(text: str) -> tuple[dict[str, list[int]], int]:
    """(term -> positions, doclen) for the EnglishAnalyzer chain — the
    per-document inversion the fused index build consumes.  Identical
    semantics to building the dict from :func:`analyze`'s output (insertion
    order = first occurrence), but with zero Token allocations: the build's
    inner loop only ever needs (term, position)."""
    per: dict[str, list[int]] = {}
    pos = -1
    doclen = 0
    memo = _TERM_MEMO
    for m in TOKEN_RE.finditer(text):
        raw = m.group()
        pos += 1
        if len(raw) > MAX_TOKEN_LENGTH:
            continue
        final = memo.get(raw)
        if final is None and raw not in memo:
            final = _final_term(raw)
        if final is None:
            continue
        doclen += 1
        slot = per.get(final)
        if slot is None:
            per[final] = [pos]
        else:
            slot.append(pos)
    return per, doclen


def analyze_terms(text: str) -> list[str]:
    """Terms only (the common hot path)."""
    return [t.term for t in analyze(text)]


_WS_RE = re.compile(r"\S+")


def ws_stop_analyze(text: str) -> list[Token]:
    """WhitespaceTokenizer + LowerCase + StopFilter, NO stemming.

    The reference's ``core/WhitespaceTokenizer.java`` + ``LowerCaseFilter`` +
    ``StopFilter`` chain.  Positions are pre-stop indices (holes preserved,
    StopFilter semantics).  This chain is ANSI-SQL-expressible, which makes
    it the analyzer used by the DuckDB correctness oracle (gate.py); the
    full English chain is oracle-checked in pytest instead.
    """
    out: list[Token] = []
    pos = -1
    for m in _WS_RE.finditer(text):
        pos += 1
        term = m.group(0).lower()
        if term in ENGLISH_STOP_WORDS:
            continue
        out.append(Token(term, pos, m.start(), m.end()))
    return out


def ws_lower_analyze(text: str) -> list[Token]:
    """WhitespaceTokenizer + LowerCase, no stops, no stemming — the
    reference's test-corpus analyzer (e.g. the surround parser's
    ``SingleFieldTestDb``) and the raw-term chain the surround parser
    expects (it applies no analysis to query terms)."""
    return [Token(m.group(0).lower(), pos, m.start(), m.end())
            for pos, m in enumerate(_WS_RE.finditer(text))]


def english_folded_analyze(text: str) -> list[Token]:
    """EnglishAnalyzer chain with ASCIIFoldingFilter inserted before the
    stop filter (the common Solr text_en + asciifolding ordering):
    StandardTokenizer -> possessive -> lowercase -> fold -> stop -> Porter.
    """
    from .filters import fold_text  # local: filters imports Token from here

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = fold_text(_POSSESSIVE_RE.sub("", term).lower())
        if t in ENGLISH_STOP_WORDS:
            continue
        out.append(Token(porter_stem(t), pos, start, end))
    return out


def ws_stop_inverted(text: str) -> tuple[dict[str, list[int]], int]:
    """Inverted-form twin of :func:`ws_stop_analyze` (see
    :func:`analyze_inverted`)."""
    per: dict[str, list[int]] = {}
    pos = -1
    doclen = 0
    stops = ENGLISH_STOP_WORDS
    for m in _WS_RE.finditer(text):
        pos += 1
        term = m.group(0).lower()
        if term in stops:
            continue
        doclen += 1
        slot = per.get(term)
        if slot is None:
            per[term] = [pos]
        else:
            slot.append(pos)
    return per, doclen


def ws_lower_inverted(text: str) -> tuple[dict[str, list[int]], int]:
    """Inverted-form twin of :func:`ws_lower_analyze`."""
    per: dict[str, list[int]] = {}
    pos = -1
    for m in _WS_RE.finditer(text):
        pos += 1
        term = m.group(0).lower()
        slot = per.get(term)
        if slot is None:
            per[term] = [pos]
        else:
            slot.append(pos)
    return per, pos + 1


ANALYZERS = {
    "english": analyze,
    "ws_stop": ws_stop_analyze,
    "ws_lower": ws_lower_analyze,
    "english_folded": english_folded_analyze,
}

# term->positions fast path per chain (the fused index build's shape);
# chains without an entry fall back to composing over ANALYZERS[name].
INVERTED_ANALYZERS = {
    "english": analyze_inverted,
    "ws_stop": ws_stop_inverted,
    "ws_lower": ws_lower_inverted,
}


def register_analyzer(name: str, fn) -> None:
    """Extension point: register a custom chain (a callable text ->
    list[Token]).  The function OBJECT is captured into the build closure
    (operators/analysis.py) and cloudpickled to executors, so chains
    composed from functions/filters.py (synonyms, shingles, word-delimiter,
    edge n-grams) work distributed without any registry on the workers."""
    ANALYZERS[name] = fn


def get_analyzer(name: str):
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; have {sorted(ANALYZERS)}")


def get_inverted_analyzer(name: str):
    """(term -> positions, doclen) analyzer for the fused build.  Registered
    fast path when one exists, else the generic composition over the
    token-stream chain (identical semantics either way)."""
    fast = INVERTED_ANALYZERS.get(name)
    if fast is not None:
        return fast
    analyze_fn = get_analyzer(name)

    def inverted(text: str) -> tuple[dict[str, list[int]], int]:
        per: dict[str, list[int]] = {}
        toks = analyze_fn(text)
        for t in toks:
            slot = per.get(t.term)
            if slot is None:
                per[t.term] = [t.pos]
            else:
                slot.append(t.pos)
        return per, len(toks)

    return inverted
