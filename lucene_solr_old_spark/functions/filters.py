"""Analysis filter pack: ASCIIFolding, WordDelimiter, Shingle, Synonym,
EdgeNGram — token-list filters composable into analyzer chains.

Each filter maps ``list[Token]`` -> ``list[Token]`` (Token = term, pos,
start, end; position increments are encoded as absolute positions, the
same convention the tokenizer chain uses).  Reference semantics:

  * :func:`ascii_fold` — ``analysis/common/.../miscellaneous/
    ASCIIFoldingFilter.java`` (2046 LoC of switch): accented/decorated
    Latin folded to ASCII.  Re-derived as NFKD + combining-mark strip plus
    the non-decomposable special cases the reference enumerates (Æ ß Ø Þ Đ
    Ħ ı Ł Ŋ Œ Ŧ and the quote/dash/bracket punctuation blocks).
  * :func:`word_delimiter` — ``miscellaneous/WordDelimiterFilter.java``
    (601 LoC): split on intra-word delimiters, case transitions,
    letter-number transitions; optional catenation of subword runs
    (emitted at the position of the run's LAST part, Javadoc :56-73);
    trailing possessive 's stripped per subword.
  * :func:`shingle` — ``shingle/ShingleFilter.java``: word n-grams of
    adjacent tokens, shingle at the position of its first token
    (unigram first, then the shingles starting there).
  * :func:`SynonymMap` / :func:`synonym_filter` — ``synonym/SynonymFilter
    .java:48-110``: greedy LONGEST match (``maxHorizonContext``); matched
    input can be kept (keepOrig) or replaced; a synonym's j-th word takes
    the position of the j-th matched input token (positions beyond the
    match extend by +1) — the posInc=0 stacking / posLength flattening
    that survives indexing (posLength itself is not stored in the index,
    so this is exactly the indexed-token semantics).
  * :func:`edge_ngrams` — ``ngram/EdgeNGramTokenFilter.java`` (4.4+
    semantics): front grams minGram..maxGram, all at the token's position.
"""

from __future__ import annotations

import unicodedata

from .tokenizer import Token

__all__ = ["ascii_fold", "fold_text", "word_delimiter", "shingle",
           "SynonymMap", "synonym_filter", "edge_ngrams",
           "char_ngram_tokens", "keyword_marked_stem", "common_grams",
           "length_filter", "trim_filter", "truncate_filter",
           "reverse_filter", "capitalization_filter", "remove_duplicates",
           "limit_token_count", "pattern_replace", "fingerprint_filter",
           "icu_fold"]


# ---------------------------------------------------------------------------
# ASCIIFoldingFilter
# ---------------------------------------------------------------------------

# non-NFKD-decomposable cases from ASCIIFoldingFilter.java's switch
_FOLD_SPECIAL = {
    "Æ": "AE", "æ": "ae", "Ð": "D", "ð": "d", "Ø": "O", "ø": "o",
    "Þ": "TH", "þ": "th", "ß": "ss", "Đ": "D", "đ": "d", "Ħ": "H",
    "ħ": "h", "ı": "i", "ĸ": "q", "Ł": "L", "ł": "l", "Ŋ": "N",
    "ŋ": "n", "Œ": "OE", "œ": "oe", "Ŧ": "T", "ŧ": "t", "Ƿ": "W",
    "ƿ": "w", "Ɖ": "D", "Ɗ": "D", "ƍ": "d",
    # punctuation blocks folded by the reference (:1600-2000)
    "‘": "'", "’": "'", "‚": "'", "‛": "'",
    "‹": "'", "›": "'",
    "“": '"', "”": '"', "„": '"', "«": '"',
    "»": '"',
    "‐": "-", "‑": "-", "‒": "-", "–": "-",
    "—": "-", "―": "-", "−": "-",
    "⁄": "/", "⁎": "*", "⁒": "%",
}


def fold_text(text: str) -> str:
    """Fold a string to ASCII (ASCIIFoldingFilter.foldToASCII): NFKD
    decomposition with combining marks dropped, plus the reference's
    special-case table; non-Latin codepoints pass through unchanged."""
    out = []
    for ch in text:
        if ord(ch) < 0x80:
            out.append(ch)
            continue
        sp = _FOLD_SPECIAL.get(ch)
        if sp is not None:
            out.append(sp)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        folded = "".join(c for c in dec if not unicodedata.combining(c))
        # only fold when the result is ASCII (the reference folds Latin
        # ranges; Cyrillic/Greek/CJK pass through)
        out.append(folded if folded and all(ord(c) < 0x80 for c in folded)
                   else ch)
    return "".join(out)


def ascii_fold(tokens: list[Token]) -> list[Token]:
    return [Token(fold_text(t.term), t.pos, t.start, t.end) for t in tokens]


# ---------------------------------------------------------------------------
# WordDelimiterFilter
# ---------------------------------------------------------------------------

_LOWER, _UPPER, _DIGIT, _DELIM = 1, 2, 4, 8


def _char_type(ch: str) -> int:
    if ch.isdigit():
        return _DIGIT
    cat = unicodedata.category(ch)
    if cat.startswith("L") or cat.startswith("M"):
        if ch.isupper() or cat == "Lt":
            return _UPPER
        return _LOWER
    return _DELIM


def _split_subwords(term: str, split_on_case_change: bool,
                    split_on_numerics: bool,
                    stem_english_possessive: bool = False):
    """-> list of (subword, start_char, end_char, is_numeric_run) following
    WordDelimiterIterator: delimiters always split; lower->UPPER splits on
    case change; an UPPER-run followed by lower keeps its last upper with
    the lower run ("XMLParser" -> XML, Parser); alpha<->digit splits when
    split_on_numerics; a trailing "'s" after a subword is consumed BEFORE
    delimiter splitting (``WordDelimiterIterator.endsWithPossessive``:
    "test's'" -> "test", not "test","s")."""
    types = [_char_type(c) for c in term]
    parts = []
    i, n = 0, len(term)
    while i < n:
        if types[i] == _DELIM:
            i += 1
            continue
        j = i + 1
        while j < n and types[j] != _DELIM:
            prev, cur = types[j - 1], types[j]
            if split_on_numerics and (
                    (prev == _DIGIT) != (cur == _DIGIT)):
                break
            if split_on_case_change:
                if prev == _LOWER and cur == _UPPER:
                    break
                if (prev == _UPPER and cur == _LOWER
                        and j - 1 > i and types[j - 2] == _UPPER):
                    # ABCdef: boundary BEFORE the last upper
                    j -= 1
                    break
            j += 1
        parts.append((term[i:j], i, j, types[i] == _DIGIT))
        i = j
        if (stem_english_possessive and i + 1 < n + 1
                and term[i:i + 1] in ("'", "’")
                and i + 1 < n and term[i + 1] in "sS"
                and (i + 2 == n or types[i + 2] == _DELIM)):
            i += 2  # consume the possessive, don't emit it
    return parts


def word_delimiter(tokens: list[Token],
                   generate_word_parts: bool = True,
                   generate_number_parts: bool = True,
                   catenate_words: bool = False,
                   catenate_numbers: bool = False,
                   catenate_all: bool = False,
                   preserve_original: bool = False,
                   split_on_case_change: bool = True,
                   split_on_numerics: bool = True,
                   stem_english_possessive: bool = True) -> list[Token]:
    """``WordDelimiterFilter.incrementToken`` semantics (Javadoc flag
    table :95-160).  Defaults = Solr's text_en_splitting index chain."""
    out: list[Token] = []
    pos = -1
    for tok in tokens:
        parts = _split_subwords(tok.term, split_on_case_change,
                                split_on_numerics, stem_english_possessive)
        parts = [p for p in parts if p[0]]
        if not parts:
            # all delimiters: token is dropped (position hole)
            pos += 1
            continue
        if len(parts) == 1 and parts[0][0] == tok.term \
                and not preserve_original:
            pos += 1
            out.append(Token(tok.term, pos, tok.start, tok.end))
            continue
        pos += 1
        if preserve_original:
            out.append(Token(tok.term, pos, tok.start, tok.end))
        state = {"at_first": True, "run_pos": None}
        # runs of same-kind subwords for catenation
        run: list[tuple] = []
        run_numeric = None

        def flush_run():
            nonlocal run, run_numeric, pos
            if len(run) > 1 and (catenate_all
                                 or (catenate_words and not run_numeric)
                                 or (catenate_numbers and run_numeric)):
                cat = "".join(w for w, *_ in run)
                s = tok.start + run[0][1]
                e = tok.start + run[-1][2]
                # catenation at the position of the run's LAST part; when
                # parts weren't generated, it is itself the next position
                if state["run_pos"] is not None:
                    p = state["run_pos"]
                elif state["at_first"]:
                    state["at_first"] = False
                    p = pos
                else:
                    pos += 1
                    p = pos
                out.append(Token(cat, p, s, e))
            run = []
            run_numeric = None
            state["run_pos"] = None

        for w, s, e, isnum in parts:
            gen = (generate_number_parts if isnum else generate_word_parts)
            if run and isnum != run_numeric:
                flush_run()
            if gen:
                # first generated part shares the token's position (and
                # stacks under the preserved original, if any)
                if state["at_first"]:
                    state["at_first"] = False
                    p = pos
                else:
                    pos += 1
                    p = pos
                out.append(Token(w, p, tok.start + s, tok.start + e))
                state["run_pos"] = p
            run.append((w, s, e))
            run_numeric = isnum
        flush_run()
    return out


# ---------------------------------------------------------------------------
# ShingleFilter
# ---------------------------------------------------------------------------


def shingle(tokens: list[Token], min_shingle: int = 2, max_shingle: int = 2,
            output_unigrams: bool = True, sep: str = " ",
            filler: str = "_") -> list[Token]:
    """``shingle/ShingleFilter.java``: word n-grams over adjacent tokens.
    Position holes (stopword gaps) are filled with the filler token text,
    like the reference's FillerToken.  Shingles take the position of their
    first token; unigram (if kept) emitted first at the same position."""
    if not tokens:
        return []
    # materialize the position line with fillers for holes
    line: list[Token | None] = []
    expected = tokens[0].pos
    for t in tokens:
        while t.pos > expected:
            line.append(None)  # hole -> filler
            expected += 1
        line.append(t)
        expected += 1
    out: list[Token] = []
    base_pos = tokens[0].pos
    for i, t in enumerate(line):
        if t is not None and output_unigrams:
            out.append(t)
        pos = base_pos + i
        for size in range(min_shingle, max_shingle + 1):
            if i + size > len(line):
                break
            window = line[i:i + size]
            real = [w for w in window if w is not None]
            if not real:
                continue  # all-filler shingles are never emitted
            words = [w.term if w is not None else filler for w in window]
            out.append(Token(sep.join(words), pos,
                             real[0].start, real[-1].end))
    return out


# ---------------------------------------------------------------------------
# SynonymFilter
# ---------------------------------------------------------------------------


class SynonymMap:
    """Match rules: tuple(input terms) -> list of output phrases (each a
    list of terms).  ``add("new york", "nyc")`` etc.; matching is greedy
    longest-first like the reference's FST walk
    (``synonym/SynonymFilter.java:48-110`` parse + match)."""

    def __init__(self):
        self.rules: dict[tuple, list[list[str]]] = {}
        self.max_len = 0

    def add(self, input_phrase: str, output_phrase: str) -> "SynonymMap":
        key = tuple(input_phrase.split())
        self.rules.setdefault(key, []).append(output_phrase.split())
        self.max_len = max(self.max_len, len(key))
        return self

    def add_equivalents(self, *phrases: str) -> "SynonymMap":
        """a, b, c equivalent: every phrase maps to every OTHER phrase."""
        for p in phrases:
            for q in phrases:
                if p != q:
                    self.add(p, q)
        return self


def synonym_filter(tokens: list[Token], smap: SynonymMap,
                   keep_orig: bool = True) -> list[Token]:
    """Greedy longest-match synonym injection.  Output-word j takes the
    position of the j-th matched input token; words beyond the match
    length extend by +1 per word (the flattened-graph positions that
    reach the index once posLength is discarded)."""
    out: list[Token] = []
    i = 0
    n = len(tokens)
    while i < n:
        matched = 0
        outputs = None
        # longest match first; matched tokens must be CONSECUTIVE positions
        # (a stopword hole breaks a multi-word match, like the FST walk
        # consuming real tokens)
        for m in range(min(smap.max_len, n - i), 0, -1):
            window = tokens[i:i + m]
            if m > 1 and any(window[j + 1].pos != window[j].pos + 1
                             for j in range(m - 1)):
                continue
            key = tuple(t.term for t in window)
            if key in smap.rules:
                matched = m
                outputs = smap.rules[key]
                break
        if not matched:
            out.append(tokens[i])
            i += 1
            continue
        window = tokens[i:i + matched]
        if keep_orig:
            out.extend(window)
        for phrase in outputs:
            for j, w in enumerate(phrase):
                if j < matched:
                    base = window[j]
                    out.append(Token(w, base.pos, window[0].start,
                                     window[-1].end))
                else:
                    out.append(Token(w, window[matched - 1].pos
                                     + (j - matched + 1),
                                     window[0].start, window[-1].end))
        i += matched
    out.sort(key=lambda t: (t.pos, t.start))
    return out


# ---------------------------------------------------------------------------
# EdgeNGramTokenFilter
# ---------------------------------------------------------------------------


def edge_ngrams(tokens: list[Token], min_gram: int = 1,
                max_gram: int = 3) -> list[Token]:
    """Front edge n-grams, all at the source token's position
    (``ngram/EdgeNGramTokenFilter.java`` 4.4+ keeps grams position-
    stacked).  Tokens shorter than min_gram are dropped."""
    out: list[Token] = []
    for t in tokens:
        for g in range(min_gram, min(max_gram, len(t.term)) + 1):
            out.append(Token(t.term[:g], t.pos, t.start, t.start + g))
    return out


def char_ngram_tokens(text: str, n: int = 2) -> list[Token]:
    """``ngram/NGramTokenizer.java`` (fixed gram size): character n-grams
    of the lowercased text at consecutive positions (gram i covers chars
    [i, i+n))."""
    t = text.lower()
    return [Token(t[i:i + n], i, i, i + n)
            for i in range(max(0, len(t) - n + 1))]


def keyword_marked_stem(tokens: list[Token],
                        protected: set[str]) -> list[Token]:
    """KeywordMarkerFilter + PorterStemFilter
    (``miscellaneous/SetKeywordMarkerFilter.java`` +
    ``en/PorterStemFilter.java:48-52`` — a token flagged as keyword is NOT
    stemmed; Solr's ``protwords.txt``).  Input tokens should already be
    lowercased/stopped."""
    from .porter import porter_stem

    return [t if t.term in protected
            else Token(porter_stem(t.term), t.pos, t.start, t.end)
            for t in tokens]


def common_grams(tokens: list[Token], common_words: set[str],
                 query_mode: bool = False, sep: str = "_") -> list[Token]:
    """``commongrams/CommonGramsFilter.java``: wherever a COMMON word
    (stopword-like) neighbors any token, emit the bigram "a_b" STACKED at
    the first token's position (posInc 0) alongside the originals —
    phrase searches over high-frequency words then hit the cheap bigram
    postings instead of the huge stopword postings.

    ``query_mode=True`` = ``CommonGramsQueryFilter``: keep ONLY the
    bigrams where they exist (originals that participated in a bigram are
    dropped), so queries match the indexed bigrams."""
    out: list[Token] = []
    in_bigram = [False] * len(tokens)
    for i, t in enumerate(tokens):
        nxt = tokens[i + 1] if i + 1 < len(tokens) else None
        adjacent = nxt is not None and nxt.pos == t.pos + 1
        if adjacent and (t.term in common_words
                         or nxt.term in common_words):
            in_bigram[i] = True
            in_bigram[i + 1] = True
            if not query_mode:
                out.append(t)
            out.append(Token(t.term + sep + nxt.term, t.pos,
                             t.start, nxt.end))
        elif not query_mode or not in_bigram[i]:
            out.append(t)
    out.sort(key=lambda t: (t.pos, t.start, t.term))
    return out


# ---------------------------------------------------------------------------
# Miscellaneous token filters (lucene/analysis/common/.../miscellaneous/)
# ---------------------------------------------------------------------------

def length_filter(tokens: list[Token], min_len: int = 1,
                  max_len: int = 255) -> list[Token]:
    """``miscellaneous/LengthFilter.java``: keep tokens whose term length
    is in ``[min_len, max_len]``.  Positions are absolute in this chain
    convention, so dropped tokens leave holes — the 4.x
    ``enablePositionIncrements=true`` behavior."""
    return [t for t in tokens if min_len <= len(t.term) <= max_len]


def trim_filter(tokens: list[Token]) -> list[Token]:
    """``miscellaneous/TrimFilter.java`` (updateOffsets=false, the 4.x
    default): strip leading/trailing whitespace from the term, offsets
    unchanged."""
    return [Token(t.term.strip(), t.pos, t.start, t.end) for t in tokens]


def truncate_filter(tokens: list[Token], length: int = 10) -> list[Token]:
    """``miscellaneous/TruncateTokenFilter.java``: cut every term to at
    most ``length`` chars (the coarse stemming used for agglutinative
    languages in the reference's Solr example schemas)."""
    return [Token(t.term[:length], t.pos, t.start, t.end) for t in tokens]


def reverse_filter(tokens: list[Token]) -> list[Token]:
    """``reverse/ReverseStringFilter.java``: reverse each term — indexed
    alongside the forward form it turns leading-wildcard queries
    (``*suffix``) into cheap prefix scans over the reversed dictionary."""
    return [Token(t.term[::-1], t.pos, t.start, t.end) for t in tokens]


def capitalization_filter(tokens: list[Token]) -> list[Token]:
    """``miscellaneous/CapitalizationFilter.java`` (default factory
    settings: onlyFirstWord=false semantics per token): first char
    uppercased, the rest lowercased."""
    return [Token(t.term[:1].upper() + t.term[1:].lower(), t.pos,
                  t.start, t.end) for t in tokens]


def remove_duplicates(tokens: list[Token]) -> list[Token]:
    """``miscellaneous/RemoveDuplicatesTokenFilter.java``: drop a token if
    an earlier token at the SAME position has the same term (synonym
    stacks commonly produce these)."""
    seen: set[tuple[int, str]] = set()
    out: list[Token] = []
    for t in tokens:
        if (t.pos, t.term) not in seen:
            seen.add((t.pos, t.term))
            out.append(t)
    return out


def limit_token_count(tokens: list[Token], max_tokens: int) -> list[Token]:
    """``miscellaneous/LimitTokenCountFilter.java``: keep only the first
    ``max_tokens`` tokens of the stream (the reference's guard for
    pathological documents; the build pipeline's per-doc cap)."""
    return tokens[:max_tokens]


def pattern_replace(tokens: list[Token], pattern: str, replacement: str,
                    replace_all: bool = True) -> list[Token]:
    """``pattern/PatternReplaceFilter.java``: regex replace inside each
    term (``replace_all=False`` = the factory's ``replace="first"``).
    Empty results are KEPT as empty-term tokens, exactly like the
    reference (callers chain :func:`length_filter` to drop them)."""
    import re as _re

    rx = _re.compile(pattern)
    count = 0 if replace_all else 1
    return [Token(rx.sub(replacement, t.term, count=count),
                  t.pos, t.start, t.end) for t in tokens]


def fingerprint_filter(tokens: list[Token], separator: str = " ",
                       max_output_size: int = 1024) -> list[Token]:
    """``miscellaneous/FingerprintFilter.java`` (Solr's
    FingerprintFilterFactory): consume the WHOLE stream and emit one
    token — the sorted, deduplicated terms joined by ``separator`` — the
    canonical near-canonical-dedup key (same idea as the OpenRefine
    fingerprint clustering method).  Streams whose fingerprint would
    exceed ``max_output_size`` chars emit nothing, per the reference's
    maxOutputTokenSize guard."""
    if not tokens:
        return []
    terms = sorted({t.term for t in tokens})
    fp = separator.join(terms)
    if len(fp) > max_output_size:
        return []
    return [Token(fp, 0, min(t.start for t in tokens),
                  max(t.end for t in tokens))]


def icu_fold(text: str) -> str:
    """ICUFoldingFilter approximation (``analysis/icu/.../
    ICUFoldingFilter.java`` wraps ICU4J's foldCase+NFKC): NFKC
    normalization, Unicode case folding, and combining-mark removal.
    A documented approximation — ICU's custom folding tables cover a few
    extra compatibility mappings this three-step pipeline misses."""
    import unicodedata

    t = unicodedata.normalize("NFKC", text).casefold()
    t = unicodedata.normalize("NFD", t)
    t = "".join(ch for ch in t if not unicodedata.combining(ch))
    return unicodedata.normalize("NFC", t)
