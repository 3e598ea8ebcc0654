"""ICUTokenizer analogue — script-aware composite word segmentation.

Re-derivation of the reference's ICU segmentation package
(``lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
segmentation/``): ``CompositeBreakIterator`` + ``ScriptIterator``
split the text into same-script runs and each run is segmented by a
per-script break iterator (``DefaultICUTokenizerConfig``):

  * Thai / Lao — dictionary word break (Thai reuses
    :func:`functions.thai.thai_segment`; Lao gets the same maximal-match
    engine over a compact lexicon, standing in for the reference's
    ``LaoBreakIterator`` syllable rules — pluggable like every other
    dictionary here);
  * Han — one token per ideograph (the 4.x default config's CJK
    behavior: ``TestICUTokenizer.testChinese`` 我是中国人 -> 我|是|中|
    国|人);
  * Hiragana / Katakana — one token per run;
  * everything else — a UAX#29 word scanner where combining marks GLUE
    to their base (unlike the ASCII-oriented StandardTokenizer DFA,
    which splits Bengali vowel signs and Syriac dot clusters), numbers
    keep MidNum separators between digits (4,600), and letter/digit
    runs join.

The generic scanner implements the Unicode 6.3 word-break mid-token
rules (the tailoring ICU 52 ships for Lucene 4.6's ``Default.rbbi``):

  * WB6/7  — AHLetter x (MidLetter | MidNumLet | Single_Quote)
    AHLetter: ``o'reilly``, ``don’t``, ``example.com`` stay joined;
  * WB7a   — Hebrew_Letter x Single_Quote: a geresh-as-apostrophe
    after a Hebrew letter attaches even word-finally (``צ'``);
  * WB7b/c — Hebrew_Letter x Double_Quote Hebrew_Letter: gershayim
    written as ``"`` inside a Hebrew word stays (``צה"ל``);
  * WB11/12 — Numeric x (MidNum | MidNumLet | Single_Quote) Numeric:
    ``21.35``, ``216.239.63.104``, ``4,600``, ``1'000``.

The reference test chain (ICUTokenizer + ICUNormalizer2Filter) is
``[icu_normalize(t) for t in icu_tokenize(text)]`` — the tokenizer
itself does no case folding.
"""

from __future__ import annotations

import unicodedata

from .thai import THAI_LEXICON, thai_segment

__all__ = ["icu_tokenize", "LAO_LEXICON"]

LAO_LEXICON = frozenset({
    "ກວ່າ", "ດອກ", "ລາວ", "ພາສາ", "ຂອບໃຈ", "ສະບາຍດີ", "ນ້ຳ", "ເຮືອນ",
})

# Unicode 6.3 WordBreakProperty classes (ICU 52, the version the
# reference's 4.6 era builds against) for the separators our corpora
# exercise:
_SINGLE_QUOTE = "\u0027"
_DOUBLE_QUOTE = "\u0022"
# MidNumLet -- joins letters (WB6/7) AND digits (WB11/12): FULL STOP,
# RIGHT SINGLE QUOTATION MARK, ONE DOT LEADER, SMALL/FULLWIDTH forms
_MIDNUMLET = "\u002e\u2019\u2024\ufe52\uff07\uff0e"
# MidLetter -- joins letters only: COLON (removed from the class only
# in Unicode 7.0/ICU 54, after the reference's era), MIDDLE DOT, GREEK
# ANO TELEIA, HEBREW GERSHAYIM, HYPHENATION POINT, presentation forms
_MIDLETTER = "\u003a\u00b7\u0387\u05f4\u2027\ufe13\ufe55\uff1a"
# MidNum -- joins digits only: COMMA, SEMICOLON, GREEK QUESTION MARK,
# ARABIC DECIMAL/THOUSANDS SEPARATORS, NKO COMMA, FRACTION SLASH,
# presentation forms
_MIDNUM = ("\u002c\u003b\u037e\u066b\u066c\u07f8\u2044"
           "\ufe10\ufe14\ufe50\ufe54\uff0c\uff1b")
# U+05F3 HEBREW GERESH is classed ALetter in Unicode 6.3 (it CONTINUES
# a Hebrew word by WB5), unlike its Po general category:
_ALETTER_EXTRA = "\u05f3"


def _script(ch: str) -> str:
    o = ord(ch)
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF \
            or 0xF900 <= o <= 0xFAFF:
        return "han"
    if 0x3040 <= o <= 0x309F:
        return "hiragana"
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return "katakana"
    if 0x0E00 <= o <= 0x0E4F:       # Thai letters/marks (digits excluded)
        return "thai"
    if 0x0E80 <= o <= 0x0ECF:       # Lao letters/marks
        return "lao"
    return "other"


def _is_letter(ch: str) -> bool:
    return unicodedata.category(ch).startswith("L")


def _is_mark(ch: str) -> bool:
    return unicodedata.category(ch).startswith("M")


def _is_digit(ch: str) -> bool:
    return unicodedata.category(ch) == "Nd"


def _is_hebrew_letter(ch: str) -> bool:
    """Hebrew_Letter word-break class: Hebrew-block letters (plus the
    geresh, which 6.3 classes ALetter — close enough for the quote
    rules, which only test the preceding char)."""
    return (ch != "" and 0x0590 <= ord(ch) <= 0x05FF
            and (_is_letter(ch) or ch in _ALETTER_EXTRA))


def _is_wordish(ch: str) -> bool:
    """AHLetter (ALetter | Hebrew_Letter) approximation."""
    return _is_letter(ch) or ch in _ALETTER_EXTRA


def _prev_base(run: str, j: int) -> str:
    """Last char before ``j`` that is not a combining mark — WB4 makes
    Extend characters transparent when matching the rule context."""
    k = j - 1
    while k >= 0 and _is_mark(run[k]):
        k -= 1
    return run[k] if k >= 0 else ""


def _generic_scan(run: str, base: int, out: list) -> None:
    """UAX#29 word scanner (Unicode 6.3 rule set): words = (L|M)+ with
    digits joining (ALetter x Numeric, WB9/10), marks always glue
    (WB4), and the mid-token continuation rules —

    WB6/7: AHLetter x (MidLetter|MidNumLet|Single_Quote) AHLetter
    WB7a:  Hebrew_Letter x Single_Quote (attaches word-finally)
    WB7b/c: Hebrew_Letter x Double_Quote Hebrew_Letter
    WB11/12: Numeric x (MidNum|MidNumLet|Single_Quote) Numeric
    """
    i, n = 0, len(run)
    while i < n:
        ch = run[i]
        if _is_wordish(ch) or _is_digit(ch):
            j = i
            while j < n:
                c = run[j]
                if _is_wordish(c) or _is_digit(c) or _is_mark(c):
                    j += 1
                    continue
                if j == i:
                    break
                prev = _prev_base(run, j)
                nxt = run[j + 1] if j + 1 < n else ""
                if ((c in _MIDLETTER or c in _MIDNUMLET
                     or c == _SINGLE_QUOTE)
                        and _is_wordish(prev) and nxt
                        and _is_wordish(nxt)):
                    j += 1      # WB6/7: o'reilly, don’t, example.com
                elif ((c in _MIDNUM or c in _MIDNUMLET
                       or c == _SINGLE_QUOTE)
                        and _is_digit(prev) and nxt and _is_digit(nxt)):
                    j += 1      # WB11/12: 4,600 / 21.35 / ۱٬۳۷۹
                elif c == _SINGLE_QUOTE and _is_hebrew_letter(prev):
                    j += 1      # WB7a: word-final geresh-as-apostrophe
                elif (c == _DOUBLE_QUOTE and nxt
                        and _is_hebrew_letter(prev)
                        and _is_hebrew_letter(nxt)):
                    j += 1      # WB7b/c: gershayim-as-quote inside word
                else:
                    break
            out.append((run[i:j], base + i, base + j))
            i = j
        else:
            i += 1


def icu_tokenize(text: str,
                 thai_lexicon: frozenset = THAI_LEXICON,
                 lao_lexicon: frozenset = LAO_LEXICON
                 ) -> list[tuple[str, int, int]]:
    """-> [(term, start, end)] — raw tokens, no folding (chain
    icu_normalize / filters.icu_fold after, like the reference chains
    ICUNormalizer2Filter)."""
    out: list[tuple[str, int, int]] = []
    i, n = 0, len(text)
    while i < n:
        sc = _script(text[i])
        j = i + 1
        while j < n and _script(text[j]) == sc:
            j += 1
        run = text[i:j]
        if sc == "han":
            for k, ch in enumerate(run):
                out.append((ch, i + k, i + k + 1))
        elif sc in ("hiragana", "katakana"):
            out.append((run, i, j))
        elif sc in ("thai", "lao"):
            lex = thai_lexicon if sc == "thai" else lao_lexicon
            off = i
            for seg in thai_segment(run, lex):
                out.append((seg, off, off + len(seg)))
                off += len(seg)
        else:
            _generic_scan(run, i, out)
        i = j
    return out
