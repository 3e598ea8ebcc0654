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

_MIDNUM = ",.٫٬⁄︐︔"  # MidNum (UAX#29 subset)


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


def _generic_scan(run: str, base: int, out: list) -> None:
    """UAX#29-style scanner: words = (L|M)+ with digits joining
    (ALetter x Numeric), numbers = Nd+ with MidNum between digits,
    marks always glue."""
    i, n = 0, len(run)
    while i < n:
        ch = run[i]
        if _is_letter(ch) or _is_digit(ch):
            j = i
            while j < n:
                c = run[j]
                if _is_letter(c) or _is_digit(c) or _is_mark(c):
                    j += 1
                elif (c in _MIDNUM and j > i and j + 1 < n
                        and _is_digit(run[j - 1]) and _is_digit(run[j + 1])):
                    j += 1      # 4,600 / ۱٬۳۷۹ stay joined
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
