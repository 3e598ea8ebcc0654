"""CJK analysis chain — the reference's ``CJKAnalyzer``
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/``):
StandardTokenizer -> CJKWidthFilter -> LowerCase -> CJKBigramFilter ->
StopFilter(cjk stop set).

* :func:`cjk_width_fold` — ``CJKWidthFilter.java``: fullwidth ASCII
  variants (U+FF01-FF5E) fold to their ASCII forms, the ideographic
  space to a plain space, and halfwidth katakana to their fullwidth
  forms.  (The reference additionally composes halfwidth voiced-sound
  marks into the preceding kana; this port maps the marks to the
  standalone U+3099/309A combining forms — a documented divergence that
  only affects halfwidth dakuten input.)
* :func:`cjk_bigrams` — ``CJKBigramFilter.java`` (default flags
  HAN | HIRAGANA | KATAKANA | HANGUL, outputUnigrams=false): runs of
  CJK characters emit overlapping bigrams; a lone CJK character emits
  itself as a unigram.
* :func:`cjk_analyze` — the full chain; registered as analyzer
  ``"cjk"``.
"""

from __future__ import annotations

from .stopwords import ENGLISH_STOP_WORDS  # noqa: F401  (same family)
from .tokenizer import Token, standard_tokenize

__all__ = ["CJK_STOP_WORDS", "cjk_width_fold", "cjk_bigrams",
           "cjk_analyze"]

# resources/.../cjk/stopwords.txt (classic English set + s/t/www)
CJK_STOP_WORDS = frozenset(
    "a and are as at be but by for if in into is it no not of on or s "
    "such t that the their then there these they this to was will with "
    "www".split())

_HALF_KATA = "ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝ"
_FULL_KATA = "ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン"

_WIDTH = {0x3000: " "}
for _i in range(0xFF01, 0xFF5F):
    _WIDTH[_i] = chr(_i - 0xFF00 + 0x20)
for _h, _f in zip(_HALF_KATA, _FULL_KATA):
    _WIDTH[ord(_h)] = _f
_WIDTH[0xFF9E] = "゙"
_WIDTH[0xFF9F] = "゚"


def cjk_width_fold(text: str) -> str:
    return text.translate(_WIDTH)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0xF900 <= cp <= 0xFAFF      # Han (+compat)
            or 0x3040 <= cp <= 0x309F      # Hiragana
            or 0x30A0 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF  # Katakana
            or 0xAC00 <= cp <= 0xD7A3 or 0x1100 <= cp <= 0x11FF)  # Hangul


def cjk_bigrams(term: str):
    """Split a token into CJK bigram / unigram units and non-CJK spans."""
    units: list[str] = []
    i = 0
    n = len(term)
    while i < n:
        if _is_cjk(term[i]):
            j = i
            while j < n and _is_cjk(term[j]):
                j += 1
            if j - i == 1:
                units.append(term[i])
            else:
                for k in range(i, j - 1):
                    units.append(term[k: k + 2])
            i = j
        else:
            j = i
            while j < n and not _is_cjk(term[j]):
                j += 1
            units.append(term[i:j])
            i = j
    return units


def cjk_analyze(text: str) -> list[Token]:
    """CJKAnalyzer chain.  Positions are sequential over emitted units,
    with stopword holes (the chain's StopFilter runs last)."""
    out: list[Token] = []
    pos = -1
    for term, _p, start, end in standard_tokenize(cjk_width_fold(text)):
        for unit in cjk_bigrams(term.lower()):
            if not unit:
                continue
            pos += 1
            if unit in CJK_STOP_WORDS:
                continue
            out.append(Token(unit, pos, start, end))
    return out


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("cjk", cjk_analyze)


_register()
