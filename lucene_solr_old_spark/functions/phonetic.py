"""Phonetic encoders + compound-word splitting.

* :func:`soundex` — classic American Soundex, the algorithm behind the
  reference's ``PhoneticFilter(encoder="Soundex")``
  (``analysis/phonetic/.../PhoneticFilter.java`` + commons-codec
  ``Soundex``): first letter + 3 digits, H/W transparent for the
  adjacent-duplicate rule, vowels separate duplicates.
* :func:`refined_soundex` — commons-codec ``RefinedSoundex``: no length
  cap, different digit table, vowels encoded as 0.
* :func:`metaphone` — Lawrence Philips' original Metaphone (1990), the
  commons-codec ``Metaphone`` variant with its default max length 4.
* :func:`phonetic_filter` — the filter: emits the encoding stacked at
  the token's position (inject=True keeps the original, the reference
  default).
* :func:`dictionary_compound_split` — ``compound/
  DictionaryCompoundWordTokenFilter.java``: brute-force dictionary
  subword matching for agglutinative compounds, subwords stacked at the
  compound's position.
"""

from __future__ import annotations

from .tokenizer import Token

__all__ = ["soundex", "refined_soundex", "metaphone",
           "phonetic_filter", "dictionary_compound_split"]

_SOUNDEX_MAP = {}
for _letters, _d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                     ("L", "4"), ("MN", "5"), ("R", "6")):
    for _ch in _letters:
        _SOUNDEX_MAP[_ch] = _d


def soundex(word: str) -> str:
    w = "".join(ch for ch in word.upper() if ch.isalpha())
    if not w:
        return ""
    out = [w[0]]
    last = _SOUNDEX_MAP.get(w[0], "")
    for ch in w[1:]:
        d = _SOUNDEX_MAP.get(ch, "")
        if d:
            if d != last:
                out.append(d)
                if len(out) == 4:
                    break
            last = d
        elif ch not in "HW":
            # vowels reset the duplicate rule; H/W are transparent
            last = ""
    return "".join(out).ljust(4, "0")


_REFINED_MAP = {}
for _letters, _d in (("AEIOUYHW", "0"), ("BP", "1"), ("FV", "2"),
                     ("CKS", "3"), ("GJ", "4"), ("QXZ", "5"),
                     ("DT", "6"), ("L", "7"), ("MN", "8"), ("R", "9")):
    for _ch in _letters:
        _REFINED_MAP[_ch] = _d


def refined_soundex(word: str) -> str:
    w = "".join(ch for ch in word.upper() if ch.isalpha())
    if not w:
        return ""
    out = [w[0]]
    last = None
    for ch in w:
        d = _REFINED_MAP.get(ch)
        if d is not None and d != last:
            out.append(d)
        last = d
    return "".join(out)


_VOWELS = "AEIOU"


def metaphone(word: str, max_len: int = 4) -> str:
    """Original Metaphone per commons-codec (the reference's default
    phonetic encoder)."""
    w = "".join(ch for ch in word.upper() if ch.isalpha())
    n = len(w)
    if n == 0:
        return ""
    if n == 1:
        return w
    # initial-letter exceptions
    first2 = w[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = "S" + w[1:]
    elif first2 == "WH":
        w = "W" + w[2:]
    n = len(w)
    out: list[str] = []
    i = 0
    while i < n and len(out) < max_len:
        c = w[i]
        # placeholder space: '' would be a substring of every class
        prev = w[i - 1] if i > 0 else " "
        nxt = w[i + 1] if i + 1 < n else " "
        nxt2 = w[i + 2] if i + 2 < n else " "
        if c != "C" and i > 0 and prev == c:
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")
        elif c == "C":
            if prev == "S" and nxt in "IEY":
                pass                        # SCI/SCE/SCY: silent C
            elif nxt == "I" and nxt2 == "A":
                out.append("X")             # CIA
            elif nxt in "IEY":
                out.append("S")
            elif nxt == "H":
                if prev == "S":
                    out.append("K")         # SCH
                elif i == 0 and n >= 3 and w[2] in _VOWELS:
                    out.append("K")         # initial CH + vowel (codec)
                else:
                    out.append("X")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "IEY":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H" and i + 1 == n - 1:
                pass                        # terminal GH: silent
            elif nxt == "H" and i + 2 < n and w[i + 2] not in _VOWELS:
                pass                        # GH + consonant: silent
            elif i > 0 and (w[i: i + 2] == "GN"
                            or w[i: i + 4] == "GNED"):
                pass                        # silent G in GN/GNED
            elif nxt in "IEY" and prev != "G":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if i == n - 1 or prev in "CSPTG":
                pass
            elif nxt in _VOWELS:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if prev != "C":
                out.append("K")
        elif c == "P":
            out.append("F" if nxt == "H" else "P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
            elif nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "H":
                out.append("0")
            elif nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")
            elif not (nxt == "C" and nxt2 == "H"):
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "X":
            out.append("K")
            if len(out) < max_len:
                out.append("S")
        elif c == "Y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out[:max_len])


def phonetic_filter(tokens: list[Token], encoder=soundex,
                    inject: bool = True) -> list[Token]:
    """``PhoneticFilter``: the encoding is stacked at the same position
    (posInc 0); ``inject=False`` replaces the token instead."""
    out: list[Token] = []
    for t in tokens:
        code = encoder(t.term)
        if inject:
            out.append(t)
            if code and code != t.term:
                out.append(Token(code, t.pos, t.start, t.end))
        else:
            out.append(Token(code or t.term, t.pos, t.start, t.end))
    return out


def dictionary_compound_split(tokens: list[Token], dictionary,
                              min_word_size: int = 5,
                              min_subword_size: int = 2,
                              max_subword_size: int = 15,
                              only_longest_match: bool = False
                              ) -> list[Token]:
    """``DictionaryCompoundWordTokenFilter``: for every token of at
    least ``min_word_size`` chars, every dictionary word found as a
    substring (size-bounded) is emitted at the SAME position after the
    original ('donaudampfschiff' + {donau, dampf, schiff} -> all three
    stacked) — German/Dutch/Scandinavian compound recall."""
    words = {w.lower() for w in dictionary}
    out: list[Token] = []
    for t in tokens:
        out.append(t)
        term = t.term.lower()
        if len(term) < min_word_size:
            continue
        for i in range(len(term) - min_subword_size + 1):
            longest = None
            for j in range(min_subword_size,
                           min(max_subword_size, len(term) - i) + 1):
                cand = term[i: i + j]
                if cand in words:
                    if only_longest_match:
                        longest = cand
                    else:
                        out.append(Token(cand, t.pos, t.start, t.end))
            if only_longest_match and longest:
                out.append(Token(longest, t.pos, t.start, t.end))
    return out


def ws_soundex_analyze(text: str):
    """Whitespace -> lowercase -> PhoneticFilter(Soundex, inject=True):
    every token also indexes its sound code, so spelling variants of
    names conflate (smith/smyth -> S530).  Registered as analyzer
    ``"ws_soundex"``."""
    from .tokenizer import _WS_RE

    toks: list[Token] = []
    pos = -1
    for m in _WS_RE.finditer(text):
        pos += 1
        toks.append(Token(m.group(0).lower(), pos, m.start(), m.end()))
    return phonetic_filter(toks, encoder=soundex, inject=True)


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("ws_soundex", ws_soundex_analyze)


_register()
