"""Double Metaphone phonetic encoder + token filter.

Re-derivation of Lawrence Philips' Double Metaphone (C/C++ in Dr.
Dobb's Journal, June 2000) with the exact rule set and result-pair
semantics of the Apache commons-codec ``DoubleMetaphone`` encoder that
the reference wraps in
``lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/DoubleMetaphoneFilter.java:45-108``:

* :func:`double_metaphone` — returns the (primary, alternate) code
  pair, each capped at ``max_len`` (reference default 4).  The
  alternate tracks the primary except where a rule explicitly diverges
  (Slavo-Germanic, Spanish, French, Italian special cases).
* :func:`double_metaphone_filter` — the token filter.  Emission order
  and position increments mirror ``DoubleMetaphoneFilter.incrementToken``:
  with ``inject=True`` the original survives and codes stack at posInc
  0; with ``inject=False`` the primary REPLACES the token (taking its
  position increment) and the alternate stacks behind it; a token whose
  primary encoding is empty (no letters) passes through unchanged.
* analyzer ``"ws_dmetaphone"`` — whitespace → lowercase → filter
  (inject), the chain ``DoubleMetaphoneFilterTest`` exercises.

Validated against every fixture in
``analysis/phonetic/src/test/.../DoubleMetaphoneFilterTest.java:34-74``
(international → ANTR/ANTRNXNL, Kuczewski → KSSK+KXFS, non-convertible
pass-through) in ``tests/test_dmetaphone.py``.
"""

from __future__ import annotations

from .tokenizer import Token

__all__ = ["double_metaphone", "double_metaphone_filter"]

_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = ("ES", "EP", "EB", "EL", "EY", "IB",
                                     "IL", "IN", "IE", "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _Result:
    """Primary/alternate builder pair, each capped at ``max_len``."""

    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int):
        self.primary: list[str] = []
        self.alternate: list[str] = []
        self.max_len = max_len

    def add(self, prim: str, alt: str | None = None) -> None:
        if alt is None:
            alt = prim
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(prim[:room])
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(alt[:room])

    def add_primary(self, s: str) -> None:
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def add_alternate(self, s: str) -> None:
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    def complete(self) -> bool:
        return (len(self.primary) >= self.max_len
                and len(self.alternate) >= self.max_len)


def _char(v: str, i: int) -> str:
    return v[i] if 0 <= i < len(v) else "\0"


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS


def _contains(v: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(v):
        return False
    return v[start:start + length] in criteria


def _slavo_germanic(v: str) -> bool:
    return "W" in v or "K" in v or "CZ" in v or "WITZ" in v


def double_metaphone(word: str, max_len: int = 4) -> tuple[str, str]:
    """Encode ``word``; returns ``(primary, alternate)`` (both may be
    ``""`` when the input has no encodable letters)."""
    v = word.strip().upper()
    if not v:
        return "", ""
    slavo = _slavo_germanic(v)
    i = 1 if v.startswith(_SILENT_START) else 0
    r = _Result(max_len)
    n = len(v)
    while not r.complete() and i < n:
        ch = v[i]
        if ch in "AEIOUY":
            if i == 0:
                r.add("A")
            i += 1
        elif ch == "B":
            r.add("P")
            i += 2 if _char(v, i + 1) == "B" else 1
        elif ch == "Ç":   # Ç
            r.add("S")
            i += 1
        elif ch == "C":
            i = _handle_c(v, r, i)
        elif ch == "D":
            i = _handle_d(v, r, i)
        elif ch == "F":
            r.add("F")
            i += 2 if _char(v, i + 1) == "F" else 1
        elif ch == "G":
            i = _handle_g(v, r, i, slavo)
        elif ch == "H":
            # keep only if word-initial before a vowel or between vowels
            if ((i == 0 or _is_vowel(_char(v, i - 1)))
                    and _is_vowel(_char(v, i + 1))):
                r.add("H")
                i += 2
            else:
                i += 1
        elif ch == "J":
            i = _handle_j(v, r, i, slavo)
        elif ch == "K":
            r.add("K")
            i += 2 if _char(v, i + 1) == "K" else 1
        elif ch == "L":
            if _char(v, i + 1) == "L":
                if _condition_l0(v, i):
                    # Spanish "cabrillo", "gallegos": alternate drops the L
                    r.add_primary("L")
                else:
                    r.add("L")
                i += 2
            else:
                r.add("L")
                i += 1
        elif ch == "M":
            r.add("M")
            i += 2 if _condition_m0(v, i) else 1
        elif ch == "N":
            r.add("N")
            i += 2 if _char(v, i + 1) == "N" else 1
        elif ch == "Ñ":   # Ñ
            r.add("N")
            i += 1
        elif ch == "P":
            if _char(v, i + 1) == "H":
                r.add("F")
                i += 2
            else:
                r.add("P")
                i += 2 if _contains(v, i + 1, 1, "P", "B") else 1
        elif ch == "Q":
            r.add("K")
            i += 2 if _char(v, i + 1) == "Q" else 1
        elif ch == "R":
            # French final -ier/-ier: alternate only ("rogier" vs "hochmeier")
            if (i == n - 1 and not slavo
                    and _contains(v, i - 2, 2, "IE")
                    and not _contains(v, i - 4, 2, "ME", "MA")):
                r.add_alternate("R")
            else:
                r.add("R")
            i += 2 if _char(v, i + 1) == "R" else 1
        elif ch == "S":
            i = _handle_s(v, r, i, slavo)
        elif ch == "T":
            i = _handle_t(v, r, i)
        elif ch == "V":
            r.add("F")
            i += 2 if _char(v, i + 1) == "V" else 1
        elif ch == "W":
            i = _handle_w(v, r, i)
        elif ch == "X":
            if i == 0:
                r.add("S")
                i += 1
            else:
                # French final -eaux/-aux is silent ("breaux")
                if not (i == n - 1
                        and (_contains(v, i - 3, 3, "IAU", "EAU")
                             or _contains(v, i - 2, 2, "AU", "OU"))):
                    r.add("KS")
                i += 2 if _contains(v, i + 1, 1, "C", "X") else 1
        elif ch == "Z":
            if _char(v, i + 1) == "H":
                r.add("J")   # pinyin "zhao"
                i += 2
            else:
                if (_contains(v, i + 1, 2, "ZO", "ZI", "ZA")
                        or (slavo and i > 0 and _char(v, i - 1) != "T")):
                    r.add("S", "TS")
                else:
                    r.add("S")
                i += 2 if _char(v, i + 1) == "Z" else 1
        else:
            i += 1
    return "".join(r.primary), "".join(r.alternate)


def _condition_c0(v: str, i: int) -> bool:
    # Germanic -ach- pronounced K ("bacher", "macher") vs "chianti"
    if _contains(v, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_char(v, i - 2)):
        return False
    if not _contains(v, i - 1, 3, "ACH"):
        return False
    c = _char(v, i + 2)
    return (c != "I" and c != "E") or _contains(v, i - 2, 6,
                                                "BACHER", "MACHER")


def _handle_c(v: str, r: _Result, i: int) -> int:
    if _condition_c0(v, i):
        r.add("K")
        return i + 2
    if i == 0 and _contains(v, i, 6, "CAESAR"):
        r.add("S")
        return i + 2
    if _contains(v, i, 2, "CH"):
        return _handle_ch(v, r, i)
    if _contains(v, i, 2, "CZ") and not _contains(v, i - 2, 4, "WICZ"):
        r.add("S", "X")   # "Czerny"
        return i + 2
    if _contains(v, i + 1, 3, "CIA"):
        r.add("X")        # "focaccia"
        return i + 3
    if _contains(v, i, 2, "CC") and not (i == 1 and _char(v, 0) == "M"):
        return _handle_cc(v, r, i)   # double C, but not "McClellan"
    if _contains(v, i, 2, "CK", "CG", "CQ"):
        r.add("K")
        return i + 2
    if _contains(v, i, 2, "CI", "CE", "CY"):
        if _contains(v, i, 3, "CIO", "CIE", "CIA"):
            r.add("S", "X")   # Italian vs English
        else:
            r.add("S")
        return i + 2
    r.add("K")
    if _contains(v, i + 1, 2, " C", " Q", " G"):
        return i + 3      # "Mac Caffrey", "Mac Gregor"
    if (_contains(v, i + 1, 1, "C", "K", "Q")
            and not _contains(v, i + 1, 2, "CE", "CI")):
        return i + 2
    return i + 1


def _handle_cc(v: str, r: _Result, i: int) -> int:
    if (_contains(v, i + 2, 1, "I", "E", "H")
            and not _contains(v, i + 2, 2, "HU")):
        # "bellocchio" but not "bacchus"
        if ((i == 1 and _char(v, i - 1) == "A")
                or _contains(v, i - 1, 5, "UCCEE", "UCCES")):
            r.add("KS")   # "accident", "succeed"
        else:
            r.add("X")    # "bacci", "bertucci"
        return i + 3
    r.add("K")            # Pierce's rule
    return i + 2


def _condition_ch0(v: str, i: int) -> bool:
    # Greek roots at word start: "chemistry", "chorus", "chymera"
    if i != 0:
        return False
    if (not _contains(v, i + 1, 5, "HARAC", "HARIS")
            and not _contains(v, i + 1, 3, "HOR", "HYM", "HIA", "HEM")):
        return False
    return not _contains(v, 0, 5, "CHORE")


def _condition_ch1(v: str, i: int) -> bool:
    return ((_contains(v, 0, 4, "VAN ", "VON ") or _contains(v, 0, 3, "SCH"))
            or _contains(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _contains(v, i + 2, 1, "T", "S")
            or ((_contains(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
                and (_contains(v, i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                     or i + 1 == len(v) - 1)))


def _handle_ch(v: str, r: _Result, i: int) -> int:
    if i > 0 and _contains(v, i, 4, "CHAE"):
        r.add("K", "X")   # "Michael"
        return i + 2
    if _condition_ch0(v, i) or _condition_ch1(v, i):
        r.add("K")        # Greek / Germanic 'kh' sound
        return i + 2
    if i > 0:
        if _contains(v, 0, 2, "MC"):
            r.add("K")    # "McHugh"
        else:
            r.add("X", "K")
    else:
        r.add("X")
    return i + 2


def _handle_d(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "DG"):
        if _contains(v, i + 2, 1, "I", "E", "Y"):
            r.add("J")    # "edge"
            return i + 3
        r.add("TK")       # "Edgar"
        return i + 2
    if _contains(v, i, 2, "DT", "DD"):
        r.add("T")
        return i + 2
    r.add("T")
    return i + 1


def _handle_g(v: str, r: _Result, i: int, slavo: bool) -> int:
    nxt = _char(v, i + 1)
    if nxt == "H":
        return _handle_gh(v, r, i)
    if nxt == "N":
        if i == 1 and _is_vowel(_char(v, 0)) and not slavo:
            r.add("KN", "N")
        elif not _contains(v, i + 2, 2, "EY") and nxt != "Y" and not slavo:
            r.add("N", "KN")
        else:
            r.add("KN")
        return i + 2
    if _contains(v, i + 1, 2, "LI") and not slavo:
        r.add("KL", "L")   # "tagliaro"
        return i + 2
    if i == 0 and (nxt == "Y"
                   or _contains(v, i + 1, 2,
                                *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        r.add("K", "J")    # -ges-, -gep- etc. at word start
        return i + 2
    if ((_contains(v, i + 1, 2, "ER") or nxt == "Y")
            and not _contains(v, 0, 6, "DANGER", "RANGER", "MANGER")
            and not _contains(v, i - 1, 1, "E", "I")
            and not _contains(v, i - 1, 3, "RGY", "OGY")):
        r.add("K", "J")    # -ger-, -gy-
        return i + 2
    if (_contains(v, i + 1, 1, "E", "I", "Y")
            or _contains(v, i - 1, 4, "AGGI", "OGGI")):
        if (_contains(v, 0, 4, "VAN ", "VON ")
                or _contains(v, 0, 3, "SCH")
                or _contains(v, i + 1, 2, "ET")):
            r.add("K")     # obvious Germanic
        elif _contains(v, i + 1, 3, "IER"):
            r.add("J")
        else:
            r.add("J", "K")   # Italian "biaggi"
        return i + 2
    if nxt == "G":
        r.add("K")
        return i + 2
    r.add("K")
    return i + 1


def _handle_gh(v: str, r: _Result, i: int) -> int:
    if i > 0 and not _is_vowel(_char(v, i - 1)):
        r.add("K")
        return i + 2
    if i == 0:
        if _char(v, i + 2) == "I":
            r.add("J")     # "ghislane"
        else:
            r.add("K")     # "ghoti"
        return i + 2
    if ((i > 1 and _contains(v, i - 2, 1, "B", "H", "D"))
            or (i > 2 and _contains(v, i - 3, 1, "B", "H", "D"))
            or (i > 3 and _contains(v, i - 4, 1, "B", "H"))):
        return i + 2       # Parker's rule: silent gh ("hugh")
    if (i > 2 and _char(v, i - 1) == "U"
            and _contains(v, i - 3, 1, "C", "G", "L", "R", "T")):
        r.add("F")         # "laugh", "cough", "rough", "tough"
    elif i > 0 and _char(v, i - 1) != "I":
        r.add("K")
    return i + 2


def _handle_j(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _contains(v, i, 4, "JOSE") or _contains(v, 0, 4, "SAN "):
        # obvious Spanish: "Jose", "San Jacinto"
        if ((i == 0 and _char(v, i + 4) == " ") or len(v) == 4
                or _contains(v, 0, 4, "SAN ")):
            r.add("H")
        else:
            r.add("J", "H")
        return i + 1
    if i == 0:
        r.add("J", "A")    # "Yankelovich" / "Jankelowicz"
    elif (_is_vowel(_char(v, i - 1)) and not slavo
          and _char(v, i + 1) in ("A", "O")):
        r.add("J", "H")    # Spanish "bajador"
    elif i == len(v) - 1:
        r.add("J", " ")
    elif (not _contains(v, i + 1, 1, *_L_T_K_S_N_M_B_Z)
          and not _contains(v, i - 1, 1, "S", "K", "L")):
        r.add("J")
    return i + 2 if _char(v, i + 1) == "J" else i + 1


def _condition_l0(v: str, i: int) -> bool:
    if (i == len(v) - 3
            and _contains(v, i - 1, 4, "ILLO", "ILLA", "ALLE")):
        return True
    return ((_contains(v, len(v) - 2, 2, "AS", "OS")
             or _contains(v, len(v) - 1, 1, "A", "O"))
            and _contains(v, i - 1, 4, "ALLE"))


def _condition_m0(v: str, i: int) -> bool:
    if _char(v, i + 1) == "M":
        return True
    # "dumb", "thumb" (final or before -er)
    return (_contains(v, i - 1, 3, "UMB")
            and (i + 1 == len(v) - 1 or _contains(v, i + 2, 2, "ER")))


def _handle_s(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _contains(v, i - 1, 3, "ISL", "YSL"):
        return i + 1       # "island", "carlisle"
    if i == 0 and _contains(v, i, 5, "SUGAR"):
        r.add("X", "S")
        return i + 1
    if _contains(v, i, 2, "SH"):
        if _contains(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.add("S")     # Germanic
        else:
            r.add("X")
        return i + 2
    if _contains(v, i, 3, "SIO", "SIA") or _contains(v, i, 4, "SIAN"):
        if slavo:
            r.add("S")
        else:
            r.add("S", "X")
        return i + 3
    if ((i == 0 and _contains(v, i + 1, 1, "M", "N", "L", "W"))
            or _contains(v, i + 1, 1, "Z")):
        # "smith" matches "schmidt"; Slavic -sz-
        r.add("S", "X")
        return i + 2 if _contains(v, i + 1, 1, "Z") else i + 1
    if _contains(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if i == len(v) - 1 and _contains(v, i - 2, 2, "AI", "OI"):
        r.add_alternate("S")   # French "resnais", "artois"
    else:
        r.add("S")
    return i + 2 if _contains(v, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(v: str, r: _Result, i: int) -> int:
    if _char(v, i + 2) == "H":
        # Schlesinger's rule
        if _contains(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(v, i + 3, 2, "ER", "EN"):
                r.add("X", "SK")   # "schermerhorn", "schenker"
            else:
                r.add("SK")        # Dutch "school", "schooner"
        elif (i == 0 and not _is_vowel(_char(v, 3))
                and _char(v, 3) != "W"):
            r.add("X", "S")
        else:
            r.add("X")
    elif _contains(v, i + 2, 1, "I", "E", "Y"):
        r.add("S")
    else:
        r.add("SK")
    return i + 3


def _handle_t(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 4, "TION"):
        r.add("X")
        return i + 3
    if _contains(v, i, 3, "TIA", "TCH"):
        r.add("X")
        return i + 3
    if _contains(v, i, 2, "TH") or _contains(v, i, 3, "TTH"):
        if (_contains(v, i + 2, 2, "OM", "AM")
                or _contains(v, 0, 4, "VAN ", "VON ")
                or _contains(v, 0, 3, "SCH")):
            r.add("T")     # "thomas", "thames", Germanic
        else:
            r.add("0", "T")
        return i + 2
    r.add("T")
    return i + 2 if _contains(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "WR"):
        r.add("R")
        return i + 2
    if i == 0 and (_is_vowel(_char(v, i + 1)) or _contains(v, i, 2, "WH")):
        if _is_vowel(_char(v, i + 1)):
            r.add("A", "F")   # "Wasserman" matches "Vasserman"
        else:
            r.add("A")        # "Uomo" matches "Womo"
        return i + 1
    if ((i == len(v) - 1 and _is_vowel(_char(v, i - 1)))
            or _contains(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or _contains(v, 0, 3, "SCH")):
        r.add_alternate("F")  # "Arnow" matches "Arnoff"
        return i + 1
    if _contains(v, i, 4, "WICZ", "WITZ"):
        r.add("TS", "FX")     # Polish "Filipowicz"
        return i + 4
    return i + 1


def double_metaphone_filter(tokens: list[Token], max_code_len: int = 4,
                            inject: bool = True) -> list[Token]:
    """``DoubleMetaphoneFilter.incrementToken`` emission semantics:
    primary emitted when non-empty and != original; alternate
    additionally emitted when != primary; empty encodings pass the
    original through."""
    out: list[Token] = []
    for t in tokens:
        if not t.term:
            out.append(t)
            continue
        primary, alternate = double_metaphone(t.term, max_code_len)
        emitted = False
        if inject:
            out.append(t)
        if primary and primary != t.term:
            out.append(Token(primary, t.pos, t.start, t.end))
            emitted = True
            if alternate and alternate != primary:
                out.append(Token(alternate, t.pos, t.start, t.end))
        if not inject and not emitted:
            out.append(t)
    return out


def ws_dmetaphone_analyze(text: str):
    """Whitespace → lowercase → DoubleMetaphoneFilter(4, inject=True):
    spelling variants conflate through the shared code pair ("smith" /
    "schmidt" meet at XMT).  Registered as analyzer ``"ws_dmetaphone"``."""
    from .tokenizer import _WS_RE

    toks: list[Token] = []
    pos = -1
    for m in _WS_RE.finditer(text):
        pos += 1
        toks.append(Token(m.group(0).lower(), pos, m.start(), m.end()))
    return double_metaphone_filter(toks, max_code_len=4, inject=True)


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("ws_dmetaphone", ws_dmetaphone_analyze)


_register()
