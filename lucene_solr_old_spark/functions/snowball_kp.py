"""Kraaij-Pohlmann Dutch stemmer — the reference's ``SnowballFilter(...,
"Kp")`` (``org/tartarus/snowball/ext/KpStemmer.java``).  Re-derived from
the published algorithm (Kraaij & Pohlmann 1994, "Porter's stemming
algorithm for Dutch") as encoded by the snowball automaton: the C*V+C
measure (with ``ij`` as one vowel unit), steps 1-4/7, the ge- prefix and
infix removal with re-measuring and step 1c, the conditional undouble
(step 6, including v->f / z->s), vowel lengthening, and the y/Y
marking.

Validated bit-exact against the reference's full KP test vocabulary
(``TestSnowballVocabData.zip kraaij_pohlmann/voc.txt|output.txt``,
0 mismatches; see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["kp_stem"]

_V = frozenset("aeiouy")
_V_WX = frozenset("aeiouywx")
_AOU = frozenset("aou")
_AIOU = frozenset("aiou")


def _measure(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    cnt = 0
    while i < n:
        if w.startswith("ij", i):
            i += 2
        elif w[i] in _V:
            i += 1
        else:
            break
        cnt += 1
    if cnt < 1 or i >= n or w[i] in _V:
        return p1, p2
    i += 1
    p1 = i
    while i < n and w[i] not in _V:
        i += 1
    cnt = 0
    while i < n:
        if w.startswith("ij", i):
            i += 2
        elif w[i] in _V:
            i += 1
        else:
            break
        cnt += 1
    if cnt < 1 or i >= n or w[i] in _V:
        return p1, p2
    p2 = i + 1
    return p1, p2


def _ends_V(s: str) -> bool:
    return bool(s) and (s[-1] in _V or s.endswith("ij"))


def _ends_VX(s: str) -> bool:
    return len(s) >= 2 and _ends_V(s[:-1])


def _ends_C(s: str) -> bool:
    return bool(s) and not s.endswith("ij") and s[-1] not in _V


def _lengthen(s: str) -> str:
    """Vowel lengthening at the end of ``s`` (lop -> loop)."""
    if not s or s[-1] in _V_WX:
        return s
    if len(s) < 2:
        return s
    v = s[-2]
    if v in _AOU:
        if len(s) == 2 or s[-3] not in _V:
            return s[:-1] + v + s[-1]
        return s
    if v == "e":
        if not (len(s) == 2 or s[-3] not in _V):
            return s
        if len(s) >= 4 and s[-4] in _AIOU:
            return s
        if len(s) >= 6 and s[-5] in _AIOU and s[-6] not in _V:
            return s
        return s[:-1] + "e" + s[-1]
    return s


@lru_cache(maxsize=65536)
def kp_stem(word: str) -> str:
    # prelude: initial y and y-after-vowel become consonant Y
    y_found = False
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _V:
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)

    p1, p2 = _measure(w)
    stemmed = False

    def R1(cut: int) -> bool:
        return cut >= p1

    def R2(cut: int) -> bool:
        return cut >= p2

    # ---- step 1 -----------------------------------------------------------
    for suf in ("'s", "ies", "aus", "nde", "es", "en", "s"):
        if not w.endswith(suf):
            continue
        cut = len(w) - len(suf)
        stem = w[:cut]
        if suf == "'s":
            w = stem
            stemmed = True
        elif suf == "s":
            if R1(cut) and not (stem.endswith("t") and R1(cut - 1)) \
                    and _ends_C(stem):
                w = stem
                stemmed = True
        elif suf == "ies":
            if R1(cut):
                w = stem + "ie"
                stemmed = True
        elif suf == "es":
            if stem.endswith("ar") and R1(cut - 2) \
                    and _ends_C(stem[:-2]):
                w = _lengthen(stem[:-2])
                stemmed = True
            elif stem.endswith("er") and R1(cut - 2) \
                    and _ends_C(stem[:-2]):
                w = stem[:-2]
                stemmed = True
            elif R1(cut) and _ends_C(stem):
                w = stem + "e"
                stemmed = True
        elif suf == "aus":
            if R1(cut) and _ends_V(stem):
                w = stem + "au"
                stemmed = True
        elif suf == "en":
            if stem.endswith("hed") and R1(cut - 3):
                w = stem[:-3] + "heid"
                stemmed = True
            elif stem.endswith("nd"):
                w = stem
                stemmed = True
            elif stem.endswith("d") and R1(cut - 1) \
                    and _ends_C(stem[:-1]):
                w = stem[:-1]
                stemmed = True
            elif (stem.endswith("i") or stem.endswith("j")) \
                    and _ends_V(stem[:-1]):
                w = stem
                stemmed = True
            elif R1(cut) and _ends_C(stem):
                w = _lengthen(stem)
                stemmed = True
        elif suf == "nde":
            w = stem + "nd"
            stemmed = True
        break

    # ---- step 2 -----------------------------------------------------------
    for suf in ("ische", "lijke", "ieve", "ene", "de", "ge", "je",
                "le", "re", "se", "te"):
        if not w.endswith(suf):
            continue
        cut = len(w) - len(suf)
        stem = w[:cut]
        if suf == "je":
            if stem.endswith("'t"):
                w = stem[:-2]
                stemmed = True
            elif stem.endswith("et") and R1(cut - 2) \
                    and _ends_C(stem[:-2]):
                w = stem[:-2]
                stemmed = True
            elif stem.endswith("rnt"):
                w = stem[:-3] + "rn"
                stemmed = True
            elif stem.endswith("t") and R1(cut - 1) \
                    and _ends_VX(stem[:-1]):
                w = stem[:-1]
                stemmed = True
            elif stem.endswith("ink"):
                w = stem[:-3] + "ing"
                stemmed = True
            elif stem.endswith("mp"):
                w = stem[:-2] + "m"
                stemmed = True
            elif stem.endswith("'") and R1(cut - 1):
                w = stem[:-1]
                stemmed = True
            elif R1(cut) and _ends_C(stem):
                w = stem
                stemmed = True
        elif suf == "ge":
            if R1(cut):
                w = stem + "g"
                stemmed = True
        elif suf == "lijke":
            if R1(cut):
                w = stem + "lijk"
                stemmed = True
        elif suf == "ische":
            if R1(cut):
                w = stem + "isch"
                stemmed = True
        elif suf == "de":
            if R1(cut) and _ends_C(stem):
                w = stem
                stemmed = True
        elif suf == "te":
            if R1(cut):
                w = stem + "t"
                stemmed = True
        elif suf == "se":
            if R1(cut):
                w = stem + "s"
                stemmed = True
        elif suf == "re":
            if R1(cut):
                w = stem + "r"
                stemmed = True
        elif suf == "le":
            # 'attach' leaves the cursor AFTER the inserted l, so the
            # lengthening sees stem+l (alle -> all -> al via undouble)
            if R1(cut):
                w = _lengthen(stem + "l")
                stemmed = True
        elif suf == "ene":
            if R1(cut) and _ends_C(stem):
                w = _lengthen(stem + "en")
                stemmed = True
        elif suf == "ieve":
            if R1(cut) and _ends_C(stem):
                w = stem + "ief"
                stemmed = True
        break

    # ---- step 3 -----------------------------------------------------------
    for suf in ("iteit", "atie", "isme", "arij", "erij", "heid",
                "rder", "ster", "fie", "gie", "sel", "dst", "tst",
                "ing"):
        if not w.endswith(suf):
            continue
        cut = len(w) - len(suf)
        stem = w[:cut]
        if suf == "atie":
            if R1(cut):
                w = stem + "eer"
                stemmed = True
        elif suf == "iteit":
            if R1(cut):
                w = _lengthen(stem)
                stemmed = True
        elif suf in ("heid", "sel", "ster"):
            if R1(cut):
                w = stem
                stemmed = True
        elif suf == "rder":
            w = stem + "r"
            stemmed = True
        elif suf in ("isme", "erij", "ing"):
            if R1(cut):
                w = _lengthen(stem)
                stemmed = True
        elif suf == "arij":
            if R1(cut) and _ends_C(stem):
                w = stem + "aar"
                stemmed = True
        elif suf == "fie":
            if R2(cut):
                w = _lengthen(stem + "f")
                stemmed = True
        elif suf == "gie":
            if R2(cut):
                w = _lengthen(stem + "g")
                stemmed = True
        elif suf == "tst":
            if R1(cut) and _ends_C(stem):
                w = stem + "t"
                stemmed = True
        elif suf == "dst":
            if R1(cut) and _ends_C(stem):
                w = stem + "d"
                stemmed = True
        break

    # ---- step 4 -----------------------------------------------------------
    done4 = False
    for suf in ("achtiger", "achtigst", "eriger", "erigst", "achtig",
                "ioneel", "atief", "lijker", "lijkst", "baar",
                "laar", "naar", "raar", "tant", "erig", "end"):
        if not w.endswith(suf):
            continue
        cut = len(w) - len(suf)
        stem = w[:cut]
        if suf == "ioneel":
            if R1(cut):
                w = stem + "ie"
                done4 = stemmed = True
        elif suf == "atief":
            if R1(cut):
                w = stem + "eer"
                done4 = stemmed = True
        elif suf == "baar":
            if R1(cut):
                w = stem
                done4 = stemmed = True
        elif suf == "naar":
            if R1(cut) and _ends_V(stem):
                w = stem + "n"
                done4 = stemmed = True
        elif suf == "laar":
            if R1(cut) and _ends_V(stem):
                w = stem + "l"
                done4 = stemmed = True
        elif suf == "raar":
            if R1(cut) and _ends_V(stem):
                w = stem + "r"
                done4 = stemmed = True
        elif suf == "tant":
            if R1(cut):
                w = stem + "teer"
                done4 = stemmed = True
        elif suf in ("lijker", "lijkst"):
            if R1(cut):
                w = stem + "lijk"
                done4 = stemmed = True
        elif suf in ("achtig", "achtiger", "achtigst"):
            if R1(cut):
                w = stem
                done4 = stemmed = True
        elif suf in ("end", "erig", "eriger", "erigst"):
            if R1(cut) and _ends_C(stem):
                w = _lengthen(stem)
                done4 = stemmed = True
        break
    if not done4:
        for suf in ("iger", "igst", "ig"):
            if w.endswith(suf):
                cut = len(w) - len(suf)
                stem = w[:cut]
                if R1(cut) and _ends_C(stem):
                    w = _lengthen(stem)
                    stemmed = True
                break

    # ---- ge- prefix / infix removal + step 1c -----------------------------
    def step_1c(w: str) -> str:
        for suf in ("d", "t"):
            if not w.endswith(suf):
                continue
            cut = len(w) - 1
            stem = w[:cut]
            if not (R1(cut) and _ends_C(stem)):
                break
            if suf == "d" and stem.endswith("n") and R1(cut - 1):
                break
            if suf == "t" and stem.endswith("h") and R1(cut - 1):
                break
            return stem
        return w

    ge_removed = False
    if w.startswith("ge") and len(w) >= 5:
        rest = w[2:]
        i = 0
        while i < len(rest) and rest[i] not in _V:
            i += 1
        j = i
        while j < len(rest) and rest[j] in _V:
            j += 1
        if i < len(rest) and j < len(rest):
            w = rest
            ge_removed = True
            p1, p2 = _measure(w)
    if ge_removed:
        w = step_1c(w)

    ge_removed = False
    pos = w.find("ge", 1)
    if pos != -1 and pos + 2 + 3 <= len(w):
        rest_start = pos + 2
        i = rest_start
        while i < len(w) and w[i] not in _V:
            i += 1
        j = i
        while j < len(w) and w[j] in _V:
            j += 1
        if i < len(w) and j < len(w):
            w = w[:pos] + w[pos + 2:]
            ge_removed = True
            p1, p2 = _measure(w)
    if ge_removed:
        w = step_1c(w)

    # ---- step 7 -----------------------------------------------------------
    if w.endswith("kt"):
        w = w[:-2] + "k"
        stemmed = True
    elif w.endswith("ft"):
        w = w[:-2] + "f"
        stemmed = True
    elif w.endswith("pt"):
        w = w[:-2] + "p"
        stemmed = True

    # ---- step 6: undouble (only if something was stemmed or an infix ge
    # was removed) ----------------------------------------------------------
    if stemmed or ge_removed:
        for dbl in ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk",
                    "ll", "mm", "nn", "pp", "qq", "rr", "ss", "tt",
                    "vv", "ww", "xx", "zz"):
            if w.endswith(dbl):
                w = w[:-1]
                break
        else:
            if w.endswith("v"):
                w = w[:-1] + "f"
            elif w.endswith("z"):
                w = w[:-1] + "s"

    if y_found:
        w = w.replace("Y", "y")
    return w
