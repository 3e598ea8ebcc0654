"""Finnish Snowball stemmer — the reference's ``SnowballFilter(...,
"Finnish")`` (``org/tartarus/snowball/ext/FinnishStemmer.java``, the
``FinnishAnalyzer`` default).  Re-derived from the published algorithm
description plus the generated automaton's exact semantics:

  * the case-ending among is limited to R1 and entries with ATTACHED
    conditions (``seen``/``den``/``tten``/``siin`` with r_LONG / r_VI)
    fall back to their parent entry (``n``) when the condition fails —
    switch-case conditions (the hXn vowel match, the cv check on a/ä)
    are hard failures with no fallback;
  * the 'n' case deletes one extra character when preceded by a long
    vowel or ``ie``;
  * tidying requires BOTH characters of the long-vowel / cX / oj-uj /
    jo patterns to sit inside R1, while the final undouble is
    unrestricted.

Validated bit-exact against the reference's full Finnish test vocabulary
(``TestSnowballVocabData.zip finnish/voc.txt|output.txt`` — 50,000
pairs, 0 mismatches; see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["finnish_snowball_stem"]

_V1 = frozenset("aeiouyäö")
_V2 = frozenset("aeiouäö")
_AEI = frozenset("aeiä")
_PARTICLE_END = _V1 | frozenset("nt")
_LONG_V = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_STEP3_PLAIN = ("lla", "llä", "ssa", "ssä", "sta", "stä", "lta",
                "ltä", "lle", "ine", "ksi", "na", "nä", "ta", "tä")
_STEP3_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
              "hän": "ä", "hön": "ö"}


def _r1_r2(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _V1 and w[i - 1] in _V1:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _V1 and w[i - 1] in _V1:
            r2 = i + 1
            break
    return r1, r2


@lru_cache(maxsize=65536)
def finnish_snowball_stem(word: str) -> str:
    w = word
    r1, r2 = _r1_r2(w)

    # ---- step 1: particles (among limited to R1) --------------------------
    for suf in ("kaan", "kään", "sti", "kin", "han", "hän", "ko",
                "kö", "pa", "pä"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            cut = len(w) - len(suf)
            if suf == "sti":
                if cut >= r2:
                    w = w[:cut]
            elif cut >= 1 and w[cut - 1] in _PARTICLE_END:
                w = w[:cut]
            break

    # ---- step 2: possessives (among limited to R1) ------------------------
    for suf in ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än",
                "en"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            cut = len(w) - len(suf)
            if suf == "si":
                if cut >= 1 and w[cut - 1] != "k":
                    w = w[:cut]
            elif suf == "ni":
                w = w[:cut]
                if w.endswith("kse"):
                    w = w[:-1] + "i"
            elif suf == "an":
                if any(w[:cut].endswith(p)
                       for p in ("ta", "ssa", "sta", "lla", "lta", "na")):
                    w = w[:cut]
            elif suf == "än":
                if any(w[:cut].endswith(p)
                       for p in ("tä", "ssä", "stä", "llä", "ltä", "nä")):
                    w = w[:cut]
            elif suf == "en":
                if any(w[:cut].endswith(p) for p in ("lle", "ine")):
                    w = w[:cut]
            else:
                w = w[:cut]
            break

    # ---- step 3: case endings ---------------------------------------------
    ended = False
    cands = (list(_STEP3_HXN) + ["siin", "tten", "seen", "den", "tta",
                                 "ttä", "n", "a", "ä"]
             + list(_STEP3_PLAIN))
    sel = None
    for suf in sorted(cands, key=len, reverse=True):
        if not (w.endswith(suf) and len(w) - len(suf) >= r1):
            continue
        cut = len(w) - len(suf)
        if suf in ("siin", "tten", "den"):
            # attached r_VI: i + V2 vowel before, WITHIN R1 — a miss
            # falls back to a shorter entry ('n')
            if cut >= 2 and cut - 2 >= r1 and w[cut - 1] == "i" \
                    and w[cut - 2] in _V2:
                sel = suf
                break
            continue
        if suf == "seen":
            # attached r_LONG, within R1 — falls back on miss
            if cut >= 2 and cut - 2 >= r1 and w[cut - 2: cut] in _LONG_V:
                sel = suf
                break
            continue
        sel = suf
        break
    if sel:
        cut = len(w) - len(sel)
        if sel in _STEP3_HXN:                      # hard condition
            if cut >= 1 and w[cut - 1] == _STEP3_HXN[sel]:
                w = w[:cut]
                ended = True
        elif sel in ("tta", "ttä"):                # hard condition
            if cut >= 1 and w[cut - 1] == "e":
                w = w[:cut]
                ended = True
        elif sel in ("a", "ä"):                    # hard cv condition
            if cut >= 2 and w[cut - 1] in _V1 and w[cut - 2] not in _V1:
                w = w[:cut]
                ended = True
        elif sel == "n":
            w = w[:cut]
            ended = True
            if w[-2:] in _LONG_V or w.endswith("ie"):
                w = w[:-1]
        else:
            w = w[:cut]
            ended = True

    # ---- step 4: other endings (among limited to R2) ----------------------
    for suf in sorted(("impi", "impa", "impä", "immi", "imma", "immä",
                       "mpi", "mpa", "mpä", "mmi", "mma", "mmä",
                       "eja", "ejä"), key=len, reverse=True):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä") \
                    and w[: -len(suf)].endswith("po"):
                break                              # hard po condition
            w = w[: -len(suf)]
            break

    # ---- step 5: plurals --------------------------------------------------
    if ended:
        if (w.endswith("i") or w.endswith("j")) and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if w.endswith("t") and len(w) - 1 >= r1 and len(w) >= 2 \
                and w[-2] in _V1:
            w = w[:-1]
            for suf in ("imma", "mma"):
                if w.endswith(suf) and len(w) - len(suf) >= r2:
                    if suf == "mma" and w[: -len(suf)].endswith("po"):
                        break
                    w = w[: -len(suf)]
                    break

    # ---- step 6: tidying --------------------------------------------------
    if len(w) - 2 >= r1 and w[-2:] in _LONG_V:
        w = w[:-1]
    if len(w) - 2 >= r1 and w[-1] in _AEI and w[-2] not in _V1:
        w = w[:-1]
    if len(w) - 2 >= r1 and w.endswith(("oj", "uj")):
        w = w[:-1]
    if len(w) - 2 >= r1 and w.endswith("jo"):
        w = w[:-1]
    # undouble a final double consonant followed by zero or more vowels
    # (unrestricted by regions)
    i = len(w) - 1
    while i >= 0 and w[i] in _V1:
        i -= 1
    if i >= 1 and w[i] not in _V1 and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w
