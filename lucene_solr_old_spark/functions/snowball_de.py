"""German Snowball stemmer — the reference's ``SnowballFilter(...,
"German")`` (``org/tartarus/snowball/ext/GermanStemmer.java``).
Re-derived from the published algorithm description
(snowballstem.org/algorithms/german/stemmer.html).

Validated bit-exact against the reference's full German test vocabulary
(``TestSnowballVocabData.zip german/voc.txt|output.txt``, 0 mismatches;
see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["german_snowball_stem", "german2_snowball_stem"]

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")

_UMLAUT = str.maketrans("äöü", "aou")


@lru_cache(maxsize=65536)
def german_snowball_stem(word: str) -> str:
    w = word.replace("ß", "ss")
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    return _german_steps("".join(chars))


def _german_steps(w: str) -> str:
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r1 = max(r1, 3)
    r2 = len(w)
    true_r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            true_r1 = i + 1
            break
    for i in range(true_r1 + 1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break

    def fits_r1(suf):
        return len(w) - len(suf) >= r1

    # step 1 (longest among, suffix inside R1)
    for suf in ("ern", "em", "er"):
        if w.endswith(suf) and fits_r1(suf):
            w = w[: -len(suf)]
            break
    else:
        # NOTE: the shipped (old) snowball revision has no "niss" fix —
        # GermanStemmer.java's among deletes e/en/es with no follow-up
        for suf in ("en", "es", "e"):
            if w.endswith(suf) and fits_r1(suf):
                w = w[: -len(suf)]
                break
        else:
            if w.endswith("s") and fits_r1("s") and len(w) >= 2 \
                    and w[-2] in _S_ENDING:
                w = w[:-1]

    # step 2
    for suf in ("est", "en", "er"):
        if w.endswith(suf) and fits_r1(suf):
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("st") and fits_r1("st") and len(w) >= 6 \
                and w[-3] in _ST_ENDING:
            w = w[:-2]

    # step 3 (d-suffixes, R2)
    def fits_r2(suf):
        return len(w) - len(suf) >= r2

    for suf in ("end", "ung"):
        if w.endswith(suf):
            if fits_r2(suf):
                w = w[: -len(suf)]
                if w.endswith("ig") and len(w) - 2 >= r2 \
                        and (len(w) < 3 or w[-3] != "e"):
                    w = w[:-2]
            break
    else:
        for suf in ("isch", "ig", "ik"):
            if w.endswith(suf):
                if fits_r2(suf) and (len(w) < len(suf) + 1
                                     or w[-len(suf) - 1] != "e"):
                    w = w[: -len(suf)]
                break
        else:
            for suf in ("lich", "heit"):
                if w.endswith(suf):
                    if fits_r2(suf):
                        w = w[: -len(suf)]
                        for p in ("er", "en"):
                            if w.endswith(p) and len(w) - 2 >= r1:
                                w = w[:-2]
                                break
                    break
            else:
                if w.endswith("keit"):
                    if fits_r2("keit"):
                        w = w[:-4]
                        for p in ("lich", "ig"):
                            if w.endswith(p) and len(w) - len(p) >= r2:
                                w = w[: -len(p)]
                                break

    return w.replace("U", "u").replace("Y", "y").translate(_UMLAUT)


def _german2_prelude(w: str) -> str:
    """German2 variant prelude: intervocalic u/y marking first (so an
    after-vowel 'ue' is already 'Ue' and never folds), then a
    left-to-right folding pass ae->ä, oe->ö, ue->ü, with 'qu' protecting
    itself plus the two following characters."""
    # pass 1: intervocalic u/y marking on the raw string (the reference
    # runs this BEFORE the folding pass)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    # pass 2: fold ae/oe/ue; 'qu' hops the match PLUS the next two chars
    # (German2Stemmer.java r_prelude case 5: cursor already sits after
    # 'qu' and hop 2 skips two more — 'quae' stays 'quae')
    out: list[str] = []
    i = 0
    n = len(w)
    while i < n:
        two = w[i: i + 2]
        if two == "ae":
            out.append("ä")
            i += 2
        elif two == "oe":
            out.append("ö")
            i += 2
        elif two == "ue":
            out.append("ü")
            i += 2
        elif two == "qu":
            out.append(w[i: i + 4])
            i += 4
        elif w[i] == "ß":
            out.append("ss")
            i += 1
        else:
            out.append(w[i])
            i += 1
    return "".join(out)


@lru_cache(maxsize=65536)
def german2_snowball_stem(word: str) -> str:
    """The "German2" snowball variant: like :func:`german_snowball_stem`
    but the prelude also folds the ae/oe/ue umlaut spellings."""
    return _german_steps(_german2_prelude(word))
