"""Dutch Snowball stemmer — the reference's ``SnowballFilter(...,
"Dutch")`` (``org/tartarus/snowball/ext/DutchStemmer.java``).
Re-derived from the published algorithm description
(snowballstem.org/algorithms/dutch/stemmer.html).

Validated bit-exact against the reference's full Dutch test vocabulary
(``TestSnowballVocabData.zip dutch/voc.txt|output.txt``, 0 mismatches;
see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["dutch_snowball_stem"]

_VOWELS = frozenset("aeiouyè")

_ACCENT_MAP = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _r12(w: str) -> tuple[int, int]:
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r1 = max(r1, 3)
    r2 = len(w)
    # R2 computed from the UNADJUSTED R1 would differ; the Dutch stemmer
    # computes R2 after R1 in the usual way (before the min-3 adjustment
    # R1 may be < 3, but R2's scan starts from the true R1)
    true_r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            true_r1 = i + 1
            break
    for i in range(true_r1 + 1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def _valid_en_ending(w: str, cut: int) -> bool:
    # a non-vowel, and not the string gem, immediately before the suffix
    if cut < 1 or w[cut - 1] in _VOWELS:
        return False
    return w[max(0, cut - 3): cut] != "gem"


@lru_cache(maxsize=65536)
def dutch_snowball_stem(word: str) -> str:
    w = word.translate(_ACCENT_MAP)
    # mark y/Y and intervocalic i
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
        elif chars[i] == "i" and i + 1 < len(chars) \
                and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "I"
    w = "".join(chars)

    r1, r2 = _r12(w)
    e_removed = False

    # step 1
    if w.endswith("heden"):
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    elif w.endswith("ene") or w.endswith("en"):
        suf = "ene" if w.endswith("ene") else "en"
        cut = len(w) - len(suf)
        if cut >= r1 and _valid_en_ending(w, cut):
            w = _undouble(w[:cut])
    elif w.endswith("se") or w.endswith("s"):
        suf = "se" if w.endswith("se") else "s"
        cut = len(w) - len(suf)
        if cut >= r1 and cut >= 1 and w[cut - 1] not in _VOWELS \
                and w[cut - 1] != "j":
            w = w[:cut]

    # step 2: e in R1 preceded by non-vowel
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] not in _VOWELS:
        w = _undouble(w[:-1])
        e_removed = True

    # step 3a: heid
    if w.endswith("heid") and len(w) - 4 >= r2 \
            and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            cut = len(w) - 2
            if cut >= r1 and _valid_en_ending(w, cut):
                w = _undouble(w[:cut])

    # step 3b: d-suffixes
    if w.endswith("end") or w.endswith("ing"):
        if len(w) - 3 >= r2:
            w = w[:-3]
            if w.endswith("ig") and len(w) - 2 >= r2 \
                    and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif w.endswith("ig"):
        if len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith("lijk"):
        if len(w) - 4 >= r2:
            w = w[:-4]
            # repeat step 2
            if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
                    and w[-2] not in _VOWELS:
                w = _undouble(w[:-1])
    elif w.endswith("baar"):
        if len(w) - 4 >= r2:
            w = w[:-4]
    elif w.endswith("bar"):
        if len(w) - 3 >= r2 and e_removed:
            w = w[:-3]

    # step 4: undouble vowel — C v v D (D a non-vowel other than I)
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if c not in _VOWELS and d not in _VOWELS and d != "I" \
                and v1 == v2 and v1 in ("a", "e", "o", "u"):
            w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")
