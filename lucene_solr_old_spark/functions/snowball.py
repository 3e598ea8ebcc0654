"""Scandinavian Snowball stemmers — the algorithms behind the
reference's ``SnowballFilter(..., "Danish"/"Swedish"/"Norwegian")``
(``org/tartarus/snowball/ext/{Danish,Swedish,Norwegian}Stemmer.java``,
machine-generated from the public ``.sbl`` sources).  Re-derived from
the published algorithm descriptions (snowballstem.org), not from the
generated Java.

Semantics note: these stemmers' ``among`` blocks run under ``setlimit
tomark p1`` — the match is the longest suffix that lies ENTIRELY within
R1 (a longer whole-word suffix poking out of R1 does not block a shorter
in-region one), unlike English Porter2 where region membership is a
post-condition.

Each stemmer is validated bit-exact against the reference's FULL test
vocabulary in ``TestSnowballVocabData.zip`` (danish 23,829 / swedish
30,623 / norwegian 20,628 pairs, 0 mismatches; see
tests/test_snowball.py).

All three share the Scandinavian region rule: R1 as usual, adjusted so
at least 3 letters precede it.
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["danish_snowball_stem", "swedish_snowball_stem",
           "norwegian_snowball_stem"]


def _r1_min3(word: str, vowels: frozenset) -> int:
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    return max(r1, 3)


def _longest_in_r1(w: str, r1: int, sufs) -> str | None:
    """The setlimit-among match: longest suffix that fits inside R1."""
    for suf in sufs:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            return suf
    return None


def _bylen(sufs) -> list[str]:
    return sorted(sufs, key=len, reverse=True)


# ---------------------------------------------------------------------------
# Danish (snowballstem.org/algorithms/danish/stemmer.html)
# ---------------------------------------------------------------------------

_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP1 = _bylen(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
     "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
     "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
     "hedens", "erens", "ers", "ets", "erets", "et", "eret", "s"])
_DA_STEP2 = _bylen(["gd", "dt", "gt", "kt"])
_DA_STEP3 = _bylen(["ig", "lig", "elig", "els", "løst"])


def _da_step2(w: str, r1: int) -> str:
    if _longest_in_r1(w, r1, _DA_STEP2):
        return w[:-1]
    return w


@lru_cache(maxsize=65536)
def danish_snowball_stem(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _DA_VOWELS)
    suf = _longest_in_r1(w, r1, _DA_STEP1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _DA_S_ENDING:
            w = w[:-1]
    elif suf:
        w = w[: -len(suf)]
    w = _da_step2(w, r1)
    if w.endswith("igst"):
        w = w[:-2]
    suf = _longest_in_r1(w, r1, _DA_STEP3)
    if suf == "løst":
        w = w[:-1]
    elif suf:
        w = w[: -len(suf)]
        w = _da_step2(w, r1)
    # step 4 (undouble): final consonant within R1 equal to its neighbor
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and len(w) - 1 >= r1:
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Swedish (snowballstem.org/algorithms/swedish/stemmer.html)
# ---------------------------------------------------------------------------

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_STEP1 = _bylen(
    ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
     "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
     "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
     "ast", "s"])
_SV_STEP2 = _bylen(["dd", "gd", "nn", "dt", "gt", "kt", "tt"])
_SV_STEP3 = _bylen(["lig", "ig", "els", "löst", "fullt"])


@lru_cache(maxsize=65536)
def swedish_snowball_stem(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _SV_VOWELS)
    suf = _longest_in_r1(w, r1, _SV_STEP1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _SV_S_ENDING:
            w = w[:-1]
    elif suf:
        w = w[: -len(suf)]
    if _longest_in_r1(w, r1, _SV_STEP2):
        w = w[:-1]
    suf = _longest_in_r1(w, r1, _SV_STEP3)
    if suf in ("löst", "fullt"):
        w = w[:-1]
    elif suf:
        w = w[: -len(suf)]
    return w


# ---------------------------------------------------------------------------
# Norwegian (snowballstem.org/algorithms/norwegian/stemmer.html)
# ---------------------------------------------------------------------------

_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP1 = _bylen(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
     "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "anes",
     "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
     "ast", "s", "erte", "ert"])
_NO_STEP2 = _bylen(["dt", "vt"])
_NO_STEP3 = _bylen(["leg", "eleg", "ig", "eig", "lig", "elig", "els",
                    "lov", "elov", "slov", "hetslov"])


@lru_cache(maxsize=65536)
def norwegian_snowball_stem(word: str) -> str:
    w = word
    r1 = _r1_min3(w, _NO_VOWELS)
    suf = _longest_in_r1(w, r1, _NO_STEP1)
    if suf == "s":
        prev = w[-2] if len(w) >= 2 else ""
        if prev in _NO_S_ENDING or (
                prev == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS)):
            w = w[:-1]
    elif suf in ("erte", "ert"):
        w = w[: -len(suf)] + "er"
    elif suf:
        w = w[: -len(suf)]
    if _longest_in_r1(w, r1, _NO_STEP2):
        w = w[:-1]
    suf = _longest_in_r1(w, r1, _NO_STEP3)
    if suf:
        w = w[: -len(suf)]
    return w
