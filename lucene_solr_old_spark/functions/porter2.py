"""English Snowball stemmer ("Porter2") — the algorithm behind the
reference's ``SnowballFilter(..., "English")``
(``lucene/analysis/common/src/java/org/tartarus/snowball/ext/
EnglishStemmer.java``, machine-generated from the public Snowball
``english.sbl``).  Re-derived here from the published algorithm
description (snowballstem.org/algorithms/english/stemmer.html), not from
the generated Java.

Validated bit-exact against the reference's full English test vocabulary
(``TestSnowballVocabData.zip english/voc.txt|output.txt`` — 29,417
pairs, 0 mismatches; see tests/test_porter2.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["porter2_stem"]

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTION2 = frozenset([
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
])

_STEP2 = [  # longest-match-first within each trailing letter is handled
    # by ordering: python scan takes the FIRST match, so keep longer
    # suffixes before their tails
    ("ational", "ate"), ("fulness", "ful"), ("iveness", "ive"),
    ("ization", "ize"), ("ousness", "ous"), ("biliti", "ble"),
    ("lessli", "less"), ("tional", "tion"), ("alism", "al"),
    ("aliti", "al"), ("ation", "ate"), ("entli", "ent"),
    ("fulli", "ful"), ("iviti", "ive"), ("ousli", "ous"),
    ("abli", "able"), ("alli", "al"), ("anci", "ance"),
    ("ator", "ate"), ("enci", "ence"), ("izer", "ize"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]

_STEP4 = ["ement", "ance", "ence", "able", "ible", "ment",
          "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
          "ion", "al", "er", "ic"]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS  # Y (capital) is marked consonant


def _compute_r1(word: str) -> int:
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            return len(prefix)
    for i in range(1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            return i + 1
    return len(word)


def _compute_r2(word: str, r1: int) -> int:
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            return i + 1
    return len(word)


def _short_syllable_at_end(word: str) -> bool:
    """(a) non-vowel + vowel + non-vowel(not w/x/Y) at the end, or
    (b) the whole word is vowel + non-vowel."""
    n = len(word)
    if n >= 3 and not _is_vowel(word, n - 3) and _is_vowel(word, n - 2) \
            and not _is_vowel(word, n - 1) and word[n - 1] not in "wxY":
        return True
    if n == 2 and _is_vowel(word, 0) and not _is_vowel(word, 1):
        return True
    return False


def _contains_vowel(word: str, end: int) -> bool:
    return any(_is_vowel(word, i) for i in range(end))


@lru_cache(maxsize=65536)
def porter2_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    # prelude: strip one leading apostrophe; mark consonant y as Y
    if word.startswith("'"):
        word = word[1:]  # the remainder continues through every step
        # (step 0 can still strip a trailing apostrophe: ''' -> '')
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    w = "".join(chars)

    r1 = _compute_r1(w)
    r2 = _compute_r2(w, r1)

    # step 0: longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-2] if len(w) - 3 > 1 else w[:-1]
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        if _contains_vowel(w, len(w) - 2):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # step 1b
    step1b_done = False
    for suf, r1_only in (("eedly", True), ("eed", True)):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _contains_vowel(stem, len(stem)):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w = w + "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _short_syllable_at_end(w) and r1 >= len(w):
                        w = w + "e"
                break

    # step 1c
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOWELS:
        w = w[:-1] + "i"

    # step 2 (suffix must lie in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 3 (R1; ative needs R2)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 4 (R2)
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1
                                and not _short_syllable_at_end(w[:-1])):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    return w.replace("Y", "y")
