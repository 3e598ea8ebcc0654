"""Hungarian Snowball stemmer — the reference's ``SnowballFilter(...,
"Hungarian")`` (``org/tartarus/snowball/ext/HungarianStemmer.java``, the
``HungarianAnalyzer`` default).  Re-derived from the published algorithm
description + the generated automaton's tables; NOTE the shipped
revision spells the long-ö case endings with ``õ`` (U+00F5, bõl/rõl/tõl)
— reproduced verbatim, as the reference vocabulary expects.

Validated bit-exact against the reference's full Hungarian test
vocabulary (``TestSnowballVocabData.zip hungarian/voc.txt|output.txt``,
0 mismatches; see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["hungarian_snowball_stem"]

_VOWELS = frozenset("aeiouáéíóõöúûü")
_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_DOUBLES = ("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz", "bb",
            "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
            "pp", "rr", "ss", "tt", "vv", "zz")

# suffix tables: (suffix, action) — action None = delete, else replace
_CASE = ("képpen", "anként", "enként", "onként", "ként", "képp",
         "ban", "ben", "nak", "nek", "val", "vel", "nál", "nél",
         "ból", "ról", "tól", "bõl", "rõl", "tõl", "hez", "hoz",
         "höz", "kor", "ért", "ba", "ra", "be", "re", "ig", "ul",
         "ül", "an", "en", "on", "ön", "at", "et", "ot", "öt", "vá",
         "vé", "n", "t")
_CASE_SPECIAL = [("ánként", "a"), ("én", "e"), ("án", "a")]
_CASE_OTHER = [("astul", None), ("estül", None), ("ástul", "a"),
               ("éstül", "e"), ("stul", None), ("stül", None)]
_PLURAL = [("ák", "a"), ("ék", "e"), ("ök", None), ("ak", None),
           ("ek", None), ("ok", None), ("k", None)]
_OWNED = [("áéi", "a"), ("ééi", "e"), ("aké", None), ("eké", None),
          ("oké", None), ("áké", "a"), ("éké", "e"), ("öké", None),
          ("éi", None), ("ké", None), ("éé", "e"), ("é", None)]
_SING_OWNER = [
    ("ájuk", "a"), ("éjük", "e"),
    ("juk", None), ("jük", None), ("unk", None), ("ünk", None),
    ("ánk", "a"), ("énk", "e"), ("ja", None), ("je", None),
    ("ad", None), ("ed", None), ("od", None), ("öd", None),
    ("ád", "a"), ("éd", "e"), ("nk", None), ("uk", None),
    ("ük", None), ("am", None), ("em", None), ("om", None),
    ("ám", "a"), ("ém", "e"), ("a", None), ("e", None), ("d", None),
    ("m", None), ("o", None), ("á", "a"), ("é", "e")]
_PLUR_OWNER = [
    ("jeitek", None), ("jaitok", None), ("jaink", None),
    ("jeink", None), ("eitek", None), ("aitok", None),
    ("áitok", "a"), ("éitek", "e"), ("itek", None), ("jaid", None),
    ("jeid", None), ("aink", None), ("eink", None), ("áink", "a"),
    ("éink", "e"), ("jaik", None), ("jeik", None), ("aid", None),
    ("eid", None), ("áid", "a"), ("éid", "e"), ("jai", None),
    ("jei", None), ("aik", None), ("eik", None), ("áik", "a"),
    ("éik", "e"), ("ink", None), ("aim", None), ("eim", None),
    ("jaim", None), ("jeim", None), ("áim", "a"), ("éim", "e"),
    ("id", None), ("ai", None), ("ei", None), ("ái", "a"),
    ("éi", "e"), ("ik", None), ("im", None), ("i", None)]


def _r1(w: str) -> int:
    n = len(w)
    if not w:
        return 0
    if w[0] in _VOWELS:
        for i in range(1, n):
            if w[i] not in _VOWELS:
                for d in _DIGRAPHS:
                    if w.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    for i in range(1, n):
        if w[i] in _VOWELS:
            return i + 1
    return n


def _ends_double(w: str) -> bool:
    return any(w.endswith(d) for d in _DOUBLES)


def _undouble(w: str) -> str:
    """Remove the second-to-last character (bb -> b, ccs -> cs)."""
    return w[:-2] + w[-1]


def _v_ending(w: str, r1: int) -> str:
    if w.endswith("á") and len(w) - 1 >= r1:
        return w[:-1] + "a"
    if w.endswith("é") and len(w) - 1 >= r1:
        return w[:-1] + "e"
    return w


def _apply(w: str, r1: int, table) -> str:
    # the Hungarian amongs are NOT region-limited: the longest suffix of
    # the WHOLE word is selected first, and R1 is a post-condition with
    # no fallback (a too-long match that starts before R1 blocks any
    # shorter entry — 'bot' keeps its 't' because 'ot' matched first)
    for suf, rep in sorted(table, key=lambda p: len(p[0]), reverse=True):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                return w[: -len(suf)] + (rep or "")
            return w
    return w


@lru_cache(maxsize=65536)
def hungarian_snowball_stem(word: str) -> str:
    w = word
    r1 = _r1(w)

    # instrum: al/el (longest-match, R1 + double as post-conditions)
    for suf in ("al", "el"):
        if w.endswith(suf):
            if len(w) - 2 >= r1 and _ends_double(w[:-2]):
                w = _undouble(w[:-2])
            break

    # case endings, then final á/é normalization
    for suf in sorted(_CASE, key=len, reverse=True):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = _v_ending(w[: -len(suf)], r1)
            break

    w = _apply(w, r1, _CASE_SPECIAL)
    w = _apply(w, r1, _CASE_OTHER)

    # factive: á/é with preceding double (post-conditions); undouble
    for suf in ("á", "é"):
        if w.endswith(suf):
            if len(w) - 1 >= r1 and _ends_double(w[:-1]):
                w = _undouble(w[:-1])
            break

    w = _apply(w, r1, _OWNED)
    w = _apply(w, r1, _SING_OWNER)
    w = _apply(w, r1, _PLUR_OWNER)
    w = _apply(w, r1, _PLURAL)
    return w
