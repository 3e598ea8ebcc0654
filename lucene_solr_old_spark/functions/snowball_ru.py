"""Russian Snowball stemmer — the reference's ``SnowballFilter(...,
"Russian")`` (``org/tartarus/snowball/ext/RussianStemmer.java``), the
default stemmer of ``RussianAnalyzer``.  Re-derived from the published
algorithm description (snowballstem.org/algorithms/russian/stemmer.html).

Validated bit-exact against the reference's full Russian test vocabulary
(``TestSnowballVocabData.zip russian/voc.txt|output.txt``, 0 mismatches;
see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["russian_snowball_stem"]

_VOWELS = frozenset("аеиоуыэюя")

# suffix groups; group-1 entries require а/я immediately before the
# suffix (and that letter is NOT removed)
_PERF_GERUND_1 = ("вшись", "вши", "в")
_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_ADJECTIVE = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие",
              "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
              "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_REFLEXIVE = ("ся", "сь")
_VERB_1 = ("ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло",
           "но", "ет", "ют", "ны", "ть", "й", "л", "н")
_VERB_2 = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
           "ило", "ыло", "ено", "ует", "уют", "ены", "ить", "ыть",
           "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят",
           "ит", "ыт", "ую", "ю")
_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов",
         "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам",
         "ом", "ах", "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й",
         "о", "у", "ы", "ь", "ю", "я")


def _bylen(groups):
    return sorted(groups, key=len, reverse=True)


def _strip_group(w: str, rv: int, g1, g2) -> tuple[str, bool]:
    """Longest match across both groups; g1 needs а/я before the cut."""
    for suf in _bylen(tuple(g1) + tuple(g2)):
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            if suf in g1:
                cut = len(w) - len(suf)
                if cut >= 1 and w[cut - 1] in "ая" and cut - 1 >= rv:
                    return w[:cut], True
                continue  # a g1 miss does NOT block shorter matches
            return w[: -len(suf)], True
    return w, False


@lru_cache(maxsize=65536)
def russian_snowball_stem(word: str) -> str:
    w = word.replace("ё", "е")
    rv = len(w)
    for i, ch in enumerate(w):
        if ch in _VOWELS:
            rv = i + 1
            break
    # R2: region after the first non-vowel following a vowel inside R1
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break

    # step 1
    w2, done = _strip_group(w, rv, _PERF_GERUND_1, _PERF_GERUND_2)
    if done:
        w = w2
    else:
        for suf in _REFLEXIVE:
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
                break
        # adjectival: adjective, optionally preceded by participle
        adj = None
        for suf in _bylen(_ADJECTIVE):
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                adj = suf
                break
        if adj:
            w = w[: -len(adj)]
            w, _ = _strip_group(w, rv, _PARTICIPLE_1, _PARTICIPLE_2)
        else:
            w2, done = _strip_group(w, rv, _VERB_1, _VERB_2)
            if done:
                w = w2
            else:
                for suf in _bylen(_NOUN):
                    if w.endswith(suf) and len(w) - len(suf) >= rv:
                        w = w[: -len(suf)]
                        break

    # step 2: и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    # step 3: derivational (R2)
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break
    # step 4
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    elif w.endswith("ейше") and len(w) - 4 >= rv:
        w = w[:-4]
        if w.endswith("нн") and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ейш") and len(w) - 3 >= rv:
        w = w[:-3]
        if w.endswith("нн") and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]
    return w
