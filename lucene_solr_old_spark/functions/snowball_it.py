"""Italian Snowball stemmer — the reference's ``SnowballFilter(...,
"Italian")`` (``org/tartarus/snowball/ext/ItalianStemmer.java``).
Re-derived from the published algorithm description
(snowballstem.org/algorithms/italian/stemmer.html).

Validated bit-exact against the reference's full Italian test vocabulary
(``TestSnowballVocabData.zip italian/voc.txt|output.txt``, 0 mismatches;
see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["italian_snowball_stem"]

_VOWELS = frozenset("aeiouàèìòù")

_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")

_PRON = ("gliela", "gliele", "glieli", "glielo", "gliene", "sene",
         "mela", "mele", "meli", "melo", "mene", "tela", "tele",
         "teli", "telo", "tene", "cela", "cele", "celi", "celo",
         "cene", "vela", "vele", "veli", "velo", "vene", "gli", "ci",
         "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi")

_S1_R2_DEL = ("atrice", "atrici", "mente", "abile", "abili", "ibile",
              "ibili", "anza", "anze", "iche", "ichi", "ismo", "ismi",
              "ista", "iste", "isti", "istà", "istè", "istì", "ante",
              "anti", "ico", "ici", "ica", "ice", "oso", "osi", "osa",
              "ose")
_S2_VERB = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere",
    "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir")


def _rv_r1_r2(w: str) -> tuple[int, int, int]:
    n = len(w)
    rv = n
    if n >= 2:
        if w[1] not in _VOWELS:
            for i in range(2, n):
                if w[i] in _VOWELS:
                    rv = i + 1
                    break
        elif w[0] in _VOWELS and w[1] in _VOWELS:
            for i in range(2, n):
                if w[i] not in _VOWELS:
                    rv = i + 1
                    break
        else:
            rv = 3
    r1 = n
    for i in range(1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return rv, r1, r2


@lru_cache(maxsize=65536)
def italian_snowball_stem(word: str) -> str:
    w = word.translate(_ACUTE_TO_GRAVE)
    # mark u after q and intervocalic u/i as U/I
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif chars[i] in "ui" and 0 < i < len(chars) - 1 \
                and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)

    rv, r1, r2 = _rv_r1_r2(w)

    # step 0: attached pronoun
    for pron in sorted(_PRON, key=len, reverse=True):
        if not w.endswith(pron):
            continue
        base = w[: -len(pron)]
        for pre in ("ando", "endo"):
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                w = base
                break
        else:
            for pre in ("ar", "er", "ir"):
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    w = base + "e"
                    break
        break

    before1 = w
    # step 1
    matched = False
    if w.endswith("amente"):
        matched = True
        if len(w) - 6 >= r1:
            w = w[:-6]
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            else:
                for p in ("os", "ic", "abil"):
                    if w.endswith(p) and len(w) - len(p) >= r2:
                        w = w[: -len(p)]
                        break
    if not matched:
        for suf in ("amento", "amenti", "imento", "imenti"):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= rv:
                    w = w[: -len(suf)]
                break
    if not matched:
        for suf in sorted(_S1_R2_DEL, key=len, reverse=True):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)]
                break
    if not matched:
        for suf in ("azione", "azioni", "atore", "atori"):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]
                break
    if not matched:
        for suf, rep in (("logia", "log"), ("logie", "log"),
                         ("uzione", "u"), ("uzioni", "u"),
                         ("usione", "u"), ("usioni", "u"),
                         ("enza", "ente"), ("enze", "ente")):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)] + rep
                break
    if not matched:
        for suf in ("ità",):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)]
                    for p in ("abil", "ic", "iv"):
                        if w.endswith(p) and len(w) - len(p) >= r2:
                            w = w[: -len(p)]
                            break
                break
    if not matched:
        for suf in ("ivo", "ivi", "iva", "ive"):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                        if w.endswith("ic") and len(w) - 2 >= r2:
                            w = w[:-2]
                break

    # step 2 (only if step 1 removed nothing)
    if w == before1:
        for suf in sorted(_S2_VERB, key=len, reverse=True):
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
                break

    # step 3a: final vowel (+ a preceding i), in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: ch/gh -> c/g, whole suffix in RV
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= rv:
        w = w[:-1]

    return w.replace("U", "u").replace("I", "i")
