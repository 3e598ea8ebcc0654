"""Portuguese Snowball stemmer — the reference's ``SnowballFilter(...,
"Portuguese")`` (``org/tartarus/snowball/ext/PortugueseStemmer.java``).
Re-derived from the published algorithm description
(snowballstem.org/algorithms/portuguese/stemmer.html).

Validated bit-exact against the reference's full Portuguese test
vocabulary (``TestSnowballVocabData.zip portuguese/voc.txt|output.txt``,
0 mismatches; see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["portuguese_snowball_stem"]

_VOWELS = frozenset("aeiouáéíóúâêô")

_S1_R2_DEL = ("amentos", "imentos", "amento", "imento", "adoras",
              "adores", "aço~es", "ismos", "istas", "adora", "aça~o",
              "antes", "ância", "ezas", "icos", "icas", "ismo",
              "ável", "ível", "ista", "osos", "osas", "ador", "ante",
              "eza", "ico", "ica", "oso", "osa")
_S2_VERB = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou")


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
def portuguese_snowball_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv, r1, r2 = _rv_r1_r2(w)

    before = w
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
                for p in ("os", "ic", "ad"):
                    if w.endswith(p) and len(w) - 2 >= r2:
                        w = w[:-2]
                        break
    if not matched and w.endswith("mente"):
        matched = True
        if len(w) - 5 >= r2:
            w = w[:-5]
            for p in ("ante", "avel", "ível"):
                if w.endswith(p) and len(w) - len(p) >= r2:
                    w = w[: -len(p)]
                    break
    if not matched:
        for suf in sorted(_S1_R2_DEL, key=len, reverse=True):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)]
                break
    if not matched:
        # the shipped (old) snowball revision uses the SPANISH spellings
        # logía(s)/ución/uciones here — PortugueseStemmer.java:60,67,84,86
        for suf, rep in (("logías", "log"), ("logía", "log"),
                         ("uciones", "u"), ("ución", "u"),
                         ("ências", "ente"), ("ência", "ente")):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)] + rep
                break
    if not matched:
        for suf in ("idades", "idade"):
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
        for suf in ("ivas", "ivos", "iva", "ivo"):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                break
    if not matched:
        for suf in ("iras", "ira"):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= rv \
                        and w[: -len(suf)].endswith("e"):
                    w = w[: -len(suf)] + "ir"
                break

    # step 2: verb suffixes (only if step 1 changed nothing)
    if w == before:
        for suf in sorted(_S2_VERB, key=len, reverse=True):
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
                break

    # step 3 (if step 1 or 2 altered): final i preceded by c, in RV
    if w != before:
        if w.endswith("i") and len(w) - 1 >= rv and w[-2:] == "ci":
            w = w[:-1]
    else:
        # step 4 (residual suffix)
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
                break

    # step 5
    if w and w[-1] in "eéê" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]
        elif w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")
