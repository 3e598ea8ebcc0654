"""Spanish Snowball stemmer — the reference's ``SnowballFilter(...,
"Spanish")`` (``org/tartarus/snowball/ext/SpanishStemmer.java``).
Re-derived from the published algorithm description
(snowballstem.org/algorithms/spanish/stemmer.html).

Validated bit-exact against the reference's full Spanish test vocabulary
(``TestSnowballVocabData.zip spanish/voc.txt|output.txt``, 0 mismatches;
see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["spanish_snowball_stem"]

_VOWELS = frozenset("aeiouáéíóúü")

_DEACCENT = str.maketrans("áéíóú", "aeiou")

_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
         "me", "se", "la", "le", "lo")
_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_PRE_B = ("ando", "iendo", "ar", "er", "ir")

_S1_R2_DEL = ("amientos", "imientos", "amiento", "imiento", "anzas",
              "ismos", "ables", "ibles", "istas", "anza", "icos",
              "icas", "ismo", "able", "ible", "ista", "osos", "osas",
              "ico", "ica", "oso", "osa")
_S1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora", "ación",
            "antes", "ancia", "ador", "ante")
_S2B_LONG = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "eríais", "iríais", "aremos", "eremos", "iremos", "áramos",
    "ábamos", "ásemos", "ierais", "ieseis", "asteis", "isteis",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
    "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
    "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
    "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
    "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
    "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
    "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
    "éis", "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir",
    "as", "ís")
_S2B_EMOS = ("emos", "éis", "en", "es")


def _rv_r1_r2(w: str) -> tuple[int, int, int]:
    n = len(w)
    rv = n
    if n >= 2:
        if w[1] not in _VOWELS:
            # next vowel after position 1
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
def spanish_snowball_stem(word: str) -> str:
    w = word
    rv, r1, r2 = _rv_r1_r2(w)

    # step 0: attached pronoun
    for pron in _PRON:
        if not w.endswith(pron):
            continue
        base = w[: -len(pron)]
        done = False
        for pre in _PRE_A:
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                w = base.translate(_DEACCENT)
                done = True
                break
        if not done:
            for pre in _PRE_B:
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    w = base
                    done = True
                    break
        if not done and base.endswith("yendo") \
                and len(base) - 5 >= rv and base[-6:-5] == "u":
            w = base
        break

    before1 = w
    # step 1
    matched = False
    for suf in _S1_R2_DEL:
        if w.endswith(suf):
            matched = True
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            break
    if not matched:
        for suf in _S1_ADOR:
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]
                break
    if not matched:
        for suf, rep in (("logías", "log"), ("logía", "log"),
                         ("uciones", "u"), ("ución", "u"),
                         ("encias", "ente"), ("encia", "ente")):
            if w.endswith(suf):
                matched = True
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)] + rep
                break
    if not matched and w.endswith("amente"):
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
            for p in ("ante", "able", "ible"):
                if w.endswith(p) and len(w) - len(p) >= r2:
                    w = w[: -len(p)]
                    break
    if not matched:
        for suf in ("idades", "idad"):
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

    # step 2a (only if step 1 removed nothing)
    if w == before1:
        for suf in ("yeron", "yendo", "yamos", "yais", "yan", "yen",
                    "yas", "yes", "ya", "ye", "yo", "yó"):
            if w.endswith(suf) and len(w) - len(suf) >= rv \
                    and len(w) - len(suf) >= 1 \
                    and w[len(w) - len(suf) - 1] == "u":
                w = w[: -len(suf)]
                break
        # step 2b (only if 2a also removed nothing)
        if w == before1:
            done2b = False
            for suf in sorted(_S2B_EMOS + _S2B_LONG, key=len,
                              reverse=True):
                if w.endswith(suf) and len(w) - len(suf) >= rv:
                    w = w[: -len(suf)]
                    if suf in _S2B_EMOS and w.endswith("gu"):
                        w = w[:-1]
                    done2b = True
                    break

    # step 3: residual suffix
    for suf in ("os", "a", "o", "á", "í", "ó"):
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            w = w[: -len(suf)]
            break
    else:
        if (w.endswith("e") or w.endswith("é")) and len(w) - 1 >= rv:
            w = w[:-1]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]

    return w.translate(_DEACCENT)
