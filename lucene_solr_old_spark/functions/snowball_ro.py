"""Romanian Snowball stemmer — the reference's ``SnowballFilter(...,
"Romanian")`` (``org/tartarus/snowball/ext/RomanianStemmer.java``, the
``RomanianAnalyzer`` default).  Re-derived from the published algorithm
description (snowballstem.org/algorithms/romanian/stemmer.html); uses
the CEDILLA forms ş (U+015F) / ţ (U+0163) the shipped revision expects.

Validated bit-exact against the reference's full Romanian test
vocabulary (``TestSnowballVocabData.zip romanian/voc.txt|output.txt``,
0 mismatches; see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["romanian_snowball_stem"]

_VOWELS = frozenset("aăâeiîou")

_STEP1 = [
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"), ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
    ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
    ("icităţi", "ic"), ("icator", "ic"), ("icatori", "ic"),
    ("iciv", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("icivă", "ic"), ("ical", "ic"), ("icala", "ic"), ("icale", "ic"),
    ("icali", "ic"), ("icală", "ic"),
    ("ativ", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativă", "at"), ("aţiune", "at"), ("atoare", "at"), ("ator", "at"),
    ("atori", "at"), ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
    ("itiv", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itivă", "it"), ("iţiune", "it"), ("itoare", "it"), ("itor", "it"),
    ("itori", "it"),
]
_STEP2_DEL = (
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti",
    "ute", "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice",
    "ici", "ică", "abil", "abila", "abile", "abili", "abilă", "ibil",
    "ibila", "ibile", "ibili", "ibilă", "oasa", "oasă", "oase", "os",
    "osi", "oşi", "ant", "anta", "ante", "anti", "antă", "ator",
    "atori", "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive",
    "ivi", "ivă")
_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă",
              "işti")
_S3A = (
    "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
    "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte", "ăsc",
    "ăşti", "ăşte", "am", "ai", "au", "eam", "eai", "ea", "eaţi",
    "eau", "iam", "iai", "ia", "iaţi", "iau", "ui", "aşi", "arăm",
    "arăţi", "ară", "uşi", "urăm", "urăţi", "ură", "işi", "irăm",
    "irăţi", "iră", "âi", "âşi", "ârăm", "ârăţi", "âră", "asem",
    "aseşi", "ase", "aserăm", "aserăţi", "aseră", "isem", "iseşi",
    "ise", "iserăm", "iserăţi", "iseră", "âsem", "âseşi", "âse",
    "âserăm", "âserăţi", "âseră", "usem", "useşi", "use", "userăm",
    "userăţi", "useră")
_S3B = ("ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi", "seşi",
        "serăm", "serăţi", "seră", "sei", "se", "sesem", "seseşi",
        "sese", "seserăm", "seserăţi", "seseră")


def _regions(w: str) -> tuple[int, int, int]:
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
def romanian_snowball_stem(word: str) -> str:
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)

    rv, r1, r2 = _regions(w)

    # step 0: removal of plurals (in R1)
    def in_r1(suf):
        return len(w) - len(suf) >= r1

    for suf, rep in sorted(
            [("ul", ""), ("ului", ""), ("aua", "a"), ("ea", "e"),
             ("ele", "e"), ("elor", "e"), ("ii", "i"), ("iua", "i"),
             ("iei", "i"), ("iile", "i"), ("iilor", "i"), ("ilor", "i"),
             ("ile", "i"), ("atei", "at"), ("aţie", "aţi"),
             ("aţia", "aţi")],
            key=lambda p: len(p[0]), reverse=True):
        if w.endswith(suf):
            if in_r1(suf):
                if suf == "ile" and w[: -3].endswith("ab"):
                    break
                w = w[: -len(suf)] + rep
            break

    # step 1: combining suffixes, repeated to fixpoint (in R1)
    removed_1 = False
    while True:
        hit = None
        for suf, rep in sorted(_STEP1, key=lambda p: len(p[0]),
                               reverse=True):
            if w.endswith(suf):
                hit = (suf, rep)
                break
        if hit and len(w) - len(hit[0]) >= r1:
            w = w[: -len(hit[0])] + hit[1]
            removed_1 = True
            continue
        break

    # step 2: standard suffixes (in R2)
    removed_2 = False
    hit2 = None
    for suf in sorted(_STEP2_DEL + _STEP2_IST + ("iune", "iuni"),
                      key=len, reverse=True):
        if w.endswith(suf):
            hit2 = suf
            break
    if hit2 and len(w) - len(hit2) >= r2:
        if hit2 in ("iune", "iuni"):
            if w[: -len(hit2)].endswith("ţ"):
                w = w[: -len(hit2) - 1] + "t"
                removed_2 = True
        elif hit2 in _STEP2_IST:
            w = w[: -len(hit2)] + "ist"
            removed_2 = True
        else:
            w = w[: -len(hit2)]
            removed_2 = True

    # step 3: verb suffixes (in RV) — only if steps 1 and 2 removed nothing
    if not removed_1 and not removed_2:
        hit3 = None
        for suf in sorted(_S3A + _S3B, key=len, reverse=True):
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                hit3 = suf
                break
        if hit3 in _S3B:
            w = w[: -len(hit3)]
        elif hit3:
            cut = len(w) - len(hit3)
            if cut >= 1 and cut - 1 >= rv \
                    and (w[cut - 1] not in _VOWELS or w[cut - 1] == "u"):
                w = w[:cut]

    # step 4: final vowel — LONGEST whole-word match first, RV as a
    # post-condition (RomanianStemmer.java r_vowel_suffix: a failed RV on
    # 'ie' does NOT fall back to 'e')
    for suf in ("ie", "a", "e", "i", "ă"):
        if w.endswith(suf):
            if len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
            break

    return w.replace("I", "i").replace("U", "u")
