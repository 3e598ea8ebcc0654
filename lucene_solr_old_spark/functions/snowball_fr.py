"""French Snowball stemmer — the reference's ``SnowballFilter(...,
"French")`` (``org/tartarus/snowball/ext/FrenchStemmer.java``).
Re-derived from the published algorithm description
(snowballstem.org/algorithms/french/stemmer.html).

Validated bit-exact against the reference's full French test vocabulary
(``TestSnowballVocabData.zip french/voc.txt|output.txt``, 0 mismatches;
see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["french_snowball_stem"]

_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

_S2A = ("issaIent", "issantes", "iraIent", "issante", "issants",
        "issions", "irions", "issais", "issait", "issant", "issent",
        "issiez", "issons", "irais", "irait", "irent", "iriez",
        "irons", "iront", "isses", "issez", "îmes", "îtes", "irai",
        "iras", "irez", "isse", "ies", "ira", "ît", "ie", "ir", "is",
        "it", "i")
_S2B_ER = ("eraIent", "erions", "èrent", "erais", "erait", "erez",
           "eriez", "erons", "eront", "erai", "eras", "ées", "era",
           "iez", "ée", "és", "er", "ez", "é")
_S2B_A = ("assions", "assent", "assiez", "aIent", "antes", "asses",
          "âmes", "âtes", "ante", "ants", "asse", "ais", "ait", "ant",
          "ât", "ai", "as", "a")


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    rv = n
    if n >= 3 and w[0] in _VOWELS and w[1] in _VOWELS:
        rv = 3
    elif w[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        for i in range(1, n):
            if w[i] in _VOWELS:
                rv = i + 1
                break
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
def french_snowball_stem(word: str) -> str:
    # prelude: mark u/i between vowels, y next to a vowel, u after q
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev = chars[i - 1] if i > 0 else ""
        nxt = chars[i + 1] if i + 1 < n else ""
        if c in "ui" and prev in _VOWELS and nxt in _VOWELS:
            chars[i] = c.upper()
        elif c == "y" and (prev in _VOWELS or nxt in _VOWELS):
            chars[i] = "Y"
        elif c == "u" and prev == "q":
            chars[i] = "U"
    w = "".join(chars)

    rv, r1, r2 = _regions(w)
    orig = w

    # ---- step 1: standard suffix removal ----------------------------------
    step1_changed = False
    ment_found = False
    m = None
    SUFS = sorted(
        ["ance", "iqUe", "isme", "able", "iste", "eux", "ances",
         "iqUes", "ismes", "ables", "istes", "atrice", "ateur",
         "ation", "atrices", "ateurs", "ations", "logie", "logies",
         "usion", "ution", "usions", "utions", "ence", "ences",
         "ement", "ements", "ité", "ités", "if", "ive", "ifs",
         "ives", "eaux", "aux", "euse", "euses", "issement",
         "issements", "amment", "emment", "ment", "ments"],
        key=len, reverse=True)
    for suf in SUFS:
        if w.endswith(suf):
            m = suf
            break
    if m in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
             "iqUes", "ismes", "ables", "istes"):
        if len(w) - len(m) >= r2:
            w = w[: -len(m)]
            step1_changed = True
    elif m in ("atrice", "ateur", "ation", "atrices", "ateurs",
               "ations"):
        if len(w) - len(m) >= r2:
            w = w[: -len(m)]
            step1_changed = True
            if w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
    elif m in ("logie", "logies"):
        if len(w) - len(m) >= r2:
            w = w[: -len(m)] + "log"
            step1_changed = True
    elif m in ("usion", "ution", "usions", "utions"):
        if len(w) - len(m) >= r2:
            w = w[: -len(m)] + "u"
            step1_changed = True
    elif m in ("ence", "ences"):
        if len(w) - len(m) >= r2:
            w = w[: -len(m)] + "ent"
            step1_changed = True
    elif m in ("ement", "ements"):
        if len(w) - len(m) >= rv:
            w = w[: -len(m)]
            step1_changed = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            elif w.endswith("eus"):
                if len(w) - 3 >= r2:
                    w = w[:-3]
                elif len(w) - 3 >= r1:
                    w = w[:-3] + "eux"
            elif w.endswith("abl") and len(w) - 3 >= r2:
                w = w[:-3]
            elif w.endswith("iqU") and len(w) - 3 >= r2:
                w = w[:-3]
            elif (w.endswith("ièr") or w.endswith("Ièr")) \
                    and len(w) - 3 >= rv:
                w = w[:-3] + "i"
    elif m in ("ité", "ités"):
        if len(w) - len(m) >= r2:
            w = w[: -len(m)]
            step1_changed = True
            if w.endswith("abil"):
                if len(w) - 4 >= r2:
                    w = w[:-4]
                else:
                    w = w[:-4] + "abl"
            elif w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            elif w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
    elif m in ("if", "ive", "ifs", "ives"):
        if len(w) - len(m) >= r2:
            w = w[: -len(m)]
            step1_changed = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
    elif m == "eaux":
        w = w[:-4] + "eau"
        step1_changed = True
    elif m == "aux":
        if len(w) - 3 >= r1:
            w = w[:-3] + "al"
            step1_changed = True
    elif m in ("euse", "euses"):
        if len(w) - len(m) >= r2:
            w = w[: -len(m)]
            step1_changed = True
        elif len(w) - len(m) >= r1:
            w = w[: -len(m)] + "eux"
            step1_changed = True
    elif m in ("issement", "issements"):
        if len(w) - len(m) >= r1 and len(w) - len(m) >= 1 \
                and w[len(w) - len(m) - 1] not in _VOWELS:
            w = w[: -len(m)]
            step1_changed = True
    elif m == "amment":
        if len(w) - 6 >= rv:
            w = w[:-6] + "ant"
            ment_found = True
    elif m == "emment":
        if len(w) - 6 >= rv:
            w = w[:-6] + "ent"
            ment_found = True
    elif m in ("ment", "ments"):
        cut = len(w) - len(m)
        if cut >= 1 and w[cut - 1] in _VOWELS and cut - 1 >= rv:
            w = w[:cut]
            ment_found = True

    # ---- steps 2a / 2b ----------------------------------------------------
    did_2 = False
    if not step1_changed or ment_found:
        pre2 = w
        for suf in _S2A:
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                cut = len(w) - len(suf)
                if cut >= 1 and w[cut - 1] not in _VOWELS \
                        and cut - 1 >= rv:
                    w = w[:cut]
                    did_2 = True
                break
        if not did_2:
            # step 2b
            for suf in sorted(("ions",) + _S2B_ER + _S2B_A, key=len,
                              reverse=True):
                if w.endswith(suf) and len(w) - len(suf) >= rv:
                    if suf == "ions":
                        if len(w) - 4 >= r2:
                            w = w[:-4]
                            did_2 = True
                        break
                    if suf in _S2B_ER:
                        w = w[: -len(suf)]
                        did_2 = True
                        break
                    # _S2B_A group
                    w = w[: -len(suf)]
                    did_2 = True
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]
                    break
        changed2 = w != pre2
    else:
        changed2 = False

    altered = step1_changed or ment_found or changed2

    if altered:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        if w.endswith("ion") and len(w) - 3 >= r2 and len(w) >= 4 \
                and w[-4] in "st":
            w = w[:-3]
        else:
            for suf, rep in (("ière", "i"), ("Ière", "i"),
                             ("ier", "i"), ("Ier", "i")):
                if w.endswith(suf) and len(w) - len(suf) >= rv:
                    w = w[: -len(suf)] + rep
                    break
            else:
                if w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]
                elif w.endswith("ë") and len(w) - 1 >= rv \
                        and w[-3:-1] == "gu":
                    w = w[:-1]

    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break
    # step 6: un-accent
    i = len(w) - 1
    k = 0
    while i >= 0 and w[i] not in _VOWELS:
        i -= 1
        k += 1
    if k >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")
