"""Lovins stemmer (J.B. Lovins, 1968) — the reference's
``SnowballFilter(..., "Lovins")``
(``org/tartarus/snowball/ext/LovinsStemmer.java``): the 294-ending
longest-match table with per-ending conditions A-CC, the undouble step,
and the 34 respell (transformation) rules.

The endings among carries ATTACHED conditions, so a longest match whose
condition fails falls back to shorter endings; the respell guards are
hard (no fallback).

Validated bit-exact against the reference's full Lovins test vocabulary
(``TestSnowballVocabData.zip lovins/voc.txt|output.txt``, 0 mismatches;
see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["lovins_stem"]


def _A(s):
    return len(s) >= 2


def _B(s):
    return len(s) >= 3


def _C(s):
    return len(s) >= 4


def _D(s):
    return len(s) >= 5


def _E(s):
    return len(s) >= 2 and not s.endswith("e")


def _F(s):
    return len(s) >= 3 and not s.endswith("e")


def _G(s):
    return len(s) >= 3 and s.endswith("f")


def _H(s):
    return len(s) >= 2 and (s.endswith("t") or s.endswith("ll"))


def _I(s):
    return len(s) >= 2 and s[-1] not in "oe"


def _J(s):
    return len(s) >= 2 and s[-1] not in "ae"


def _K(s):
    return len(s) >= 3 and (s[-1] in "li"
                            or (s.endswith("e") and len(s) >= 3
                                and s[-3] == "u"))


def _L(s):
    if len(s) < 2 or s[-1] in "ux":
        return False
    if s.endswith("s") and not s.endswith("os"):
        return False
    return True


def _M(s):
    return len(s) >= 2 and s[-1] not in "acem"


def _N(s):
    if len(s) < 3:
        return False
    if len(s) >= 3 and s[-3] == "s":
        return len(s) >= 4
    return True


def _O(s):
    return len(s) >= 2 and s[-1] in "li"


def _P(s):
    return len(s) >= 2 and not s.endswith("c")


def _Q(s):
    return len(s) >= 3 and s[-1] not in "ln"


def _R(s):
    return len(s) >= 2 and s[-1] in "nr"


def _S(s):
    return len(s) >= 2 and (s.endswith("dr")
                            or (s.endswith("t") and not s.endswith("tt")))


def _T(s):
    return len(s) >= 2 and (s.endswith("s")
                            or (s.endswith("t") and not s.endswith("ot")))


def _U(s):
    return len(s) >= 2 and s[-1] in "lmnr"


def _V(s):
    return len(s) >= 2 and s.endswith("c")


def _W(s):
    return len(s) >= 2 and s[-1] not in "su"


def _X(s):
    return len(s) >= 2 and (s[-1] in "li"
                            or (s.endswith("e") and len(s) >= 3
                                and s[-3] == "u"))


def _Y(s):
    return len(s) >= 2 and s.endswith("in")


def _Z(s):
    return len(s) >= 2 and not s.endswith("f")


def _AA(s):
    return len(s) >= 2 and (s[-1] in "dflt" or s[-2:] in
                            ("ph", "th", "er", "or", "es"))


def _BB(s):
    return len(s) >= 3 and not s.endswith("met") \
        and not s.endswith("ryst")


def _CC(s):
    return len(s) >= 2 and s.endswith("l")


_ENDINGS = [
    ("s'", _A), ("a", _A), ("ia", _A), ("ata", _A), ("ic", _A),
    ("aic", _A), ("allic", _BB), ("aric", _A), ("atic", _B),
    ("itic", _H), ("antic", _C), ("istic", _A), ("alistic", _B),
    ("aristic", _A), ("ivistic", _A), ("ed", _E), ("anced", _B),
    ("enced", _A), ("ished", _A), ("ied", _A), ("ened", _E),
    ("ioned", _A), ("ated", _I), ("ented", _C), ("ized", _F),
    ("arized", _A), ("oid", _A), ("aroid", _A), ("hood", _A),
    ("ehood", _A), ("ihood", _A), ("elihood", _E), ("ward", _A),
    ("e", _A), ("ae", _A), ("ance", _B), ("icance", _A),
    ("ence", _A), ("ide", _L), ("icide", _A), ("otide", _A),
    ("age", _B), ("able", _A), ("atable", _A), ("izable", _E),
    ("arizable", _A), ("ible", _A), ("encible", _A), ("ene", _E),
    ("ine", _M), ("idine", _I), ("one", _R), ("ature", _E),
    ("eature", _Z), ("ese", _A), ("wise", _A), ("ate", _A),
    ("entiate", _A), ("inate", _A), ("ionate", _D), ("ite", _AA),
    ("ive", _A), ("ative", _A), ("ize", _F), ("alize", _A),
    ("icalize", _A), ("ialize", _A), ("entialize", _A),
    ("ionalize", _A), ("arize", _A), ("ing", _N), ("ancing", _B),
    ("encing", _A), ("aging", _B), ("ening", _E), ("ioning", _A),
    ("ating", _I), ("enting", _C), ("ying", _B), ("izing", _F),
    ("arizing", _A), ("ish", _C), ("yish", _A), ("i", _A),
    ("al", _BB), ("ical", _A), ("aical", _A), ("istical", _A),
    ("oidal", _A), ("eal", _Y), ("ial", _A), ("ancial", _A),
    ("arial", _A), ("ential", _A), ("ional", _A), ("ational", _B),
    ("izational", _A), ("ental", _A), ("ful", _A), ("eful", _A),
    ("iful", _A), ("yl", _R), ("ism", _B), ("icism", _A),
    ("oidism", _A), ("alism", _B), ("icalism", _A),
    ("ionalism", _A), ("inism", _J), ("ativism", _A), ("um", _U),
    ("ium", _A), ("ian", _A), ("ician", _A), ("en", _F),
    ("ogen", _A), ("on", _S), ("ion", _Q), ("ation", _B),
    ("ication", _G), ("entiation", _A), ("ination", _A),
    ("isation", _A), ("arisation", _A), ("entation", _A),
    ("ization", _F), ("arization", _A), ("action", _G), ("o", _A),
    ("ar", _X), ("ear", _Y), ("ier", _A), ("ariser", _A),
    ("izer", _F), ("arizer", _A), ("or", _T), ("ator", _A),
    ("s", _W), ("'s", _A), ("as", _B), ("ics", _A), ("istics", _A),
    ("es", _E), ("ances", _B), ("ences", _A), ("ides", _L),
    ("oides", _A), ("ages", _B), ("ies", _P), ("acies", _A),
    ("ancies", _A), ("encies", _A), ("aries", _A), ("ities", _A),
    ("alities", _A), ("ivities", _A), ("ines", _M), ("nesses", _A),
    ("ates", _A), ("atives", _A), ("ings", _N), ("is", _A),
    ("als", _BB), ("ials", _A), ("entials", _A), ("ionals", _A),
    ("isms", _B), ("ians", _A), ("icians", _A), ("ions", _B),
    ("ations", _B), ("arisations", _A), ("entations", _A),
    ("izations", _A), ("arizations", _A), ("ars", _O),
    ("iers", _A), ("izers", _F), ("ators", _A), ("less", _A),
    ("eless", _A), ("ness", _A), ("eness", _E), ("ableness", _A),
    ("eableness", _E), ("ibleness", _A), ("ateness", _A),
    ("iteness", _A), ("iveness", _A), ("ativeness", _A),
    ("ingness", _A), ("ishness", _A), ("iness", _A),
    ("ariness", _E), ("alness", _A), ("icalness", _A),
    ("antialness", _A), ("entialness", _A), ("ionalness", _A),
    ("fulness", _A), ("lessness", _A), ("ousness", _A),
    ("eousness", _A), ("iousness", _A), ("itousness", _A),
    ("entness", _A), ("ants", _B), ("ists", _A), ("icists", _A),
    ("us", _V), ("ous", _A), ("eous", _A), ("aceous", _A),
    ("antaneous", _A), ("ious", _A), ("acious", _B), ("itous", _A),
    ("ant", _B), ("icant", _A), ("ent", _C), ("ement", _A),
    ("izement", _A), ("ist", _A), ("icist", _A), ("alist", _A),
    ("icalist", _A), ("ialist", _A), ("ionist", _A), ("entist", _A),
    ("y", _B), ("acy", _A), ("ancy", _B), ("ency", _A), ("ly", _B),
    ("ealy", _Y), ("ably", _A), ("ibly", _A), ("edly", _E),
    ("iedly", _A), ("ely", _E), ("ately", _A), ("ively", _A),
    ("atively", _A), ("ingly", _B), ("atingly", _A), ("ily", _A),
    ("lily", _A), ("arily", _A), ("ally", _B), ("ically", _A),
    ("aically", _A), ("allically", _C), ("istically", _A),
    ("alistically", _B), ("oidally", _A), ("ially", _A),
    ("entially", _A), ("ionally", _A), ("ationally", _B),
    ("izationally", _B), ("entally", _A), ("fully", _A),
    ("efully", _A), ("ifully", _A), ("enly", _E), ("arly", _K),
    ("early", _Y), ("lessly", _A), ("ously", _A), ("eously", _A),
    ("iously", _A), ("ently", _A), ("ary", _F), ("ery", _E),
    ("icianry", _A), ("atory", _A), ("ity", _A), ("acity", _A),
    ("icity", _A), ("eity", _A), ("ality", _A), ("icality", _A),
    ("iality", _A), ("antiality", _A), ("entiality", _A),
    ("ionality", _A), ("elity", _A), ("ability", _A),
    ("izability", _A), ("arizability", _A), ("ibility", _A),
    ("inity", _CC), ("arity", _B), ("ivity", _A),
]
_ENDINGS.sort(key=lambda p: len(p[0]), reverse=True)

_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

# (ending, replacement, guard) — guard(stem_before_ending) must be True
_RESPELL = [
    ("iev", "ief", None), ("uct", "uc", None), ("umpt", "um", None),
    ("rpt", "rb", None), ("urs", "ur", None), ("istr", "ister", None),
    ("metr", "meter", None), ("olv", "olut", None),
    ("ul", "l", lambda s: s[-1:] not in ("a", "i", "o")),
    ("bex", "bic", None), ("dex", "dic", None), ("pex", "pic", None),
    ("tex", "tic", None), ("ax", "ac", None), ("ex", "ec", None),
    ("ix", "ic", None), ("lux", "luc", None),
    ("uad", "uas", None), ("vad", "vas", None), ("cid", "cis", None),
    ("lid", "lis", None), ("erid", "eris", None),
    ("pand", "pans", None),
    ("end", "ens", lambda s: s[-1:] != "s"),
    ("ond", "ons", None), ("lud", "lus", None), ("rud", "rus", None),
    ("her", "hes", lambda s: s[-1:] not in ("p", "t")),
    ("mit", "mis", None),
    ("ent", "ens", lambda s: s[-1:] != "m"),
    ("ert", "ers", None),
    ("et", "es", lambda s: s[-1:] != "n"),
    ("yt", "ys", None), ("yz", "ys", None),
]
_RESPELL.sort(key=lambda p: len(p[0]), reverse=True)


@lru_cache(maxsize=65536)
def lovins_stem(word: str) -> str:
    w = word
    # endings: longest match whose condition passes (attached-condition
    # fallback: a failing condition tries the next shorter ending)
    for suf, cond in _ENDINGS:
        if w.endswith(suf) and cond(w[: -len(suf)]):
            w = w[: -len(suf)]
            break
    # undouble
    if w.endswith(_DOUBLES):
        w = w[:-1]
    # respell (hard guards, longest match, no fallback)
    for suf, rep, guard in _RESPELL:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if guard is None or guard(stem):
                w = stem + rep
            break
    return w
