"""Turkish Snowball stemmer — the reference's ``SnowballFilter(...,
"Turkish")`` (``org/tartarus/snowball/ext/TurkishStemmer.java``, the
``TurkishAnalyzer`` default; algorithm by Evren Kapusuz Çilden).
Re-derived from the published algorithm description; the nested
alternative/try structure of the three suffix-cascade routines follows
the generated automaton's control flow, including its mid-word
deletions (ket stays at the PREVIOUS end while a nested chain deletes
an inner span).

Validated bit-exact against the reference's full Turkish test
vocabulary (``TestSnowballVocabData.zip turkish/voc.txt|output.txt``,
0 mismatches; see tests/test_snowball.py).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["turkish_snowball_stem"]

_VOWELS = frozenset("aeıioöuü")
_U = frozenset("ıiuü")
_HARMONY = {"a": "aouı", "e": "eiöü", "ı": "aı", "i": "ei",
            "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}

_A0 = ("miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız", "m", "n")
_A1 = ("leri", "ları")
_A2 = ("ni", "nu", "nü", "nı")
_A3 = ("in", "un", "ün", "ın")
_A4 = ("a", "e")
_A5 = ("na", "ne")
_A6 = ("da", "ta", "de", "te")
_A7 = ("nda", "nde")
_A8 = ("dan", "tan", "den", "ten")
_A9 = ("ndan", "nden")
_A10 = ("la", "le")
_A11 = ("ca", "ce")
_A12 = ("im", "um", "üm", "ım")
_A13 = ("sin", "sun", "sün", "sın")
_A14 = ("iz", "uz", "üz", "ız")
_A15 = ("siniz", "sunuz", "sünüz", "sınız")
_A16 = ("lar", "ler")
_A17 = ("niz", "nuz", "nüz", "nız")
_A18 = ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_A19 = ("casına", "cesine")
_A20 = ("dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
        "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
        "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
        "di", "ti", "du", "tu", "dü", "tü", "dı", "tı")
_A21 = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")
_A22 = ("miş", "muş", "müş", "mış")


class _St:
    __slots__ = ("w", "c", "k")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.k = len(w)

    def save(self) -> int:
        return len(self.w) - self.c

    def restore(self, d: int) -> None:
        self.c = len(self.w) - d

    def set_ket(self) -> None:
        self.k = self.c

    def delete(self) -> None:
        self.w = self.w[: self.c] + self.w[self.k:]
        self.k = self.c


def _ends(st: _St, s: str) -> bool:
    if st.w[: st.c].endswith(s):
        st.c -= len(s)
        return True
    return False


def _among(st: _St, table) -> bool:
    head = st.w[: st.c]
    for suf in table:
        if head.endswith(suf):
            st.c -= len(suf)
            return True
    return False


def _harmony(st: _St) -> bool:
    w, c = st.w, st.c
    i = c - 1
    while i >= 0 and w[i] not in _VOWELS:
        i -= 1
    if i < 0:
        return False
    allowed = _HARMONY[w[i]]
    return any(w[j] in allowed for j in range(i))


def _opt_cons(st: _St, ch: str) -> bool:
    """Optional linking consonant (y/n/s): consume it when present and
    preceded by a vowel; reject a present-but-unvoweled one; without it,
    the character one position further left must be a vowel."""
    w, c = st.w, st.c
    if c >= 1 and w[c - 1] == ch:
        if c >= 2 and w[c - 2] in _VOWELS:
            st.c = c - 1
            return True
        return False
    if c >= 2 and w[c - 2] in _VOWELS:
        return True
    return False


def _opt_U(st: _St) -> bool:
    """Optional U vowel before possessive m/n endings: consume a U that
    sits on a consonant; without one, the character one position further
    left must be a consonant."""
    w, c = st.w, st.c
    if c >= 1 and w[c - 1] in _U:
        if c >= 2 and w[c - 2] not in _VOWELS:
            st.c = c - 1
            return True
        return False
    if c >= 2 and w[c - 2] not in _VOWELS:
        return True
    return False


def _guard(fn):
    def wrapped(st: _St) -> bool:
        d = st.save()
        if fn(st):
            return True
        st.restore(d)
        return False
    return wrapped


@_guard
def _m_possessives(st):
    return _among(st, _A0) and _opt_U(st)


@_guard
def _m_sU(st):
    if not _harmony(st):
        return False
    if st.c >= 1 and st.w[st.c - 1] in _U:
        st.c -= 1
        return _opt_cons(st, "s")
    return False


@_guard
def _m_lArI(st):
    return _among(st, _A1)


@_guard
def _m_yU(st):
    if not _harmony(st):
        return False
    if st.c >= 1 and st.w[st.c - 1] in _U:
        st.c -= 1
        return _opt_cons(st, "y")
    return False


def _simple(table, harmony=True, opt=None):
    def fn(st):
        if harmony and not _harmony(st):
            return False
        if not _among(st, table):
            return False
        if opt is not None:
            return _opt_cons(st, opt)
        return True
    return _guard(fn)


_m_nU = _simple(_A2)
_m_nUn = _simple(_A3, opt="n")
_m_yA = _simple(_A4, opt="y")
_m_nA = _simple(_A5)
_m_DA = _simple(_A6)
_m_ndA = _simple(_A7)
_m_DAn = _simple(_A8)
_m_ndAn = _simple(_A9)
_m_ylA = _simple(_A10, opt="y")
_m_ncA = _simple(_A11, opt="n")
_m_yUm = _simple(_A12, opt="y")
_m_sUn = _simple(_A13)
_m_yUz = _simple(_A14, opt="y")
_m_sUnUz = _simple(_A15, harmony=False)
_m_lAr = _simple(_A16)
_m_nUz = _simple(_A17)
_m_DUr = _simple(_A18)
_m_cAsInA = _simple(_A19, harmony=False)
_m_yDU = _simple(_A20, opt="y")
_m_ysA = _simple(_A21, harmony=False, opt="y")
_m_ymUs = _simple(_A22, opt="y")


@_guard
def _m_ki(st):
    return _ends(st, "ki")


@_guard
def _m_yken(st):
    return _ends(st, "ken") and _opt_cons(st, "y")


def _first(st: _St, *marks) -> bool:
    for m in marks:
        if m(st):
            return True
    return False


def _nominal_verb(st: _St) -> tuple[bool, bool]:
    """returns (matched, continue_noun_suffixes)"""
    st.set_ket()
    cont = True
    d = st.save()
    # alt 1
    if _first(st, _m_ymUs, _m_yDU, _m_ysA, _m_yken):
        st.delete()
        return True, cont
    st.restore(d)
    # alt 2: cAsInA (opt person) ymUs_
    if _m_cAsInA(st):
        _first(st, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        if _m_ymUs(st):
            st.delete()
            return True, cont
    st.restore(d)
    # alt 3: lAr ] delete try([ DUr|yDU|ysA|ymUs_ ]) unset cont
    if _m_lAr(st):
        st.delete()
        d2 = st.save()
        st.set_ket()
        if not _first(st, _m_DUr, _m_yDU, _m_ysA, _m_ymUs):
            st.restore(d2)
        cont = False
        st.delete()
        return True, cont
    st.restore(d)
    # alt 4: nUz (yDU|ysA)
    if _m_nUz(st) and _first(st, _m_yDU, _m_ysA):
        st.delete()
        return True, cont
    st.restore(d)
    # alt 5: (sUnUz|yUz|sUn|yUm) ] delete try([ ymUs_ ])
    if _first(st, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm):
        st.delete()
        d2 = st.save()
        st.set_ket()
        if not _m_ymUs(st):
            st.restore(d2)
        st.delete()
        return True, cont
    st.restore(d)
    # alt 6: DUr ] delete try([ (person|eps) ymUs_ ])
    if _m_DUr(st):
        st.delete()
        d2 = st.save()
        st.set_ket()
        _first(st, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        if not _m_ymUs(st):
            st.restore(d2)
        st.delete()
        return True, cont
    st.restore(d)
    return False, cont


def _try_lar_ki(st: _St, d_outer: int) -> None:
    """try([ lAr ] delete chain_ki) — restore position on any miss."""
    st.set_ket()
    if not _m_lAr(st):
        st.restore(d_outer)
        return
    st.delete()
    if not _chain_ki(st):
        st.restore(d_outer)


def _chain_ki(st: _St) -> bool:
    st.set_ket()
    if not _m_ki(st):
        return False
    d = st.save()
    # alt A: DA
    if _m_DA(st):
        st.delete()
        d2 = st.save()
        st.set_ket()
        if _m_lAr(st):
            st.delete()
            d3 = st.save()
            if not _chain_ki(st):
                st.restore(d3)
        elif _m_possessives(st):
            st.delete()
            _try_lar_ki(st, st.save())
        else:
            st.restore(d2)
        return True
    st.restore(d)
    # alt B: nUn
    if _m_nUn(st):
        st.delete()
        d2 = st.save()
        st.set_ket()
        if _m_lArI(st):
            st.delete()
        else:
            st.restore(d2)
            st.set_ket()
            if _m_possessives(st) or _m_sU(st):
                st.delete()
                _try_lar_ki(st, st.save())
            else:
                st.restore(d2)
                if not _chain_ki(st):
                    st.restore(d2)
        return True
    st.restore(d)
    # alt C: ndA (not deleted unless an inner alternative fires)
    if _m_ndA(st):
        d2 = st.save()
        if _m_lArI(st):
            st.delete()
            return True
        st.restore(d2)
        if _m_sU(st):
            st.delete()
            _try_lar_ki(st, st.save())
            return True
        st.restore(d2)
        if _chain_ki(st):
            return True
        return False
    return False


def _noun_suffixes(st: _St) -> bool:
    d = st.save()
    # alt 1: lAr ] delete try(chain_ki)
    st.set_ket()
    if _m_lAr(st):
        st.delete()
        d2 = st.save()
        if not _chain_ki(st):
            st.restore(d2)
        return True
    st.restore(d)
    # alt 2: ncA ] delete try( lArI | (poss|sU)+try | lAr+chain )
    st.set_ket()
    if _m_ncA(st):
        st.delete()
        d2 = st.save()
        st.set_ket()
        if _m_lArI(st):
            st.delete()
            return True
        st.restore(d2)
        st.set_ket()
        if _m_possessives(st) or _m_sU(st):
            st.delete()
            _try_lar_ki(st, st.save())
            return True
        st.restore(d2)
        st.set_ket()
        if _m_lAr(st):
            st.delete()
            if not _chain_ki(st):
                st.restore(d2)
        else:
            st.restore(d2)
        return True
    st.restore(d)
    # alt 3: (ndA|nA) ( lArI del | sU del try | chain ) — alt fails if none
    st.set_ket()
    if _first(st, _m_ndA, _m_nA):
        d2 = st.save()
        if _m_lArI(st):
            st.delete()
            return True
        st.restore(d2)
        if _m_sU(st):
            st.delete()
            _try_lar_ki(st, st.save())
            return True
        st.restore(d2)
        if _chain_ki(st):
            return True
    st.restore(d)
    # alt 4: (ndAn|nU) ( sU del try | lArI — no delete ) — fails if neither
    st.set_ket()
    if _first(st, _m_ndAn, _m_nU):
        d2 = st.save()
        if _m_sU(st):
            st.delete()
            _try_lar_ki(st, st.save())
            return True
        st.restore(d2)
        if _m_lArI(st):
            return True
    st.restore(d)
    # alt 5: DAn ] delete try( poss+try | lAr+chain-try | chain )
    st.set_ket()
    if _m_DAn(st):
        st.delete()
        d2 = st.save()
        st.set_ket()
        if _m_possessives(st):
            st.delete()
            _try_lar_ki(st, st.save())
            return True
        st.restore(d2)
        st.set_ket()
        if _m_lAr(st):
            st.delete()
            d3 = st.save()
            if not _chain_ki(st):
                st.restore(d3)
            return True
        st.restore(d2)
        if not _chain_ki(st):
            st.restore(d2)
        return True
    st.restore(d)
    # alt 6: (nUn|ylA) ] delete try( lAr-del-chain | (poss|sU)+try | chain )
    st.set_ket()
    if _first(st, _m_nUn, _m_ylA):
        st.delete()
        d2 = st.save()
        st.set_ket()
        if _m_lAr(st):
            st.delete()
            if _chain_ki(st):
                return True
            st.restore(d2)
        st.set_ket()
        if _m_possessives(st) or _m_sU(st):
            st.delete()
            _try_lar_ki(st, st.save())
            return True
        st.restore(d2)
        if not _chain_ki(st):
            st.restore(d2)
        return True
    st.restore(d)
    # alt 7: lArI ] delete
    st.set_ket()
    if _m_lArI(st):
        st.delete()
        return True
    st.restore(d)
    # alt 8: chain_ki
    if _chain_ki(st):
        return True
    st.restore(d)
    # alt 9: (DA|yU|yA) ] delete try( ((poss del try-lAr)|lAr) del chain )
    st.set_ket()
    if _first(st, _m_DA, _m_yU, _m_yA):
        st.delete()
        d2 = st.save()
        st.set_ket()
        matched = False
        d3 = st.save()
        if _m_possessives(st):
            st.delete()
            d4 = st.save()
            st.set_ket()
            if not _m_lAr(st):
                st.restore(d4)
            matched = True
        else:
            st.restore(d3)
            if _m_lAr(st):
                matched = True
        if matched:
            st.delete()
            st.set_ket()
            if not _chain_ki(st):
                st.restore(d2)
        else:
            st.restore(d2)
        return True
    st.restore(d)
    # alt 10: (possessives|sU) ] delete try( lAr-del-chain )
    st.set_ket()
    if _m_possessives(st) or _m_sU(st):
        st.delete()
        _try_lar_ki(st, st.save())
        return True
    st.restore(d)
    return False


def _post_process(w: str) -> str:
    # last consonants: b->p, c->ç, d->t, ğ->k
    if w.endswith("b"):
        w = w[:-1] + "p"
    elif w.endswith("c"):
        w = w[:-1] + "ç"
    elif w.endswith("d"):
        w = w[:-1] + "t"
    elif w.endswith("ğ"):
        w = w[:-1] + "k"
    return w


def _append_U(w: str) -> str:
    if not (w.endswith("d") or w.endswith("g")):
        return w
    # the nearest preceding vowel picks the harmony vowel to append
    for ch in reversed(w[:-1]):
        if ch in "aı":
            return w + "ı"
        if ch in "ei":
            return w + "i"
        if ch in "ou":
            return w + "u"
        if ch in "öü":
            return w + "ü"
    return w


@lru_cache(maxsize=65536)
def turkish_snowball_stem(word: str) -> str:
    if sum(1 for ch in word if ch in _VOWELS) < 2:
        return word
    st = _St(word)
    matched, cont = _nominal_verb(st)
    if not cont:
        return st.w
    _noun_suffixes(st)
    w = st.w
    # postlude
    if w in ("ad", "soyad"):
        return w
    w = _append_U(w)
    w = _post_process(w)
    return w
