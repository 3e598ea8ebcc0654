"""Porter stemmer — faithful re-derivation of the Lucene/Martin-Porter variant.

Semantics from ``lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
PorterStemmer.java`` (546 LoC).  This is the *classic* 1980 algorithm with the
two published revisions Lucene carries (``bli -> ble``, ``logi -> log``) and
the two "Bug 1 / Bug 2" guards.  NLTK's PorterStemmer is NOT identical (it
implements Martin Porter's later "NLTK extensions"), hence this port.

Notes mirrored from the reference:
  * words shorter than 3 chars are returned untouched (``stem(): k > k0+1``);
  * ``cons(i)``: 'y' is a consonant at position 0, else consonant iff the
    previous char is not a consonant;
  * step6's 'l'-undoubling measures m() against j frozen at entry (quirk kept).
"""

from __future__ import annotations

from functools import lru_cache

__all__ = ["porter_stem", "porter_stem_list"]

_VOWELS = frozenset("aeiou")


class _Stemmer:
    """Single-word stemmer over a char list; mirrors the reference's b/j/k."""

    __slots__ = ("b", "j", "k")

    def __init__(self, word: str):
        self.b = list(word)
        self.j = 0
        self.k = len(word) - 1

    def cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Consonant-sequence count in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        for i in range(l):
            if self.b[o + i] != s[i]:
                return False
        self.j = self.k - l
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            if o + i < len(self.b):
                self.b[o + i] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    def step1(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self) -> None:
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"),
              ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def step3(self) -> None:
        if self.k == 0:
            return  # "Bug 1" guard
        for suf, rep in self._STEP3.get(self.b[self.k - 1], ()):
            if self.ends(suf):
                self.r(rep)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def step4(self) -> None:
        for suf, rep in self._STEP4.get(self.b[self.k], ()):
            if self.ends(suf):
                self.r(rep)
                return

    _STEP5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def step5(self) -> None:
        if self.k == 0:
            return  # "Bug 1" guard
        ch = self.b[self.k - 1]
        if ch == "o":
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass  # matched ("Bug 2" guard: j >= 0)
            elif self.ends("ou"):
                pass
            else:
                return
        else:
            sufs = self._STEP5.get(ch)
            if sufs is None:
                return
            for suf in sufs:
                if self.ends(suf):
                    break
            else:
                return
        if self.m() > 1:
            self.k = self.j

    def step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1

    def run(self) -> str:
        if self.k > 1:
            self.step1()
            self.step2()
            self.step3()
            self.step4()
            self.step5()
            self.step6()
        return "".join(self.b[: self.k + 1])


@lru_cache(maxsize=65536)
def porter_stem(word: str) -> str:
    """Stem one lowercase word (non-[a-z] input passes through unchanged
    character-wise, same as the reference which only special-cases aeiouy)."""
    if len(word) < 3:
        return word
    return _Stemmer(word).run()


def porter_stem_list(words) -> list:
    return [porter_stem(w) for w in words]
