"""Greek analysis: GreekLowerCaseFilter + GreekStemmer.

Reference: ``lucene/analysis/common/src/java/org/apache/lucene/analysis/el/``
— ``GreekLowerCaseFilter.java:68-126`` (lowercase + tonos/dialytika
removal + final-sigma standardization) and ``GreekStemmer.java`` (Ntais'
stemmer as modified by Saroukos): 23 ordered rules (0-20 "short", 21 the
"long list" applied only when nothing else fired, 22 the
comparative/superlative tail), each with whole-stem exception sets and
add-back recoveries.

The port preserves the reference's exact control flow INCLUDING its
Java operator-precedence quirks (e.g. ``len > 7 && A || B || C`` parses
as ``(len > 7 and A) or B or C`` — so the ``len`` guard applies only to
the first suffix of those chains).  Validated against every inline
fixture of ``TestGreekStemmer.java``.
"""

from __future__ import annotations

from .tokenizer import Token, standard_tokenize

__all__ = ["greek_lowercase", "greek_stem", "greek_analyze",
           "GREEK_STOP_WORDS"]

GREEK_STOP_WORDS = frozenset("""
ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε
ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα
μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο
ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ αυτα
εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ οπωσ ομωσ
ισωσ οσο οτι
""".split())


_EL_LOWER = {
    "ς": "σ",                              # final sigma
    "Ά": "α", "ά": "α",          # alpha tonos
    "Έ": "ε", "έ": "ε",          # epsilon tonos
    "Ή": "η", "ή": "η",          # eta tonos
    "Ί": "ι", "Ϊ": "ι", "ί": "ι",
    "ϊ": "ι", "ΐ": "ι",          # iota variants
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ",
    "ϋ": "υ", "ΰ": "υ",          # upsilon variants
    "Ό": "ο", "ό": "ο",          # omicron tonos
    "Ώ": "ω", "ώ": "ω",          # omega tonos
    "΢": "ς",                              # reserved (bw compat)
}


def greek_lowercase(s: str) -> str:
    """GreekLowerCaseFilter.lowerCase (:68-126), exact."""
    return "".join(_EL_LOWER.get(c, _EL_LOWER.get(c.lower(), c.lower()))
                   for c in s)


def _ewv(s: str) -> bool:
    """endsWithVowel (:793-808)."""
    return bool(s) and s[-1] in "αεηιουω"


def _ewv_no_y(s: str) -> bool:
    """endsWithVowelNoY (:810-824) — υ excluded."""
    return bool(s) and s[-1] in "αεηιοω"


def _r0(s):
    n = len(s)
    if n > 9 and (s.endswith("καθεστωτοσ") or s.endswith("καθεστωτων")):
        return s[:-4]
    if n > 8 and (s.endswith("γεγονοτοσ") or s.endswith("γεγονοτων")):
        return s[:-4]
    if n > 8 and s.endswith("καθεστωτα"):
        return s[:-3]
    if n > 7 and (s.endswith("τατογιου") or s.endswith("τατογιων")):
        return s[:-4]
    if n > 7 and s.endswith("γεγονοτα"):
        return s[:-3]
    if n > 7 and s.endswith("καθεστωσ"):
        return s[:-2]
    # Java precedence: the n>6 guard binds only to the first suffix
    if ((n > 6 and s.endswith("σκαγιου")) or s.endswith("σκαγιων")
            or s.endswith("ολογιου") or s.endswith("ολογιων")
            or s.endswith("κρεατοσ") or s.endswith("κρεατων")
            or s.endswith("περατοσ") or s.endswith("περατων")
            or s.endswith("τερατοσ") or s.endswith("τερατων")):
        return s[:-4]
    if n > 6 and s.endswith("τατογια"):
        return s[:-3]
    if n > 6 and s.endswith("γεγονοσ"):
        return s[:-2]
    if n > 5 and (s.endswith("φαγιου") or s.endswith("φαγιων")
                  or s.endswith("σογιου") or s.endswith("σογιων")):
        return s[:-4]
    if n > 5 and (s.endswith("σκαγια") or s.endswith("ολογια")
                  or s.endswith("κρεατα") or s.endswith("περατα")
                  or s.endswith("τερατα")):
        return s[:-3]
    if n > 4 and (s.endswith("φαγια") or s.endswith("σογια")
                  or s.endswith("φωτοσ") or s.endswith("φωτων")):
        return s[:-3]
    if n > 4 and (s.endswith("κρεασ") or s.endswith("περασ")
                  or s.endswith("τερασ")):
        return s[:-2]
    if n > 3 and s.endswith("φωτα"):
        return s[:-2]
    if n > 2 and s.endswith("φωσ"):
        return s[:-1]
    return s


def _r1(s):
    if len(s) > 4 and (s.endswith("αδεσ") or s.endswith("αδων")):
        suf = s[-4:]
        s = s[:-4]
        if not s.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                           "νταντ", "κυρ", "θει", "πεθερ")):
            s += suf[:2]                        # add back -αδ
    return s


def _r2(s):
    if len(s) > 4 and (s.endswith("εδεσ") or s.endswith("εδων")):
        suf = s[-4:]
        s = s[:-4]
        if s.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                       "μιλ")):
            s += suf[:2]                        # add back -εδ
    return s


def _r3(s):
    if len(s) > 5 and (s.endswith("ουδεσ") or s.endswith("ουδων")):
        suf = s[-5:]
        s = s[:-5]
        if s.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
                       "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ",
                       "φε")):
            s += suf[:3]                        # add back -ουδ
    return s


_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])


def _r4(s):
    if len(s) > 3 and (s.endswith("εωσ") or s.endswith("εων")):
        s = s[:-3]
        if s in _EXC4:
            s += "ε"
    return s


def _r5(s):
    if len(s) > 2 and s.endswith("ια"):
        s = s[:-2]
        if _ewv(s):
            s += "ι"
    elif len(s) > 3 and (s.endswith("ιου") or s.endswith("ιων")):
        s = s[:-3]
        if _ewv(s):
            s += "ι"
    return s


_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"])


def _r6(s):
    removed = False
    if len(s) > 3 and (s.endswith("ικα") or s.endswith("ικο")):
        s = s[:-3]
        removed = True
    elif len(s) > 4 and (s.endswith("ικου") or s.endswith("ικων")):
        s = s[:-4]
        removed = True
    if removed and (_ewv(s) or s in _EXC6):
        s += "ικ"
    return s


_EXC7 = frozenset(["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                   "πεθ", "πικρ", "ποτ", "σιχ", "χ"])


def _r7(s):
    if len(s) == 5 and s.endswith("αγαμε"):
        return s[:-1]
    if len(s) > 7 and s.endswith("ηθηκαμε"):
        s = s[:-7]
    elif len(s) > 6 and s.endswith("ουσαμε"):
        s = s[:-6]
    elif len(s) > 5 and (s.endswith("αγαμε") or s.endswith("ησαμε")
                         or s.endswith("ηκαμε")):
        s = s[:-5]
    if len(s) > 3 and s.endswith("αμε"):
        s = s[:-3]
        if s in _EXC7:
            s += "αμ"
    return s


_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])


def _r8(s):
    removed = False
    n = len(s)
    if n > 8 and s.endswith("ιουντανε"):
        s = s[:-8]
        removed = True
    # Java precedence: the length guard binds only to the first suffix
    elif ((n > 7 and s.endswith("ιοντανε")) or s.endswith("ουντανε")
          or s.endswith("ηθηκανε")):
        s = s[:-7]
        removed = True
    elif ((n > 6 and s.endswith("ιοτανε")) or s.endswith("οντανε")
          or s.endswith("ουσανε")):
        s = s[:-6]
        removed = True
    elif ((n > 5 and s.endswith("αγανε")) or s.endswith("ησανε")
          or s.endswith("οτανε") or s.endswith("ηκανε")):
        s = s[:-5]
        removed = True
    if removed and s in _EXC8A:
        s += "αγαν"
    if len(s) > 3 and s.endswith("ανε"):
        s = s[:-3]
        if _ewv_no_y(s) or s in _EXC8B:
            s += "αν"
    return s


_EXC9 = frozenset(["αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                   "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                   "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ",
                   "εμ", "θαρρ", "θ"])


def _r9(s):
    if len(s) > 5 and s.endswith("ησετε"):
        s = s[:-5]
    if len(s) > 3 and s.endswith("ετε"):
        s = s[:-3]
        if (s in _EXC9 or _ewv_no_y(s)
                or s.endswith(("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ",
                               "ενδ", "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ",
                               "ροθ", "σθ", "πυρ", "αιν", "συνδ", "συν",
                               "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
                               "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ",
                               "ωφελ"))):
            s += "ετ"
    return s


def _r10(s):
    if len(s) > 5 and (s.endswith("οντασ") or s.endswith("ωντασ")):
        s = s[:-5]
        if len(s) == 3 and s == "αρχ":
            s += "οντ"                          # add back *ντ, force ο
        elif s.endswith("κρε"):
            s += "ωντ"                          # add back *ντ, force ω
    return s


def _r11(s):
    if len(s) > 6 and s.endswith("ομαστε"):
        s = s[:-6]
        if len(s) == 2 and s == "ον":
            s += "ομαστ"
    elif len(s) > 7 and s.endswith("ιομαστε"):
        s = s[:-7]
        if len(s) == 2 and s == "ον":
            s += "ομαστ"
    return s


_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset(["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"])


def _r12(s):
    if len(s) > 5 and s.endswith("ιεστε"):
        s = s[:-5]
        if s in _EXC12A:
            s += "ιεστ"
    if len(s) > 4 and s.endswith("εστε"):
        s = s[:-4]
        if s in _EXC12B:
            s += "εστ"
    return s


_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])


def _r13(s):
    if len(s) > 6 and s.endswith("ηθηκεσ"):
        s = s[:-6]
    elif len(s) > 5 and (s.endswith("ηθηκα") or s.endswith("ηθηκε")):
        s = s[:-5]
    removed = False
    if len(s) > 4 and s.endswith("ηκεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and (s.endswith("ηκα") or s.endswith("ηκε")):
        s = s[:-3]
        removed = True
    if removed and (s in _EXC13
                    or s.endswith(("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ",
                                   "πιθ"))):
        s += "ηκ"
    return s


_EXC14 = frozenset(["φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ",
                    "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ",
                    "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
                    "τσα"])


def _r14(s):
    removed = False
    if len(s) > 5 and s.endswith("ουσεσ"):
        s = s[:-5]
        removed = True
    elif len(s) > 4 and (s.endswith("ουσα") or s.endswith("ουσε")):
        s = s[:-4]
        removed = True
    if removed and (s in _EXC14 or _ewv(s)
                    or s.endswith(("ποδαρ", "βλεπ", "πανταχ", "φρυδ",
                                   "μαντιλ", "μαλλ", "κυματ", "λαχ",
                                   "ληγ", "φαγ", "ομ", "πρωτ"))):
        s += "ουσ"
    return s


_EXC15A = frozenset([
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι",
    "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
    "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
    "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ",
    "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ",
    "π", "τρ", "μ"])
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])


def _r15(s):
    removed = False
    if len(s) > 4 and s.endswith("αγεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and (s.endswith("αγα") or s.endswith("αγε")):
        s = s[:-3]
        removed = True
    if removed:
        cond1 = (s in _EXC15A
                 or s.endswith(("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ",
                                "φρ", "πρ", "λοχ", "σμην")))
        cond2 = s in _EXC15B or s.endswith("κολλ")
        if cond1 and not cond2:
            s += "αγ"
    return s


_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"])


def _r16(s):
    removed = False
    if len(s) > 4 and s.endswith("ησου"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and (s.endswith("ησε") or s.endswith("ησα")):
        s = s[:-3]
        removed = True
    if removed and s in _EXC16:
        s += "ησ"
    return s


_EXC17 = frozenset(["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                    "ευχρ", "κοινοχρ", "παλιμψ"])


def _r17(s):
    if len(s) > 4 and s.endswith("ηστε"):
        s = s[:-4]
        if s in _EXC17:
            s += "ηστ"
    return s


_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])


def _r18(s):
    removed = False
    if len(s) > 6 and (s.endswith("ησουνε") or s.endswith("ηθουνε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουνε"):
        s = s[:-4]
        removed = True
    if removed and s in _EXC18:
        s += "ουν"
    return s


_EXC19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"])


def _r19(s):
    removed = False
    if len(s) > 6 and (s.endswith("ησουμε") or s.endswith("ηθουμε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουμε"):
        s = s[:-4]
        removed = True
    if removed and s in _EXC19:
        s += "ουμ"
    return s


def _r20(s):
    if len(s) > 5 and (s.endswith("ματων") or s.endswith("ματοσ")):
        return s[:-3]
    if len(s) > 4 and s.endswith("ματα"):
        return s[:-2]
    return s


def _r21(s):
    n = len(s)
    if n > 9 and s.endswith("ιοντουσαν"):
        return s[:-9]
    if n > 8 and s.endswith(("ιομασταν", "ιοσασταν", "ιουμαστε",
                             "οντουσαν")):
        return s[:-8]
    if n > 7 and s.endswith(("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε",
                             "ιοσουνα", "ιουνται", "ιουνταν", "ηθηκατε",
                             "ομασταν", "οσασταν", "ουμαστε")):
        return s[:-7]
    if n > 6 and s.endswith(("ιομουν", "ιονταν", "ιοσουν", "ηθειτε",
                             "ηθηκαν", "ομουνα", "οσαστε", "οσουνα",
                             "ουνται", "ουνταν", "ουσατε")):
        return s[:-6]
    if n > 5 and s.endswith(("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν",
                             "ιουμα", "ηθεισ", "ηθουν", "ηκατε", "ησατε",
                             "ησουν", "ομουν", "ονται", "ονταν", "οσουν",
                             "ουμαι", "ουσαν")):
        return s[:-5]
    if n > 4 and s.endswith(("αγαν", "αμαι", "ασαι", "αται", "ειτε",
                             "εσαι", "εται", "ηδεσ", "ηδων", "ηθει",
                             "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
                             "οταν")):
        return s[:-4]
    if n > 3 and s.endswith(("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")):
        return s[:-3]
    if n > 2 and s.endswith(("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι",
                             "οσ", "ου", "υσ", "ων")):
        return s[:-2]
    if n > 1 and _ewv(s):
        return s[:-1]
    return s


def _r22(s):
    if s.endswith(("εστερ", "εστατ")):
        return s[:-5]
    if s.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return s[:-4]
    return s


def greek_stem(s: str) -> str:
    """GreekStemmer.stem (:35-66), exact: rules 0-20, then the long list
    (21) only if nothing fired, then the comparative tail (22)."""
    if len(s) < 4:
        return s
    orig = len(s)
    for rule in (_r0, _r1, _r2, _r3, _r4, _r5, _r6, _r7, _r8, _r9, _r10,
                 _r11, _r12, _r13, _r14, _r15, _r16, _r17, _r18, _r19,
                 _r20):
        s = rule(s)
    if len(s) == orig:
        s = _r21(s)
    return _r22(s)


def greek_analyze(text: str) -> list[Token]:
    """GreekAnalyzer.createComponents: Standard -> GreekLowerCase ->
    Stop(greek) -> GreekStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = greek_lowercase(term)
        if t in GREEK_STOP_WORDS:
            continue
        out.append(Token(greek_stem(t), pos, start, end))
    return out


def _register():
    from .tokenizer import register_analyzer
    register_analyzer("greek", greek_analyze)


_register()
