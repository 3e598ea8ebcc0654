"""Porter stemmer golden fixtures.

Vocabulary pairs are from Martin Porter's published test vocabulary
(voc.txt/output.txt, public) restricted to words exercising every rule of
the classic algorithm — the variant the reference implements
(``lucene/analysis/common/.../en/PorterStemmer.java``).
"""

import pytest

from lucene_solr_old_spark.functions.porter import porter_stem

GOLDEN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "matting": "mat", "mating": "mate", "meeting": "meet",
    "milling": "mill", "messing": "mess", "meetings": "meet",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # general vocabulary
    "abilities": "abil", "ability": "abil", "absolutely": "absolut",
    "achievement": "achiev", "acquisition": "acquisit", "luxuriously": "luxuri",
    "generalization": "gener", "organization": "organ", "running": "run",
    "universities": "univers", "university": "univers", "utilities": "util",
}


def test_golden_vocabulary():
    for word, stem in GOLDEN.items():
        assert porter_stem(word) == stem, word


def test_short_words_untouched():
    for w in ("a", "is", "be", "ox", "io", ""):
        assert porter_stem(w) == w


def test_idempotent_on_stems():
    # stemming is not idempotent in general, but must be deterministic
    for word in GOLDEN:
        assert porter_stem(word) == porter_stem(word)
