"""ICU transform/normalizer/collation analogues — transform fixtures
are the reference's own TestICUTransformFilter goldens."""

import pytest

from lucene_solr_old_spark.functions.icu2 import (TransformRuleError,
                                                  icu_collation_key,
                                                  icu_normalize,
                                                  icu_transform,
                                                  make_transliterator)


# ---- TestICUTransformFilter.testBasicFunctionality -------------------------

def test_traditional_simplified():
    assert icu_transform("簡化字", "Traditional-Simplified") == "简化字"


def test_katakana_hiragana():
    assert icu_transform("ヒラガナ", "Katakana-Hiragana") == "ひらがな"


def test_fullwidth_halfwidth():
    assert icu_transform("アルアノリウ", "Fullwidth-Halfwidth") == "ｱﾙｱﾉﾘｳ"


def test_any_latin_greek():
    assert icu_transform("Αλφαβητικός Κατάλογος", "Any-Latin") == \
        "Alphabētikós Katálogos"


def test_nfd_remove_marks():
    assert icu_transform("Alphabētikós Katálogos",
                         "NFD; [:Nonspacing Mark:] Remove") == \
        "Alphabetikos Katalogos"


def test_han_latin():
    assert icu_transform("中国", "Han-Latin") == "zhōng guó"


def test_compound_with_casefold():
    # testOptimizer2
    assert icu_transform("ABCDE", "Traditional-Simplified; CaseFold") == \
        "abcde"


# ---- custom rules (testCustomFunctionality 1+2) ----------------------------

def test_custom_rules():
    tr = make_transliterator("a > b; b > c;")
    assert tr("abacadaba") == "bcbcbdbcb"


def test_custom_rules_precontext():
    tr = make_transliterator("c { a > b; a > d;")
    assert tr("caa") == "cbd"


def test_custom_rules_surrogate_escape():
    tr = make_transliterator("\\U00020087 > x;")
    assert tr("a\U00020087b") == "axb"


def test_bad_rule_raises():
    with pytest.raises(TransformRuleError):
        make_transliterator("a <> b")
    with pytest.raises(TransformRuleError):
        icu_transform("x", "No-Such-Transform")


# ---- round trips and extra transforms --------------------------------------

def test_hiragana_katakana_roundtrip():
    assert icu_transform("ひらがな", "Hiragana-Katakana") == "ヒラガナ"


def test_halfwidth_fullwidth_roundtrip():
    assert icu_transform("ｱﾙｱﾉﾘｳ", "Halfwidth-Fullwidth") == "アルアノリウ"
    assert icu_transform("ｶﾞｷﾞ", "Halfwidth-Fullwidth") == "ガギ"
    assert icu_transform("Ｔｅｓｔ１２３", "Fullwidth-Halfwidth") == "Test123"


def test_cyrillic_latin_iso9():
    assert icu_transform("Российская Федерация", "Cyrillic-Latin") == \
        "Rossijskaâ Federaciâ"


# ---- normalizer ------------------------------------------------------------

def test_nfkc_cf():
    # TestICUNormalizer2Filter-style: case fold + compatibility fold
    assert icu_normalize("This is a Ｔｅｓｔ") == "this is a test"
    assert icu_normalize("ΑΛΦΑ") == "αλφα"
    assert icu_normalize("zwnj​gone") == "zwnjgone"


# ---- collation keys --------------------------------------------------------

def _sorts(words, locale):
    return sorted(words, key=lambda w: icu_collation_key(w, locale))


def test_danish_order():
    # da: z < æ < ø < å (å LAST — unlike codepoint order)
    assert _sorts(["åben", "zebra", "æble", "østen"], "da") == \
        ["zebra", "æble", "østen", "åben"]


def test_swedish_order():
    assert _sorts(["örn", "zon", "äpple", "ål"], "sv") == \
        ["zon", "ål", "äpple", "örn"]


def test_turkish_dotless():
    # tr: ı sorts before i
    assert _sorts(["ilk", "ısı", "iki"], "tr") == ["ısı", "iki", "ilk"]


def test_german_umlauts_with_base():
    assert _sorts(["zebra", "äpfel", "apfel"], "de") == \
        ["apfel", "äpfel", "zebra"]


def test_key_prefix_words_sort_first():
    # primary level must dominate: "apfel" < "apfelz", "äpfel" > "apfel"
    ks = _sorts(["apfelz", "äpfel", "apfel"], "de")
    assert ks == ["apfel", "äpfel", "apfelz"]
    k = icu_collation_key("Übung", "de")
    assert all(c in "0123456789abcdef.|" for c in k)
