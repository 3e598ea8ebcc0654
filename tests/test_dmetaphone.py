"""DoubleMetaphone encoder + filter vs the reference fixtures.

Every expectation below is transcribed from
``lucene/analysis/phonetic/src/test/org/apache/lucene/analysis/phonetic/DoubleMetaphoneFilterTest.java``
(whitespace-tokenized input -> DoubleMetaphoneFilter(maxCodeLength,
inject)), plus canonical commons-codec encoding pairs.
"""

import pytest

from lucene_solr_old_spark.functions.dmetaphone import (
    double_metaphone, double_metaphone_filter)
from lucene_solr_old_spark.functions.tokenizer import Token, get_analyzer


def _ws(text):
    return [Token(w, i, 0, 0) for i, w in enumerate(text.split())]


def _terms(tokens):
    return [t.term for t in tokens]


# ---- DoubleMetaphoneFilterTest.java fixtures ------------------------------

def test_size4_false_inject():
    # testSize4FalseInject:34-38
    out = double_metaphone_filter(_ws("international"), 4, inject=False)
    assert _terms(out) == ["ANTR"]


def test_size4_true_inject():
    # testSize4TrueInject:40-44
    out = double_metaphone_filter(_ws("international"), 4, inject=True)
    assert _terms(out) == ["international", "ANTR"]


def test_alternate_inject_false():
    # testAlternateInjectFalse:46-50 — both codes surface even uninjected
    out = double_metaphone_filter(_ws("Kuczewski"), 4, inject=False)
    assert _terms(out) == ["KSSK", "KXFS"]


def test_size8_false_inject():
    # testSize8FalseInject:52-56
    out = double_metaphone_filter(_ws("international"), 8, inject=False)
    assert _terms(out) == ["ANTRNXNL"]


def test_non_convertible_with_inject():
    # testNonConvertableStringsWithInject:58-62
    out = double_metaphone_filter(_ws("12345 #$%@#^%&"), 8, inject=True)
    assert _terms(out) == ["12345", "#$%@#^%&"]


def test_non_convertible_without_inject():
    # testNonConvertableStringsWithoutInject:64-73
    out = double_metaphone_filter(_ws("12345 #$%@#^%&"), 8, inject=False)
    assert _terms(out) == ["12345", "#$%@#^%&"]
    out = double_metaphone_filter(_ws("12345 #$%@#^%& hello"), 8,
                                  inject=False)
    assert _terms(out) == ["12345", "#$%@#^%&", "HL"]


def test_empty_term_passthrough():
    # testEmptyTerm:103-111
    out = double_metaphone_filter([Token("", 0, 0, 0)], 8, inject=False)
    assert _terms(out) == [""]


# ---- canonical commons-codec pairs ----------------------------------------

@pytest.mark.parametrize("word,primary,alternate", [
    # Philips' own worked examples + commons-codec DoubleMetaphoneTest
    ("smith", "SM0", "XMT"),
    ("schmidt", "XMT", "SMT"),
    ("snider", "SNTR", "XNTR"),
    ("schneider", "XNTR", "SNTR"),
    ("thomas", "TMS", "TMS"),
    ("jose", "HS", "HS"),
    ("michael", "MKL", "MXL"),
    ("filipowicz", "FLPT", "FLPF"),
    ("wasserman", "ASRM", "FSRM"),
    ("vasserman", "FSRM", "FSRM"),
    ("dumb", "TM", "TM"),
    ("edge", "AJ", "AJ"),
    ("edgar", "ATKR", "ATKR"),
    ("caesar", "SSR", "SSR"),
    ("chianti", "KNT", "KNT"),
    ("school", "SKL", "SKL"),
    ("knight", "NT", "NT"),
    ("wright", "RT", "RT"),
    ("breaux", "PR", "PR"),
    ("cabrillo", "KPRL", "KPR"),
    ("island", "ALNT", "ALNT"),
    ("zhao", "J", "J"),
    ("sugar", "XKR", "SKR"),
    ("ghislane", "JLN", "JLN"),
    ("uomo", "AM", "AM"),
    ("arnow", "ARN", "ARNF"),
])
def test_canonical_pairs(word, primary, alternate):
    assert double_metaphone(word) == (primary, alternate)


def test_max_len_truncation():
    assert double_metaphone("international", 2) == ("AN", "AN")
    assert double_metaphone("kuczewski", 1) == ("K", "K")


def test_analyzer_registered():
    toks = get_analyzer("ws_dmetaphone")("Smith saw Schmidt")
    assert _terms(toks) == ["smith", "SM0", "XMT",
                            "saw", "S", "SF",
                            "schmidt", "XMT", "SMT"]
    # codes stack at the original token's position
    assert [t.pos for t in toks] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
