"""Morfologik dictionary lemmatization vs TestMorfologikAnalyzer fixtures.

Expected token streams (terms, offsets, position increments) are
transcribed from the reference's
``lucene/analysis/morfologik/src/test/.../TestMorfologikAnalyzer.java``;
tags from ``testPOSAttribute``.  The compiled polimorf FSA is jar-only,
so the default compact dictionary carries exactly the fixture
vocabulary (see functions/morfologik.py data stance).
"""

import pytest

from lucene_solr_old_spark.functions.morfologik import (
    MorfologikDictionary, WordData, default_dictionary, get_tags,
    make_morfologik_analyzer, morfologik_analyze, morfologik_lemmas)
from lucene_solr_old_spark.functions.tokenizer import get_analyzer


def terms(text, **kw):
    return [t.term for t in morfologik_analyze(text, **kw)]


# -- testSingleTokens --------------------------------------------------------

def test_single_tokens():
    assert terms("a") == ["a"]
    assert terms("liście") == ["liście", "liść", "list", "lista"]
    assert terms("danych") == ["dany", "dana", "dane", "dać"]
    assert terms("ęóąśłżźćń") == ["ęóąśłżźćń"]


# -- testMultipleTokens: terms + offsets + position increments ---------------

def test_multiple_tokens():
    toks = morfologik_analyze("liście danych")
    assert [t.term for t in toks] == [
        "liście", "liść", "list", "lista", "dany", "dana", "dane", "dać"]
    assert [t.start for t in toks] == [0, 0, 0, 0, 7, 7, 7, 7]
    assert [t.end for t in toks] == [6, 6, 6, 6, 13, 13, 13, 13]
    # posInc {1,0,0,0, 1,0,0,0} == absolute positions {0,0,0,0, 1,1,1,1}
    assert [t.pos for t in toks] == [0, 0, 0, 0, 1, 1, 1, 1]


def test_abbreviation_tokens():
    # "T. Glücksberg": StandardTokenizer keeps "T" (trailing dot breaks);
    # T -> tom/tona; the surname is unknown and passes through with case
    toks = morfologik_analyze("T. Glücksberg")
    assert [t.term for t in toks] == ["tom", "tona", "Glücksberg"]
    assert [t.start for t in toks] == [0, 0, 3]
    assert [t.end for t in toks] == [1, 1, 13]
    assert [t.pos for t in toks] == [0, 0, 1]


# -- testCase: verbatim-then-lowercase lookup --------------------------------

def test_case_sensitivity():
    assert terms("AGD") == ["AGD", "artykuły gospodarstwa domowego"]
    assert terms("agd") == ["artykuły gospodarstwa domowego"]
    assert terms("Poznania") == ["Poznań"]
    assert terms("poznania") == ["poznanie", "poznać"]
    assert terms("Aarona") == ["Aaron"]
    assert terms("aarona") == ["aarona"]
    # unknown capitalized surface falls back to the lowercase entry
    assert terms("Liście") == ["liście", "liść", "list", "lista"]


# -- testPOSAttribute --------------------------------------------------------

def test_pos_tags():
    lemmas = morfologik_lemmas("liście")
    assert [w.stem for w in lemmas] == ["liście", "liść", "list", "lista"]
    assert sorted(get_tags(lemmas[0])) == [
        "subst:sg:acc:n2", "subst:sg:nom:n2", "subst:sg:voc:n2"]
    assert sorted(get_tags(lemmas[1])) == [
        "subst:pl:acc:m3", "subst:pl:nom:m3", "subst:pl:voc:m3"]
    assert sorted(get_tags(lemmas[2])) == [
        "subst:sg:loc:m3", "subst:sg:voc:m3"]
    assert sorted(get_tags(lemmas[3])) == [
        "subst:sg:dat:f", "subst:sg:loc:f"]
    # null tag -> empty list (MorfologikFilter.popNextLemma else-branch)
    assert get_tags(WordData("dany", None)) == []


# -- testKeywordAttrTokens ---------------------------------------------------

def test_keyword_marker_bypasses_lookup():
    toks = morfologik_analyze("liście danych", keywords={"liście"})
    assert [t.term for t in toks] == ["liście", "dany", "dana", "dane", "dać"]
    assert [t.start for t in toks] == [0, 7, 7, 7, 7]
    assert [t.end for t in toks] == [6, 13, 13, 13, 13]
    assert [t.pos for t in toks] == [0, 1, 1, 1, 1]


# -- dictionary plumbing -----------------------------------------------------

def test_tsv_round_trip():
    d = MorfologikDictionary.from_tsv(
        "# comment\n"
        "kota\tkot\tsubst:sg:gen:m2\n"
        "kota\tkota\tsubst:sg:nom:f\n"
        "\n"
        "psu\tpies\n")
    assert [w.stem for w in d.lookup("kota")] == ["kot", "kota"]
    assert d.lookup("kota")[0].tag == "subst:sg:gen:m2"
    assert d.lookup("psu") == [WordData("pies", None)]
    assert d.lookup("nieznane") == []
    assert "kota" in d and len(d) == 2
    with pytest.raises(ValueError):
        MorfologikDictionary.from_tsv("notabbed")


def test_custom_dictionary_analyzer():
    d = MorfologikDictionary.from_tsv("kota\tkot\npsu\tpies\n")
    chain = make_morfologik_analyzer(d)
    assert [t.term for t in chain("kota psu liście")] == [
        "kot", "pies", "liście"]  # fixture vocab absent from custom dict


def test_registered_analyzer():
    a = get_analyzer("morfologik")
    assert [t.term for t in a("danych")] == ["dany", "dana", "dane", "dać"]


def test_default_dictionary_paradigms():
    d = default_dictionary()
    assert [w.stem for w in d.lookup("studenci")] == ["student"]
    assert [w.stem for w in d.lookup("psa")] == ["pies"]
    assert morfologik_lemmas("Studenci", d)[0].stem == "student"
