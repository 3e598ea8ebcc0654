"""Stempel (Egothor trie) Polish stemming — reference goldens from
TestPolishAnalyzer, run against the reference's own trained table when
the checkout is present."""

import pytest

from lucene_solr_old_spark.functions.stempel import (POLISH_STOP_WORDS,
                                                     DiffApply,
                                                     load_stemmer,
                                                     polish_analyze)

st = load_stemmer()
needs_table = pytest.mark.skipif(st is None,
                                 reason="reference table not present")


@needs_table
def test_polish_analyzer_goldens():
    # TestPolishAnalyzer.testBasics: stemming + stopword removal
    assert [t.term for t in polish_analyze("studenta")] == ["student"]
    assert [t.term for t in polish_analyze("studenci")] == ["student"]
    assert [t.term for t in polish_analyze("był")] == []


@needs_table
def test_lemmatization_not_truncation():
    # the trained table LEMMATIZES (zabił -> zabić), it doesn't strip
    assert st.stem("zabił") == "zabić"
    assert st.stem("zabiła") == "zabić"
    assert st.stem("zabiło") == "zabić"


@needs_table
def test_min_length_guard():
    # StempelFilter.DEFAULT_MIN_LENGTH = 3: terms of length <= 3 pass
    assert [t.term for t in polish_analyze("dom")] == ["dom"]


def test_diff_apply_commands():
    buf = list("abcdef")
    DiffApply(buf, "Da")  # delete 1 at end
    assert "".join(buf) == "abcde"
    buf = list("abcdef")
    DiffApply(buf, "Rz")  # replace last
    assert "".join(buf) == "abcdez"
    buf = list("abc")
    DiffApply(buf, "Ix")  # insert after last
    assert "".join(buf) == "abcx"
    buf = list("ab")
    DiffApply(buf, "Dz")  # out of bounds -> silent partial (reference)
    assert isinstance(buf, list)


def test_stopword_list_size():
    assert len(POLISH_STOP_WORDS) == 182


def test_registered_chain_without_table_is_safe():
    from lucene_solr_old_spark.functions.stempel import make_polish_analyzer
    chain = make_polish_analyzer(table_path="/nonexistent")
    assert [t.term for t in chain("Studenci i domy")] == ["studenci", "domy"]
