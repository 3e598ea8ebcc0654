"""Hunspell dictionary stemmer (functions/hunspell.py), validated
against the reference's own test.aff/test.dic expectations
(HunspellStemmerTest, both modes; outputs cross-checked against the
compiled reference stemmer in development)."""

from __future__ import annotations

import pytest

from lucene_solr_old_spark.functions.hunspell import (
    HunspellDictionary, hunspell_stem)

_AFF = """SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o
"""

_DIC = """9
lucen/A
lucene
mahout/A
olr/B
ab/C
Apach/A
Foo/E
foo/D
Moo/E
"""


@pytest.fixture(scope="module")
def dic_ignore():
    return HunspellDictionary(_AFF, _DIC, ignore_case=True)


@pytest.fixture(scope="module")
def dic_exact():
    return HunspellDictionary(_AFF, _DIC, ignore_case=False)


IGNORECASE_CASES = [
    ("lucene", ["lucene", "lucen"]),    # dict surface + SFX A
    ("lucenes", []),
    ("mahoute", ["mahout"]),
    ("solr", ["olr"]),                  # PFX B
    ("abcd", ["ab"]),                   # twofold suffix via /C chain
    ("apache", ["apach"]), ("APACHE", ["apach"]),
    ("foos", ["foo"]), ("mood", ["moo"]),
    ("Food", []),                       # Foo/E overridden by foo/D
    ("Mood", ["moo"]),
    ("moos", []), ("luceneses", []), ("abcds", []),
]

CASESENS_CASES = [
    ("apache", []), ("Apache", ["Apach"]), ("APACHE", []),
    ("Foos", []), ("foos", ["foo"]),
    ("Food", ["Foo"]), ("food", []),
    ("Mood", ["Moo"]), ("mood", []),
    ("lucene", ["lucene", "lucen"]), ("Lucene", []),
]


@pytest.mark.parametrize("word,expect", IGNORECASE_CASES)
def test_hunspell_ignore_case(dic_ignore, word, expect):
    assert hunspell_stem(dic_ignore, word) == expect


@pytest.mark.parametrize("word,expect", CASESENS_CASES)
def test_hunspell_case_sensitive(dic_exact, word, expect):
    assert hunspell_stem(dic_exact, word) == expect


def test_recursion_cap_stops_infinite_chains(dic_ignore):
    # the /C continuation on 'd' recurses at most twice
    assert hunspell_stem(dic_ignore, "abcdd") == []


def test_make_hunspell_analyzer_stacks_stems(dic_ignore):
    from lucene_solr_old_spark.functions.hunspell import (
        make_hunspell_analyzer)

    a = make_hunspell_analyzer(dic_ignore)
    assert [(t.term, t.pos) for t in a("lucene is awesome")] == [
        ("lucene", 0), ("lucen", 0), ("is", 1), ("awesome", 2)]
    a2 = make_hunspell_analyzer(dic_ignore, longest_only=True)
    assert [t.term for t in a2("lucene is awesome")] == [
        "lucene", "is", "awesome"]
