"""Morfologik dictionary-driven Polish lemmatization.

Re-derivation of the reference's
``lucene/analysis/morfologik/src/java/org/apache/lucene/analysis/
morfologik/MorfologikFilter.java`` (lemma lookup with
verbatim-then-lowercase fallback at :122-140, multi-lemma emission at
position-increment 0 via the restored state at :126-131, keyword bypass
at :133, tag splitting on ``+|\\|`` at :89-111) and
``MorfologikAnalyzer.java:60-66`` — chain is StandardTokenizer ->
StandardFilter(no-op) -> MorfologikFilter, with **no** lowercase or
stop filter, so unmatched tokens keep their original case.

Data stance (same as :mod:`.stempel` for the Egothor tables): the
reference loads the compiled polimorf FSA out of
``morfologik-polish-1.7.1.jar``, which is not part of the source
checkout (``lucene/licenses/morfologik-polish-1.7.1.jar.sha1`` is a
checksum stub).  The dictionary is therefore pluggable:

* :meth:`MorfologikDictionary.from_tsv` loads the textual
  ``surface<TAB>stem<TAB>tag`` format Morfologik dictionaries are
  compiled from (one line per (surface, lemma) pair; a surface form
  repeats once per lemma, order preserved — the reference tests rely on
  lemma order);
* :func:`default_dictionary` is a compact built-in covering the
  reference's own ``TestMorfologikAnalyzer`` fixture vocabulary (the
  public Apache test data — lemma lists and, where the fixtures pin
  them, the morphosyntactic tags) plus a small sample of common Polish
  paradigms, so the filter is exercisable without the jar.

Deviation (documented): ``toLowercase`` in the reference lowercases per
code point with ``Character.toLowerCase``; here ``str.lower()`` is used,
which differs only for locale-special dotted/dotless-I forms absent
from Polish text.
"""

from __future__ import annotations

import re
from typing import Iterable, NamedTuple

from .tokenizer import Token, standard_tokenize

__all__ = ["WordData", "MorfologikDictionary", "default_dictionary",
           "morfologik_filter", "morfologik_analyze", "get_tags"]


class WordData(NamedTuple):
    """One dictionary lemma: mirror of ``morfologik.stemming.WordData``
    as consumed by ``MorfologikFilter.popNextLemma`` (stem + raw
    concatenated tag, possibly ``None``)."""

    stem: str
    tag: str | None


# MorfologikFilter.java:89 ``lemmaSplitter = Pattern.compile("\\+|\\|")``
_LEMMA_SPLIT = re.compile(r"\+|\|")


def get_tags(word: WordData) -> list[str]:
    """MorphosyntacticTagsAttribute content for one lemma:
    ``MorfologikFilter.popNextLemma`` (:95-111) splits the concatenated
    tag on ``+`` or ``|``; a null tag yields the empty list."""
    if word.tag is None:
        return []
    return [t for t in _LEMMA_SPLIT.split(word.tag) if t]


class MorfologikDictionary:
    """surface form -> ordered lemma list.  Case-SENSITIVE keys — the
    polimorf dictionary distinguishes ``Poznania`` (proper noun ->
    ``Poznań``) from ``poznania`` (``poznanie``/``poznać``); the
    filter, not the dictionary, implements the lowercase fallback."""

    def __init__(self, entries: dict[str, list[WordData]]):
        self._entries = {k: list(v) for k, v in entries.items()}

    def lookup(self, surface: str) -> list[WordData]:
        """``IStemmer.lookup``: all lemmas for the surface form, in
        dictionary order; empty when unknown."""
        return self._entries.get(surface, [])

    def __len__(self) -> int:
        return len(self._entries)

    def __contains__(self, surface: str) -> bool:
        return surface in self._entries

    @classmethod
    def from_tsv(cls, text: str) -> "MorfologikDictionary":
        """Parse ``surface<TAB>stem[<TAB>tag]`` lines (blank lines and
        ``#`` comments skipped).  Repeated surface forms accumulate
        lemmas in file order."""
        entries: dict[str, list[WordData]] = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) < 2:
                raise ValueError(f"bad morfologik TSV line: {line!r}")
            surface, stem = parts[0], parts[1]
            tag = parts[2] if len(parts) > 2 and parts[2] else None
            entries.setdefault(surface, []).append(WordData(stem, tag))
        return cls(entries)

    @classmethod
    def from_tsv_path(cls, path: str) -> "MorfologikDictionary":
        with open(path, encoding="utf-8") as f:
            return cls.from_tsv(f.read())


# --------------------------------------------------------------------------
# Compact default dictionary.
#
# The first block is the TestMorfologikAnalyzer.java fixture vocabulary
# (lemma lists from testSingleTokens/testMultipleTokens/testCase; the
# ``liście`` tags are pinned by testPOSAttribute — other tags are not
# asserted by the fixtures and are left null).  The second block is a
# small sample of regular Polish paradigms so the default is useful on
# running text.
# --------------------------------------------------------------------------

_DEFAULT_TSV = """\
# -- TestMorfologikAnalyzer fixtures -------------------------------------
liście\tliście\tsubst:sg:acc:n2+subst:sg:nom:n2+subst:sg:voc:n2
liście\tliść\tsubst:pl:acc:m3+subst:pl:nom:m3+subst:pl:voc:m3
liście\tlist\tsubst:sg:loc:m3+subst:sg:voc:m3
liście\tlista\tsubst:sg:dat:f+subst:sg:loc:f
danych\tdany
danych\tdana
danych\tdane
danych\tdać
AGD\tAGD
AGD\tartykuły gospodarstwa domowego
agd\tartykuły gospodarstwa domowego
Poznania\tPoznań
poznania\tpoznanie
poznania\tpoznać
Aarona\tAaron
T\ttom
T\ttona
# -- common paradigm samples ---------------------------------------------
psa\tpies
psy\tpies
psów\tpies
domu\tdom
domy\tdom
domów\tdom
książki\tksiążka
książek\tksiążka
miasta\tmiasto
miast\tmiasto
studenta\tstudent
studenci\tstudent
studentów\tstudent
wody\twoda
wodzie\twoda
ludzi\tczłowiek
ludzie\tczłowiek
dzieci\tdziecko
roku\trok
lata\trok
lat\trok
"""

_DEFAULT: list = [None]


def default_dictionary() -> MorfologikDictionary:
    if _DEFAULT[0] is None:
        _DEFAULT[0] = MorfologikDictionary.from_tsv(_DEFAULT_TSV)
    return _DEFAULT[0]


# --------------------------------------------------------------------------
# Filter + analyzer
# --------------------------------------------------------------------------

def morfologik_lemmas(surface: str,
                      dictionary: MorfologikDictionary | None = None
                      ) -> list[WordData]:
    """``MorfologikFilter.incrementToken`` lookup order (:133-134):
    verbatim surface form first, then the lowercased form; empty when
    neither is in the dictionary."""
    d = dictionary if dictionary is not None else default_dictionary()
    return d.lookup(surface) or d.lookup(surface.lower())


def morfologik_filter(tokens: Iterable[Token],
                      dictionary: MorfologikDictionary | None = None,
                      keywords: frozenset[str] | set[str] = frozenset()
                      ) -> list[Token]:
    """Replace each non-keyword token whose surface form (or its
    lowercase) is in the dictionary with ALL its lemmas at the same
    position/offsets (first lemma keeps the token's increment, the rest
    are posInc-0 — ``MorfologikFilter.incrementToken:122-131``); tokens
    not found pass through unchanged (original case — the analyzer has
    no lowercase filter)."""
    out: list[Token] = []
    for tok in tokens:
        if tok.term in keywords:
            out.append(tok)
            continue
        lemmas = morfologik_lemmas(tok.term, dictionary)
        if lemmas:
            out.extend(Token(w.stem, tok.pos, tok.start, tok.end)
                       for w in lemmas)
        else:
            out.append(tok)
    return out


def morfologik_analyze(text: str,
                       dictionary: MorfologikDictionary | None = None,
                       keywords: frozenset[str] | set[str] = frozenset()
                       ) -> list[Token]:
    """``MorfologikAnalyzer.createComponents``: StandardTokenizer ->
    StandardFilter(no-op) -> MorfologikFilter.  No lowercasing, no stop
    words."""
    return morfologik_filter(standard_tokenize(text), dictionary,
                             keywords)


def make_morfologik_analyzer(dictionary: MorfologikDictionary | None = None,
                             keywords=frozenset()):
    """Analyzer-factory for a user-supplied (e.g. full polimorf TSV)
    dictionary, mirroring ``MorfologikFilterFactory``'s
    dictionary-resource knob."""

    def _chain(text: str) -> list[Token]:
        return morfologik_analyze(text, dictionary, keywords)
    return _chain


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("morfologik", morfologik_analyze)


_register()
