"""Hunspell dictionary stemmer — the reference's
``analysis/hunspell/Hunspell{Dictionary,Stemmer,Affix}.java`` (the 4.x
engine: PFX/SFX tables with strip/append/condition, continuation flags
on the append (``d/C``) driving cross-product recursion up to depth 2,
and last-entry-wins flag override under ``ignore_case``).

Validated against the reference's own test dictionaries and the
compiled reference stemmer's outputs (tests/test_hunspell.py — both the
ignore-case and case-sensitive expectations of HunspellStemmerTest).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["HunspellDictionary", "hunspell_stem",
           "make_hunspell_analyzer"]

_RECURSION_CAP = 2


@dataclass
class _Affix:
    flag: str
    strip: str
    append: str
    cond: re.Pattern
    cross: bool
    append_flags: str | None


class HunspellDictionary:
    """Parse ``.aff`` + ``.dic`` text (the subset the reference's 4.x
    parser reads: SFX/PFX tables, ``/`` continuation flags, a leading
    entry-count line in the dic)."""

    def __init__(self, aff_text: str, dic_text: str,
                 ignore_case: bool = False):
        self.ignore_case = ignore_case
        self.prefixes: list[_Affix] = []
        self.suffixes: list[_Affix] = []
        self.words: dict[str, str] = {}
        self._parse_aff(aff_text)
        self._parse_dic(dic_text)

    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            if parts and parts[0] in ("SFX", "PFX") and len(parts) >= 4:
                kind, flag, cross, count = parts[0], parts[1], \
                    parts[2] == "Y", int(parts[3])
                for j in range(1, count + 1):
                    rule = lines[i + j].split()
                    if len(rule) < 5:
                        continue
                    strip = "" if rule[2] == "0" else rule[2]
                    append = rule[3]
                    append_flags = None
                    if "/" in append:
                        append, append_flags = append.rsplit("/", 1)
                    cond = rule[4]
                    pattern = (f"{cond}.*" if kind == "PFX"
                               else f".*{cond}")
                    afx = _Affix(flag, strip, append,
                                 re.compile(pattern), cross,
                                 append_flags)
                    (self.prefixes if kind == "PFX"
                     else self.suffixes).append(afx)
                i += count
            i += 1

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for line in lines[start:]:
            line = line.strip()
            if not line:
                continue
            word, _, flags = line.partition("/")
            if self.ignore_case:
                word = word.lower()
            # duplicate entries OVERRIDE (the reference's CharArrayMap
            # put: "the Foo rule gets overridden by the foo rule")
            self.words[word] = flags


def _stem_level(d: HunspellDictionary, word: str,
                flags: str | None, depth: int) -> list[str]:
    out: list[str] = []
    for sfx in d.suffixes:
        if flags is not None and sfx.flag not in flags:
            continue
        if not word.endswith(sfx.append) or not sfx.append:
            continue
        stripped = word[: len(word) - len(sfx.append)] + sfx.strip
        out.extend(_apply(d, stripped, sfx, depth))
    for pfx in d.prefixes:
        if flags is not None and pfx.flag not in flags:
            continue
        if not word.startswith(pfx.append) or not pfx.append:
            continue
        stripped = pfx.strip + word[len(pfx.append):]
        out.extend(_apply(d, stripped, pfx, depth))
    return out


def _apply(d: HunspellDictionary, stripped: str, afx: _Affix,
           depth: int) -> list[str]:
    if d.ignore_case:
        stripped = stripped.lower()
    if not afx.cond.fullmatch(stripped):
        return []
    out: list[str] = []
    entry = d.words.get(stripped)
    if entry is not None and afx.flag in entry:
        out.append(stripped)
    if afx.cross and afx.append_flags is not None \
            and depth < _RECURSION_CAP:
        out.extend(_stem_level(d, stripped, afx.append_flags, depth + 1))
    return out


def hunspell_stem(d: HunspellDictionary, word: str) -> list[str]:
    """All stems for ``word`` (dictionary surface first, then affix
    derivations) — HunspellStemmer.stem ordering."""
    w = word.lower() if d.ignore_case else word
    out: list[str] = []
    if w in d.words:
        out.append(w)
    out.extend(_stem_level(d, w, None, 0))
    return out


def make_hunspell_analyzer(dictionary: HunspellDictionary,
                           dedup: bool = True, longest_only: bool = False):
    """Build an analyzer chain callable (``text -> list[Token]``) around
    a Hunspell dictionary — the ``HunspellStemFilter`` shape: every stem
    of a token is emitted STACKED at the token's position (posInc 0 for
    the extras), unknown words pass through unchanged; ``longest_only``
    keeps only the longest stem (the filter's ``longestOnly`` flag).
    Register with ``register_analyzer`` — the closure (dictionary
    included) is cloudpickled to executors."""
    from .tokenizer import Token, standard_tokenize

    def analyze(text: str) -> list[Token]:
        out: list[Token] = []
        for t in standard_tokenize(text):
            term = t.term.lower() if dictionary.ignore_case else t.term
            stems = hunspell_stem(dictionary, term)
            if not stems:
                out.append(Token(term, t.pos, t.start, t.end))
                continue
            if longest_only:
                stems = [max(stems, key=len)]
            elif dedup:
                seen: set[str] = set()
                stems = [s for s in stems
                         if not (s in seen or seen.add(s))]
            for s in stems:
                out.append(Token(s, t.pos, t.start, t.end))
        return out

    return analyze
