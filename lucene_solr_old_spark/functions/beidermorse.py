"""Beider-Morse Phonetic Matching (BMPM) — the genealogical phonetic
encoder behind Lucene's ``BeiderMorseFilter``.

Reference surface:
  ``lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
  BeiderMorseFilter.java`` (token expansion: the engine's ``ab|ac-ad...``
  string is split on ``[^()|-]+`` into same-position tokens), which wraps
  commons-codec ``org.apache.commons.codec.language.bm.PhoneticEngine``
  (+ ``Rule``, ``Lang``, ``Languages``).

This is a from-scratch Python port of the ENGINE; the RULES DATA —
127 rule files (language-detection patterns, per-language
transliterations, exact/approx final rules for the gen/ash/sep name
types) — is loaded at runtime from the commons-codec jar that every
Apache Spark distribution ships (``pyspark/jars/commons-codec-*.jar``),
the same public Apache-licensed resources the reference reads from its
classpath.  No rules are copied into this repo; an engine built where
Spark is installed sees byte-identical data to the Java one, which is
what makes the bit-exact oracle in ``tests/test_beidermorse.py``
possible (it diffs this port against the real JVM ``PhoneticEngine``
through the running SparkSession's gateway).

Deliberate ports of commons-codec quirks (kept for bit-exactness):
  * the unmatched-rule cursor still advances by 1 after scanning the
    rule list (``RulesApplication.invoke``);
  * in non-concat single-word mode the ORIGINAL word list is consulted,
    not the prefix-stripped one (``PhoneticEngine.encode``);
  * name-prefix detection iterates in Java ``HashSet<String>`` order
    (frozen below as ``_GENERIC_PREFIX_ORDER`` from an observed JVM so
    e.g. "de la costa" strips the same prefix both sides).
"""

from __future__ import annotations

import glob
import os
import re
import zipfile
from functools import lru_cache

ANY = None          # Languages.ANY_LANGUAGE
NO_LANGUAGES: frozenset = frozenset()

NAME_TYPES = ("gen", "ash", "sep")
RULE_TYPES = ("approx", "exact")

# NAME_PREFIXES, in the iteration order of Java's HashSet<String>
# (String.hashCode is spec-fixed and the default capacity is constant,
# so this order is stable across JVMs; verified against the running JVM
# in tests).  Order matters: the first prefix that matches wins.
_GENERIC_PREFIX_ORDER = (
    "della", "dalla", "dos", "du", "van", "von", "dal", "da", "de",
    "de la", "del", "dela", "des", "di", "do",
)
_ASH_PREFIX_ORDER = ("bar", "van", "von", "da", "ben", "de")
_SEP_PREFIX_ORDER = (
    "el", "della", "dos", "du", "van", "von", "dal", "al", "da",
    "de la", "de", "del", "dela", "des", "di", "do",
)
NAME_PREFIXES = {"gen": _GENERIC_PREFIX_ORDER,
                 "ash": _ASH_PREFIX_ORDER,
                 "sep": _SEP_PREFIX_ORDER}

DEFAULT_MAX_PHONEMES = 20

_BM_DIR = "org/apache/commons/codec/language/bm/"


# ---------------------------------------------------------------------------
# rules data access (the commons-codec jar on the Spark classpath)

@lru_cache(maxsize=1)
def _rules_jar() -> str:
    """Locate commons-codec on the local Spark installation.

    Override with $SPARK_GRAFT_COMMONS_CODEC (a path to the jar or to a
    directory containing the extracted ``org/apache/commons/codec/...``
    tree) for non-pyspark layouts."""
    env = os.environ.get("SPARK_GRAFT_COMMONS_CODEC")
    if env:
        return env
    candidates = []
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:  # executor workers: pyspark.__file__ sits inside
        candidates.append(os.path.join(spark_home, "jars"))  # pyspark.zip
    try:
        import pyspark

        pyspark_dir = os.path.dirname(pyspark.__file__)
        candidates.append(os.path.join(pyspark_dir, "jars"))
        if ".zip" in pyspark_dir:  # /opt/spark/python/lib/pyspark.zip/...
            candidates.append(os.path.join(
                pyspark_dir.split("/python/lib/")[0], "jars"))
    except ImportError:
        pass
    for jars in candidates:
        hits = sorted(glob.glob(os.path.join(jars, "commons-codec-*.jar")))
        if hits:
            return hits[-1]
    raise FileNotFoundError(
        "commons-codec jar not found under any of %s; set "
        "SPARK_GRAFT_COMMONS_CODEC" % candidates)


@lru_cache(maxsize=None)
def _resource_lines(name: str) -> tuple[str, ...]:
    src = _rules_jar()
    if os.path.isdir(src):
        with open(os.path.join(src, _BM_DIR, name), encoding="utf-8") as f:
            return tuple(f.read().splitlines())
    with zipfile.ZipFile(src) as zf:
        data = zf.read(_BM_DIR + name).decode("utf-8")
    return tuple(data.splitlines())


def _strip_comments(lines):
    """commons-codec resource comment grammar: ``/*`` at line START
    opens a block closed by a line ENDING ``*/``; ``//`` starts a line
    comment (Rule.parseRules / Lang.loadFromResource)."""
    in_block = False
    for raw in lines:
        if in_block:
            if raw.endswith("*/"):
                in_block = False
            continue
        if raw.startswith("/*"):
            in_block = True
            continue
        cmt = raw.find("//")
        line = raw[:cmt] if cmt >= 0 else raw
        line = line.strip()
        if line:
            yield line


# ---------------------------------------------------------------------------
# language sets  (ANY = None, some = frozenset, empty frozenset = none)

def _restrict(a, b):
    if a is ANY:
        return b
    if b is ANY:
        return a
    return a & b


def _merge(a, b):
    """``a.merge(b)`` with commons-codec's ASYMMETRY kept bit-exact:
    ``ANY_LANGUAGE.merge(other)`` returns OTHER (ANY delegates), while
    ``SomeLanguages.merge(ANY)`` returns ANY — verified against the JVM
    (tests/test_beidermorse.py); the direction matters because final-
    rules dedup merges existing.merge(incoming)."""
    if a is ANY:
        return b
    if b is ANY:
        return ANY
    if not a:
        return b
    if not b:
        return a
    return a | b


def _lang_key(langs) -> str:
    """Singleton set -> its language's rule file; anything else -> any."""
    if langs is not ANY and len(langs) == 1:
        return next(iter(langs))
    return "any"


# ---------------------------------------------------------------------------
# context matchers (Rule.pattern): special-cased exact/prefix/suffix/
# one-char-class forms, java.util.regex find() fallback

def _contains(chars: str, ch: str) -> bool:
    return ch in chars


def _compile_context(regex: str):
    starts = regex.startswith("^")
    ends = regex.endswith("$")
    content = regex[1 if starts else 0: len(regex) - 1 if ends else len(regex)]
    if "[" not in content:
        if starts and ends:
            if not content:
                return lambda s: not s
            return lambda s, c=content: s == c
        if (starts or ends) and not content:
            return lambda s: True
        if starts:
            return lambda s, c=content: s.startswith(c)
        if ends:
            return lambda s, c=content: s.endswith(c)
    elif content.startswith("[") and content.endswith("]"):
        box = content[1:-1]
        if "[" not in box:
            should = not box.startswith("^")
            if not should:
                box = box[1:]
            if starts and ends:
                return (lambda s, b=box, m=should:
                        len(s) == 1 and (s[0] in b) == m)
            if starts:
                return (lambda s, b=box, m=should:
                        len(s) > 0 and (s[0] in b) == m)
            if ends:
                return (lambda s, b=box, m=should:
                        len(s) > 0 and (s[-1] in b) == m)
    pat = re.compile(regex)
    return lambda s, p=pat: p.search(s) is not None


# ---------------------------------------------------------------------------
# phoneme expressions

def _parse_phoneme(ph: str):
    """-> (text, langs) — ``lo[czech+slovak]`` style annotations."""
    op = ph.find("[")
    if op >= 0:
        if not ph.endswith("]"):
            raise ValueError(f"phoneme {ph!r}: [ without trailing ]")
        return (ph[:op], frozenset(ph[op + 1:-1].split("+")))
    return (ph, ANY)


def _parse_phoneme_expr(ph: str):
    """-> list of (text, langs) alternates (Rule.parsePhonemeExpr)."""
    if ph.startswith("("):
        if not ph.endswith(")"):
            raise ValueError(f"phoneme {ph!r}: ( without trailing )")
        body = ph[1:-1]
        out = [_parse_phoneme(part) for part in body.split("|") if part]
        if body.startswith("|") or body.endswith("|"):
            out.append(("", ANY))
        return out
    return [_parse_phoneme(ph)]


class _Rule:
    __slots__ = ("pattern", "lmatch", "rmatch", "phonemes")

    def __init__(self, pattern, lcontext, rcontext, phoneme):
        self.pattern = pattern
        self.lmatch = _compile_context(lcontext + "$")
        self.rmatch = _compile_context("^" + rcontext)
        self.phonemes = _parse_phoneme_expr(phoneme)

    def matches(self, inp: str, i: int) -> bool:
        j = i + len(self.pattern)
        if j > len(inp) or inp[i:j] != self.pattern:
            return False
        return self.rmatch(inp[j:]) and self.lmatch(inp[:i])


_QUOTED = re.compile(r'"([^"]*)"')


@lru_cache(maxsize=None)
def _rule_map(name_type: str, rule_type: str, lang_key: str):
    """{first pattern char: [rules in file order]} (Rule.getInstanceMap).
    rule_type: 'rules' | 'approx' | 'exact'; lang_key: language name,
    'any' or 'common'."""
    out: dict[str, list[_Rule]] = {}
    _load_rules_into(f"{name_type}_{rule_type}_{lang_key}.txt", out)
    return out


def _load_rules_into(resource: str, out: dict) -> None:
    for line in _strip_comments(_resource_lines(resource)):
        if line.startswith("#include"):
            _load_rules_into(line[len("#include"):].strip() + ".txt", out)
            continue
        parts = _QUOTED.findall(line)
        if len(parts) != 4:
            raise ValueError(f"{resource}: malformed rule line {line!r}")
        rule = _Rule(*parts)
        out.setdefault(rule.pattern[:1], []).append(rule)


@lru_cache(maxsize=None)
def _languages(name_type: str) -> frozenset:
    return frozenset(_strip_comments(
        _resource_lines(f"{name_type}_languages.txt")))


@lru_cache(maxsize=None)
def _lang_rules(name_type: str):
    """[(search predicate, langs, accept)] from <nt>_lang.txt."""
    out = []
    for line in _strip_comments(_resource_lines(f"{name_type}_lang.txt")):
        pattern, langs, accept = line.split()
        out.append((re.compile(pattern).search,
                    frozenset(langs.split("+")), accept == "true"))
    return out


def guess_languages(name_type: str, word: str):
    """Lang.guessLanguages: start from all languages, intersect on each
    matching accept-rule, subtract on each matching reject-rule; empty
    result degrades to ANY."""
    text = word.lower()
    langs = set(_languages(name_type))
    for search, rule_langs, accept in _lang_rules(name_type):
        if search(text):
            if accept:
                langs &= rule_langs
            else:
                langs -= rule_langs
    return frozenset(langs) if langs else ANY


# ---------------------------------------------------------------------------
# the engine

def _apply_expr(phonemes, expr, max_phonemes):
    """PhonemeBuilder.apply: cross product capped at max_phonemes; an
    alternate whose languages are disjoint with the accumulated
    phoneme's is dropped."""
    out = []
    for text, langs in phonemes:
        for rtext, rlangs in expr:
            merged = _restrict(langs, rlangs)
            if merged is ANY or merged:
                out.append((text + rtext, merged))
                if len(out) >= max_phonemes:
                    return out
    return out


def _rules_application(rules, inp, phonemes, i, max_phonemes):
    """RulesApplication.invoke -> (phonemes, next_i, found)."""
    candidates = rules.get(inp[i: i + 1])
    pattern_length = 1
    if candidates:
        for rule in candidates:
            pattern_length = len(rule.pattern)
            if rule.matches(inp, i):
                return (_apply_expr(phonemes, rule.phonemes, max_phonemes),
                        i + pattern_length, True)
        pattern_length = 1
    return phonemes, i + pattern_length, False


class BeiderMorseEngine:
    """PhoneticEngine port.  name_type in {gen, ash, sep}; rule_type in
    {approx, exact}; concat mirrors the Java flag (True in the Lucene
    filter)."""

    def __init__(self, name_type: str = "gen", rule_type: str = "approx",
                 concat: bool = True,
                 max_phonemes: int = DEFAULT_MAX_PHONEMES):
        if name_type not in NAME_TYPES:
            raise ValueError(f"name_type must be one of {NAME_TYPES}")
        if rule_type not in RULE_TYPES:
            raise ValueError(f"rule_type must be one of {RULE_TYPES}")
        self.name_type = name_type
        self.rule_type = rule_type
        self.concat = concat
        self.max_phonemes = max_phonemes

    def encode(self, inp: str, languages=None) -> str:
        """languages: None -> guess (Lang rules); else an iterable of
        language names restricting the phoneme alternates."""
        if languages is None:
            lang_set = guess_languages(self.name_type, inp)
        elif languages is ANY:
            lang_set = ANY
        else:
            lang_set = frozenset(languages) or ANY
        return self._encode(inp, lang_set)

    def _encode(self, inp: str, lang_set) -> str:
        nt = self.name_type
        rules = _rule_map(nt, "rules", _lang_key(lang_set))
        final1 = _rule_map(nt, self.rule_type, "common")
        final2 = _rule_map(nt, self.rule_type, _lang_key(lang_set))

        inp = inp.lower().replace("-", " ").strip()

        if nt == "gen":
            if inp.startswith("d'"):  # d'angelo -> (angelo)-(dangelo)
                rem = inp[2:]
                return (f"({self.encode(rem)})-({self.encode('d' + rem)})")
            for pfx in NAME_PREFIXES[nt]:
                if inp.startswith(pfx + " "):
                    rem = inp[len(pfx) + 1:]
                    return (f"({self.encode(rem)})"
                            f"-({self.encode(pfx + rem)})")

        words = inp.split()
        if nt == "sep":
            # only the part after the last apostrophe, minus prefixes
            words2 = [w.split("'")[-1] for w in words]
            words2 = [w for w in words2 if w not in set(NAME_PREFIXES[nt])]
        elif nt == "ash":
            words2 = [w for w in words if w not in set(NAME_PREFIXES[nt])]
        else:
            words2 = list(words)

        if self.concat:
            inp = " ".join(words2)
        elif len(words2) == 1:
            # commons-codec consults the ORIGINAL list here (quirk)
            inp = words[0]
        else:
            return "-".join(self.encode(w) for w in words2)

        phonemes = [("", lang_set)]
        i = 0
        while i < len(inp):
            phonemes, i, _found = _rules_application(
                rules, inp, phonemes, i, self.max_phonemes)
        phonemes = self._apply_final_rules(phonemes, final1)
        phonemes = self._apply_final_rules(phonemes, final2)
        return "|".join(text for text, _ in phonemes)

    def _apply_final_rules(self, phonemes, final_rules):
        """PhoneticEngine.applyFinalRules: re-transliterate each phoneme,
        then sort + dedupe by text (TreeMap w/ the char comparator),
        merging language sets of textual duplicates."""
        if not final_rules:
            return phonemes
        dedup: dict[str, object] = {}
        order: list[str] = []
        for text, langs in phonemes:
            sub = [("", langs)]
            i = 0
            while i < len(text):
                sub, j, found = _rules_application(
                    final_rules, text, sub, i, self.max_phonemes)
                if not found:  # pass the char through unchanged
                    sub = [(t + text[i: i + 1], lg) for t, lg in sub]
                i = j
            for t, lg in sub:
                if t in dedup:
                    dedup[t] = _merge(dedup[t], lg)
                else:
                    dedup[t] = lg
                    order.append(t)
        return [(t, dedup[t]) for t in sorted(dedup)]


# ---------------------------------------------------------------------------
# Lucene-filter surface

_TOKEN_SPLIT = re.compile(r"[^()|-]+")


def bm_expand(term: str, engine: BeiderMorseEngine,
              languages=None) -> list[str]:
    """BeiderMorseFilter token expansion: the encoded string is split on
    ``[^()|-]+``; no matches (e.g. pure digits encode to '') passes the
    original term through unchanged (BeiderMorseFilter.java:81-93).
    First token keeps the original position; the rest stack at
    posInc=0 — positionally they are all the same token, which is how
    downstream phrase logic should treat them."""
    encoded = engine.encode(term, languages)
    toks = _TOKEN_SPLIT.findall(encoded)
    return toks if toks else [term]


def beider_morse_filter(tokens, engine: BeiderMorseEngine | None = None,
                        languages=None):
    """Token-level BeiderMorseFilter: each input token is REPLACED by
    its phonetic expansions, all at the input token's position (the
    Java filter emits the first at the original posInc and the rest at
    posInc=0)."""
    from .tokenizer import Token

    engine = engine or _default_engine()
    out = []
    for t in tokens:
        for enc in bm_expand(t.term, engine, languages):
            out.append(Token(enc, t.pos, t.start, t.end))
    return out


@lru_cache(maxsize=1)
def _default_engine() -> BeiderMorseEngine:
    """Solr ``BeiderMorseFilterFactory`` defaults: GENERIC / APPROX /
    concat=true."""
    return BeiderMorseEngine("gen", "approx", True)


def ws_bm_analyze(text: str):
    """whitespace → lowercase → BeiderMorseFilter(gen, approx, concat):
    genealogical spelling variants conflate through shared codes
    ("moskowitz"/"moskovitz" meet at moskovits et al.).  Registered as
    analyzer ``"ws_bm"``."""
    from .tokenizer import _WS_RE, Token

    toks = []
    pos = -1
    for m in _WS_RE.finditer(text):
        pos += 1
        toks.append(Token(m.group(0).lower(), pos, m.start(), m.end()))
    return beider_morse_filter(toks)


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("ws_bm", ws_bm_analyze)


_register()
