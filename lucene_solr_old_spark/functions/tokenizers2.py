"""Additional tokenizers from the reference's analysis module:

* :func:`keyword_tokenize` — ``core/KeywordTokenizer.java``: the whole
  input as one token.
* :func:`pattern_tokenize` — ``pattern/PatternTokenizer.java``: regex
  either SPLITS the input (group=-1, like ``String.split``) or EXTRACTS
  the matches of a capture group (group>=0).
* :func:`path_hierarchy_tokenize` — ``path/PathHierarchyTokenizer.java``:
  a path emits every ancestor prefix at the SAME position
  (``/a/b/c`` -> ``/a``, ``/a/b``, ``/a/b/c``) so a filter on any
  ancestor matches the document; ``skip`` drops leading components and
  ``reverse`` emits suffixes (``ReversePathHierarchyTokenizer``).
* :func:`uax_url_email_tokenize` — ``standard/UAX29URLEmailTokenizer``:
  like the standard tokenizer, but URLs and e-mail addresses survive as
  single tokens of type ``<URL>`` / ``<EMAIL>``.

All are plain ``text -> list[Token]`` functions, composable into
``register_analyzer`` chains and usable inside the Arrow-batched build.
"""

from __future__ import annotations

import re

from .tokenizer import Token, standard_tokenize

__all__ = ["keyword_tokenize", "pattern_tokenize",
           "path_hierarchy_tokenize", "uax_url_email_tokenize",
           "ngram_tokenize", "edge_ngram_tokenize",
           "URL_RE", "EMAIL_RE"]


def keyword_tokenize(text: str) -> list[Token]:
    if not text:
        return []
    return [Token(text, 0, 0, len(text))]


def pattern_tokenize(text: str, pattern: str,
                     group: int = -1) -> list[Token]:
    rx = re.compile(pattern)
    out: list[Token] = []
    pos = -1
    if group >= 0:
        for m in rx.finditer(text):
            term = m.group(group)
            if term:
                pos += 1
                out.append(Token(term, pos, m.start(group), m.end(group)))
        return out
    # split mode: the pattern is the delimiter
    last = 0
    for m in rx.finditer(text):
        if m.start() > last:
            pos += 1
            out.append(Token(text[last: m.start()], pos, last, m.start()))
        last = m.end()
    if last < len(text):
        pos += 1
        out.append(Token(text[last:], pos, last, len(text)))
    return out


def path_hierarchy_tokenize(text: str, delimiter: str = "/",
                            replacement: str | None = None,
                            skip: int = 0,
                            reverse: bool = False) -> list[Token]:
    rep = delimiter if replacement is None else replacement
    parts = text.split(delimiter)
    out: list[Token] = []
    if reverse:
        # ReversePathHierarchyTokenizer: suffixes; skip drops components
        # from the END
        usable = parts[: len(parts) - skip] if skip else parts
        for i in range(len(usable)):
            suffix = rep.join(usable[i:])
            if suffix:
                out.append(Token(suffix, 0, 0, len(text)))
        return out
    # skip drops leading components but keeps a leading delimiter
    # ('/usr/share/doc' skip=1 -> '/share', '/share/doc')
    if skip:
        if parts and parts[0] == "":
            parts = [""] + parts[1 + skip:]
        else:
            parts = parts[skip:]
    acc: list[str] = []
    for part in parts:
        acc.append(part)
        prefix = rep.join(acc)
        if prefix:
            out.append(Token(prefix, 0, 0, len(text)))
    return out


# RE2-safe patterns (also used by the PII scrubber family)
URL_RE = (r"(?:https?|ftp)://[^\s<>\"]+"
          r"|www\.[^\s<>\"]+")
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_URL_EMAIL_RX = re.compile(f"({EMAIL_RE})|({URL_RE})")


def uax_url_email_tokenize(text: str) -> list[Token]:
    """Standard tokenization with URLs/e-mails kept whole (a practical
    restatement of UAX29URLEmailTokenizer's extra grammar rules: the
    URL/e-mail spans are located first and protected; the remaining text
    goes through the standard tokenizer)."""
    out: list[Token] = []
    pos = -1
    last = 0

    def _standard(chunk: str, offset: int, pos: int) -> int:
        for term, _p, s, e in standard_tokenize(chunk):
            pos += 1
            out.append(Token(term, pos, offset + s, offset + e))
        return pos

    for m in _URL_EMAIL_RX.finditer(text):
        pos = _standard(text[last: m.start()], last, pos)
        pos += 1
        out.append(Token(m.group(0), pos, m.start(), m.end()))
        last = m.end()
    pos = _standard(text[last:], last, pos)
    return out


def ngram_tokenize(text: str, min_gram: int = 1,
                   max_gram: int = 2) -> list[Token]:
    """``ngram/NGramTokenizer.java`` (4.4+ semantics): every character
    n-gram for n in [min_gram, max_gram], ordered by start offset then
    gram length, one position each."""
    out: list[Token] = []
    pos = -1
    n = len(text)
    for i in range(n):
        for g in range(min_gram, max_gram + 1):
            if i + g > n:
                break
            pos += 1
            out.append(Token(text[i: i + g], pos, i, i + g))
    return out


def edge_ngram_tokenize(text: str, min_gram: int = 1,
                        max_gram: int = 1,
                        back: bool = False) -> list[Token]:
    """``ngram/EdgeNGramTokenizer.java``: front (or back, the deprecated
    ``side=back``) edge grams of the WHOLE input, one position each."""
    out: list[Token] = []
    n = len(text)
    pos = -1
    for g in range(min_gram, min(max_gram, n) + 1):
        pos += 1
        if back:
            out.append(Token(text[n - g:], pos, n - g, n))
        else:
            out.append(Token(text[:g], pos, 0, g))
    return out
