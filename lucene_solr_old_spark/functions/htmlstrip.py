"""HTML -> text extraction matching HTMLStripCharFilter semantics.

Re-derivation of the reference charfilter's observable behavior
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/
HTMLStripCharFilter.jflex``, 917-line spec):

  * inline-element tags (the spec's ``InlineElment`` list: a b i q s u abbr
    acronym basefont bdo big cite code dfn em font img input kbd label samp
    select small span strike strong sub sup textarea tt var) are removed
    with NO replacement (jflex lines 114-140);
  * all other start/end tags are replaced by a single '\\n'
    (BLOCK_LEVEL_*_TAG_REPLACEMENT, jflex :148-151);
  * <br> in either form -> '\\n' (:150-151);
  * <script>...</script> and <style>...</style> including content -> one
    '\\n' (SCRIPT_REPLACEMENT/STYLE_REPLACEMENT, :152-153, :854-899);
  * comments ``<!-- ... -->`` and server-side includes ``<!--# ... -->``
    removed with no replacement (:797-812);
  * ``<![CDATA[ ... ]]>`` emits its content verbatim (:769-795);
  * ``<!DOCTYPE ...>`` and ``<? ... ?>`` processing instructions removed;
  * character entities (named + decimal/hex numeric) are decoded.

This is the normative extractor for the ``text`` column invariant
("byte-identical extracted text per url", BASELINE.json input_hint); the
synthetic pages corpus (sources/pages.py) is generated from templates whose
constructs are exactly the classes above, fixture-tested in
tests/test_htmlstrip.py.
"""

from __future__ import annotations

import html as _htmlmod
import re

__all__ = ["html_to_text", "INLINE_ELEMENTS"]

INLINE_ELEMENTS = frozenset(
    """a b i q s u abbr acronym basefont bdo big cite code dfn em font img
    input kbd label samp select small span strike strong sub sup textarea
    tt var""".split()
)

_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.I | re.S)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.I | re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)  # covers SSI <!--# ... -->
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_DOCTYPE_RE = re.compile(r"<!DOCTYPE[^>]*>", re.I | re.S)
_PI_RE = re.compile(r"<\?.*?\?>", re.S)
_BR_RE = re.compile(r"</?br\s*/?\s*>", re.I)
_TAG_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:_-]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*?)/?\s*>", re.S)


def _tag_sub(m: re.Match) -> str:
    name = m.group(1).lower()
    if name in INLINE_ELEMENTS:
        return ""
    return "\n"


def html_to_text(html: str | bytes) -> str:
    """Strip markup per the reference charfilter's replacement rules."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    s = html
    s = _SCRIPT_RE.sub("\n", s)
    s = _STYLE_RE.sub("\n", s)
    s = _COMMENT_RE.sub("", s)
    # CDATA content is emitted verbatim (no tag parsing, no entity decode)
    # — park it behind sentinels until all other passes are done.
    cdata: list[str] = []

    def _park(m: re.Match) -> str:
        cdata.append(m.group(1))
        return f"\x00{len(cdata) - 1}\x00"

    s = _CDATA_RE.sub(_park, s)
    s = _DOCTYPE_RE.sub("", s)
    s = _PI_RE.sub("", s)
    s = _BR_RE.sub("\n", s)
    s = _TAG_RE.sub(_tag_sub, s)
    # Entity decoding after tag removal, so decoded '<'/'>' can't be misread
    # as markup — same as the reference, which decodes in the scanner itself.
    s = _htmlmod.unescape(s)
    for i, content in enumerate(cdata):
        s = s.replace(f"\x00{i}\x00", content)
    return s
