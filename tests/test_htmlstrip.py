"""HTML-strip golden fixtures (FIXTURES.md §5 htmlstrip_fixtures).

One construct per case, mirroring the replacement rules of the reference
``HTMLStripCharFilter.jflex`` (see functions/htmlstrip.py docstring).
"""

from lucene_solr_old_spark.functions.htmlstrip import html_to_text


CASES = {
    "plain": ("no markup at all", "no markup at all"),
    "block_tags": ("<p>Hello</p><div>World</div>", "\nHello\n\nWorld\n"),
    "inline_tags": ("a <b>bold</b> and <em>emphatic</em> word",
                    "a bold and emphatic word"),
    "anchor": ('<a href="http://x.com">link</a> text', "link text"),
    "br": ("line1<br>line2<br/>line3", "line1\nline2\nline3"),
    "script": ("before<script>var x = '<p>';</script>after", "before\nafter"),
    "script_attrs": ('x<script type="text/javascript">f()</script>y', "x\ny"),
    "style": ("a<style>p { color: red }</style>b", "a\nb"),
    "comment": ("one<!-- hidden <b>bold</b> -->two", "onetwo"),
    "ssi": ('pre<!--#include virtual="x.html" -->post', "prepost"),
    "cdata": ("a<![CDATA[literal <text> here]]>b", "aliteral <text> hereb"),
    "doctype": ("<!DOCTYPE html><p>x</p>", "\nx\n"),
    "pi": ('<?xml version="1.0"?>data', "data"),
    "named_entities": ("fish &amp; chips &lt;now&gt;", "fish & chips <now>"),
    "numeric_entities": ("A is &#65; and &#x41;", "A is A and A"),
    "accented_entity": ("caf&eacute;", "café"),
    "img_inline": ('see <img src="x.png" alt="pic"> here', "see  here"),
    "event_attr": ('<div onclick="alert(\'<hi>\')">x</div>', "\nx\n"),
    "unclosed": ("<p>open paragraph", "\nopen paragraph"),
    "nested": ("<div><p><b>deep</b></p></div>", "\n\ndeep\n\n"),
    "attrs_with_gt": ('<div title="a > b">x</div>', "\nx\n"),
    "empty": ("", ""),
    "whitespace_kept": ("<p>  spaced  </p>", "\n  spaced  \n"),
}


def test_htmlstrip_golden():
    for name, (html, expected) in CASES.items():
        got = html_to_text(html)
        assert got == expected, (name, got, expected)


def test_bytes_input_utf8():
    assert html_to_text("<p>héllo</p>".encode()) == "\nhéllo\n"


def test_byte_identity_is_stable():
    # determinism: repeated extraction is byte-identical (the invariant the
    # pages-table golden `text` column is generated under)
    html = "<html><body><p>a &amp; b</p><script>x</script></body></html>"
    assert html_to_text(html) == html_to_text(html)
