"""Additional tokenizers (functions/tokenizers2.py): keyword, pattern,
path hierarchy, UAX29 URL/e-mail."""

from __future__ import annotations

from lucene_solr_old_spark.functions.tokenizers2 import (
    keyword_tokenize, path_hierarchy_tokenize, pattern_tokenize,
    uax_url_email_tokenize)


def test_keyword_whole_input():
    toks = keyword_tokenize("Hello World")
    assert [(t.term, t.start, t.end) for t in toks] == [("Hello World",
                                                         0, 11)]
    assert keyword_tokenize("") == []


def test_pattern_split_mode():
    assert [t.term for t in pattern_tokenize("a-b--c", r"-+")] \
        == ["a", "b", "c"]
    assert [t.term for t in pattern_tokenize("--x--", r"-+")] == ["x"]


def test_pattern_group_mode():
    toks = pattern_tokenize("'quick' and 'brown'", r"'([^']+)'", group=1)
    assert [t.term for t in toks] == ["quick", "brown"]
    assert toks[0].start == 1 and toks[0].end == 6


def test_path_hierarchy_prefixes():
    assert [t.term for t in path_hierarchy_tokenize("/usr/share/doc")] \
        == ["/usr", "/usr/share", "/usr/share/doc"]
    assert [t.term for t in path_hierarchy_tokenize("a/b/c")] \
        == ["a", "a/b", "a/b/c"]


def test_path_hierarchy_skip_and_replacement():
    assert [t.term for t in
            path_hierarchy_tokenize("/usr/share/doc", skip=1)] \
        == ["/share", "/share/doc"]
    assert [t.term for t in
            path_hierarchy_tokenize("a/b/c", replacement="|")] \
        == ["a", "a|b", "a|b|c"]


def test_path_hierarchy_reverse():
    assert [t.term for t in
            path_hierarchy_tokenize("a/b/c", reverse=True)] \
        == ["a/b/c", "b/c", "c"]
    assert [t.term for t in
            path_hierarchy_tokenize("a/b/c", reverse=True, skip=1)] \
        == ["a/b", "b"]


def test_uax_url_email_spans_survive():
    toks = uax_url_email_tokenize(
        "See https://example.com/x?y=1 or mail bob@test.org today")
    assert [t.term for t in toks] == [
        "See", "https://example.com/x?y=1", "or", "mail",
        "bob@test.org", "today"]
    # positions are sequential and offsets point at the original spans
    url = toks[1]
    assert url.pos == 1 and url.start == 4 and url.end == 29


def test_uax_plain_text_matches_standard():
    toks = uax_url_email_tokenize("just plain words here")
    assert [t.term for t in toks] == ["just", "plain", "words", "here"]
