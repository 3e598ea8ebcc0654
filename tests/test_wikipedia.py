"""WikipediaTokenizer — reference WikipediaTokenizerTest goldens
(terms, types, offsets, position increments, flags)."""

from lucene_solr_old_spark.functions.wikipedia import (BOTH,
                                                       TOKENS_ONLY,
                                                       UNTOKENIZED_ONLY,
                                                       UNTOKENIZED_TOKEN_FLAG,
                                                       wikipedia_tokenize)

LINK_PHRASES = ("click [[link here again]] click "
                "[http://lucene.apache.org here again] "
                "[[Category:a b c d]]")


def test_simple():
    text = "This is a [[Category:foo]]"
    ts = wikipedia_tokenize(text)
    assert [t.term for t in ts] == ["This", "is", "a", "foo"]
    assert [t.start for t in ts] == [0, 5, 8, 21]
    assert [t.end for t in ts] == [4, 7, 9, 24]
    assert [t.type for t in ts] == ["<ALPHANUM>"] * 3 + ["c"]
    assert [t.pos_inc for t in ts] == [1, 1, 1, 1]


def test_handwritten():
    test = ("[[link]] This is a [[Category:foo]] Category  This is a "
            "linked [[:Category:bar none withstanding]] "
            "Category This is (parens) This is a [[link]]  This is an "
            "external URL [http://lucene.apache.org] "
            "Here is ''italics'' and ''more italics'', '''bold''' and "
            "'''''five quotes''''' "
            " This is a [[link|display info]]  This is a period.  "
            "Here is $3.25 and here is 3.50.  Here's Johnny.  "
            "==heading== ===sub head=== followed by some text  "
            "[[Category:blah| ]] "
            "''[[Category:ital_cat]]''  here is some that is ''italics "
            "[[Category:foo]] but is never closed."
            "'''same [[Category:foo]] goes for this '''''and2 "
            "[[Category:foo]] and this"
            " [http://foo.boo.com/test/test/ Test Test] "
            "[http://foo.boo.com/test/test/test.html Test Test]"
            " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test]"
            " <ref>Citation</ref> <sup>martian</sup> "
            "<span class=\"glue\">code</span>")
    ts = wikipedia_tokenize(test)
    assert [t.term for t in ts] == [
        "link", "This", "is", "a", "foo", "Category", "This", "is", "a",
        "linked", "bar", "none", "withstanding", "Category", "This",
        "is", "parens", "This", "is", "a", "link", "This", "is", "an",
        "external", "URL", "http://lucene.apache.org", "Here", "is",
        "italics", "and", "more", "italics", "bold", "and", "five",
        "quotes", "This", "is", "a", "link", "display", "info", "This",
        "is", "a", "period", "Here", "is", "3.25", "and", "here", "is",
        "3.50", "Here's", "Johnny", "heading", "sub", "head",
        "followed", "by", "some", "text", "blah", "ital", "cat", "here",
        "is", "some", "that", "is", "italics", "foo", "but", "is",
        "never", "closed", "same", "foo", "goes", "for", "this", "and2",
        "foo", "and", "this", "http://foo.boo.com/test/test/", "Test",
        "Test", "http://foo.boo.com/test/test/test.html", "Test",
        "Test", "http://foo.boo.com/test/test/test.html?g=b&c=d",
        "Test", "Test", "Citation", "martian", "code"]
    A = "<ALPHANUM>"
    assert [t.type for t in ts] == [
        "il", A, A, A, "c", A, A, A, A, A, "c", "c", "c", A, A, A, A,
        A, A, A, "il", A, A, A, A, A, "elu", A, A, "i", A, "i", "i",
        "b", A, "bi", "bi", A, A, A, "il", "il", "il", A, A, A, A, A,
        A, "<NUM>", A, A, A, "<NUM>", "<APOSTROPHE>", A, "h", "sh",
        "sh", A, A, A, A, "c", "c", "c", A, A, A, A, A, "i", "c", A,
        A, A, A, "b", "c", A, A, A, "bi", "c", A, A, "elu", "el", "el",
        "elu", "el", "el", "elu", "el", "el", "ci", A, A]


def check_link_phrases(ts):
    assert [t.term for t in ts] == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c", "d"]
    assert [t.pos_inc for t in ts] == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_link_phrases():
    check_link_phrases(wikipedia_tokenize(LINK_PHRASES))


def test_links():
    test = ("[http://lucene.apache.org/java/docs/index.html#news here] "
            "[http://lucene.apache.org/java/docs/index.html?b=c here] "
            "[https://lucene.apache.org/java/docs/index.html?b=c here]")
    ts = wikipedia_tokenize(test)
    assert [t.term for t in ts][::2] == [
        "http://lucene.apache.org/java/docs/index.html#news",
        "http://lucene.apache.org/java/docs/index.html?b=c",
        "https://lucene.apache.org/java/docs/index.html?b=c"]
    assert [t.type for t in ts] == ["elu", "el"] * 3


def test_lucene1133_tokens_only_unaffected():
    # untokenized types don't change TOKENS_ONLY output
    ts = wikipedia_tokenize(LINK_PHRASES, TOKENS_ONLY,
                            frozenset(["c", "i"]))
    check_link_phrases(ts)


UNTOK_TEST = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
              "[[link there]] ''italics here'' something "
              "''more italics'' [[Category:h   i   j]]")


def test_lucene1133_untokenized_only():
    ts = wikipedia_tokenize(UNTOK_TEST, UNTOKENIZED_ONLY,
                            frozenset(["c", "i"]))
    assert [t.term for t in ts] == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j"]
    assert [t.start for t in ts] == [11, 32, 42, 47, 56, 61, 71, 86,
                                     98, 124]
    assert [t.end for t in ts] == [18, 37, 46, 51, 60, 66, 83, 95,
                                   110, 133]
    assert [t.pos_inc for t in ts] == [1] * 10


def test_both():
    ts = wikipedia_tokenize(UNTOK_TEST, BOTH, frozenset(["c", "i"]))
    assert [t.term for t in ts] == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g", "link",
        "here", "link", "there", "italics here", "italics", "here",
        "something", "more italics", "more", "italics", "h   i   j",
        "h", "i", "j"]
    assert [t.start for t in ts] == [
        11, 11, 13, 15, 17, 32, 32, 34, 36, 42, 47, 56, 61, 71, 71, 79,
        86, 98, 98, 103, 124, 124, 128, 132]
    assert [t.end for t in ts] == [
        18, 12, 14, 16, 18, 37, 33, 35, 37, 46, 51, 60, 66, 83, 78, 83,
        95, 110, 102, 110, 133, 125, 129, 133]
    assert [t.pos_inc for t in ts] == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1,
        0, 1, 1]
    U = UNTOKENIZED_TOKEN_FLAG
    assert [t.flags for t in ts] == [
        U, 0, 0, 0, 0, U, 0, 0, 0, 0, 0, 0, 0, U, 0, 0, 0, U, 0, 0, U,
        0, 0, 0]
