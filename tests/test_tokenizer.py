"""Analysis-chain golden fixtures (FIXTURES.md §4 token_fixtures).

Covers the StandardTokenizer token classes scoped in SURVEY.md §7
("hard parts" #2), possessive stripping, lowercase, stopword position
holes, max-token-length drop, and Porter integration.
"""

from lucene_solr_old_spark.functions.stopwords import ENGLISH_STOP_WORDS
from lucene_solr_old_spark.functions.tokenizer import (
    MAX_TOKEN_LENGTH,
    analyze,
    analyze_terms,
    standard_tokenize,
)


def terms(text):
    return [t.term for t in standard_tokenize(text)]


def test_basic_alphanum():
    assert terms("Hello world") == ["Hello", "world"]
    assert terms("foo  bar\tbaz\nquux") == ["foo", "bar", "baz", "quux"]


def test_mixed_alnum_stays_together():
    assert terms("mp3 x86 3dmax B2B") == ["mp3", "x86", "3dmax", "B2B"]


def test_midletter_apostrophe():
    assert terms("don't O'Neil it's") == ["don't", "O'Neil", "it's"]
    # apostrophe at a boundary breaks
    assert terms("'quoted' rock'") == ["quoted", "rock"]


def test_midnumlet_period():
    assert terms("example.com 3.14 u.s.a end.") == [
        "example.com", "3.14", "u.s.a", "end"]


def test_midnum_comma():
    assert terms("1,024 words, things") == ["1,024", "words", "things"]


def test_hyphen_and_punct_break():
    assert terms("state-of-the-art!") == ["state", "of", "the", "art"]
    assert terms("a+b=c; d/e (f)") == ["a", "b", "c", "d", "e", "f"]


def test_unicode_letters():
    assert terms("café naïve Zürich") == ["café", "naïve", "Zürich"]


def test_max_token_length_drop():
    long = "x" * (MAX_TOKEN_LENGTH + 1)
    ok = "y" * MAX_TOKEN_LENGTH
    assert terms(f"start {long} {ok} end") == ["start", ok, "end"]


def test_positions_consecutive_pre_stop():
    toks = list(standard_tokenize("one two three"))
    assert [t.pos for t in toks] == [0, 1, 2]
    assert [(t.start, t.end) for t in toks] == [(0, 3), (4, 7), (8, 13)]


def test_full_chain_possessive_lower_stop_stem():
    out = analyze("The Manager's meetings were RELATIONAL")
    # "The" (pos 0) and "were"? 'were' not in stop set -> kept
    assert [(t.term, t.pos) for t in out] == [
        ("manag", 1), ("meet", 2), ("were", 3), ("relat", 4)]


def test_stopword_position_holes():
    out = analyze("the cat and the hat")
    # stopwords at pos 0,2,3 removed; survivors keep original positions
    assert [(t.term, t.pos) for t in out] == [("cat", 1), ("hat", 4)]


def test_unicode_possessive():
    assert analyze_terms("Peter’s book") == ["peter", "book"]


def test_stop_set_is_the_33_word_set():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "were" not in ENGLISH_STOP_WORDS


def test_doclen_semantics():
    # norm field length = token count AFTER stopping (SURVEY.md §2.4)
    out = analyze("the cat and the hat")
    assert len(out) == 2


def test_overlong_token_leaves_position_hole():
    """StandardTokenizer counts skipped over-long tokens in
    skippedPositions (position hole), so following tokens shift by one."""
    from lucene_solr_old_spark.functions.tokenizer import standard_tokenize

    long_tok = "x" * 300
    toks = list(standard_tokenize(f"alpha {long_tok} beta"))
    assert [(t.term, t.pos) for t in toks] == [("alpha", 0), ("beta", 2)]
