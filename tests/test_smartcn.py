"""SmartChineseAnalyzer goldens — ported from the reference's
``TestSmartChineseAnalyzer.java`` (terms, offsets, position
increments).  The test vocabulary is covered by the compact built-in
dictionary, so these expectations are the reference's own."""

from lucene_solr_old_spark.functions.smartcn import (SMARTCN_STOP_WORDS,
                                                     hhmm_segment,
                                                     make_smartcn_analyzer,
                                                     smart_chinese_analyze)
from lucene_solr_old_spark.functions.tokenizer import get_analyzer

S = "我购买了道具和服装"


def terms(text, **kw):
    return [t.term for t in smart_chinese_analyze(text, **kw)]


def test_default_stopwords():
    # testChineseStopWordsDefault
    assert terms(S + "。") == ["我", "购买", "了", "道具", "和", "服装"]


def test_two_phrases():
    assert terms(S + "。 " + S + "。") == \
        ["我", "购买", "了", "道具", "和", "服装"] * 2


def test_two_phrases_ideographic_space():
    assert terms(S + "　" + S + "。") == \
        ["我", "购买", "了", "道具", "和", "服装"] * 2


def test_stopwords_off_keeps_comma():
    # testChineseStopWordsOff: IDEOGRAPHIC FULL STOP -> ","
    assert terms(S + "。", stopwords=frozenset()) == \
        ["我", "购买", "了", "道具", "和", "服装", ","]


def test_position_holes():
    # testChineseStopWords2: "Title:San", ':' is a stopword
    ts = smart_chinese_analyze("Title:San")
    assert [(t.term, t.pos, t.start, t.end) for t in ts] == \
        [("titl", 0, 0, 5), ("san", 2, 6, 9)]


def test_mixed_latin_chinese():
    assert terms("我购买 Tests 了道具和服装") == \
        ["我", "购买", "test", "了", "道具", "和", "服装"]


def test_numerics():
    assert terms("我购买 Tests 了道具和服装1234") == \
        ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]


def test_full_width_folding():
    assert terms("我购买 Ｔｅｓｔｓ 了道具和服装１２３４") == \
        ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]


def test_presentation_delimiter_removed():
    assert terms("我购买︱ Tests 了道具和服装") == \
        ["我", "购买", "test", "了", "道具", "和", "服装"]


def test_non_chinese_chars_individually():
    assert terms("我购买 روبرتTests 了道具和服装") == \
        ["我", "购买", "ر", "و", "ب", "ر", "ت", "test",
         "了", "道具", "和", "服装"]


def test_oov_single_chars():
    # testOOV — out-of-vocabulary names split per character
    assert terms("优素福·拉扎·吉拉尼") == \
        ["优", "素", "福", "拉", "扎", "吉", "拉", "尼"]
    assert terms("优素福拉扎吉拉尼") == \
        ["优", "素", "福", "拉", "扎", "吉", "拉", "尼"]


def test_offsets():
    ts = smart_chinese_analyze(S)
    assert [t.start for t in ts] == [0, 1, 3, 4, 6, 7]
    assert [t.end for t in ts] == [1, 3, 4, 6, 7, 9]


def test_offsets_mixed():
    # testReusableTokenStream first assertion
    ts = smart_chinese_analyze("我购买 Tests 了道具和服装")
    assert [t.start for t in ts] == [0, 1, 4, 10, 11, 13, 14]
    assert [t.end for t in ts] == [1, 3, 9, 11, 13, 14, 16]


def test_large_document():
    # LUCENE-3026 analogue: 5000 sentences and one giant sentence both
    # complete (lattice is per-sentence; OOV fallback is linear)
    ts = smart_chinese_analyze(S + "。" * 1 + (S + "。") * 199)
    assert len(ts) == 6 * 200


def test_viterbi_prefers_dictionary_words():
    toks = hhmm_segment("数据处理系统")
    assert [t.text for t in toks] == ["数据", "处理", "系统"]


def test_custom_dictionary_chain():
    chain = make_smartcn_analyzer(word_freq={"拉扎": 1000})
    assert [t.term for t in chain("优素福拉扎")] == ["优", "素", "福", "拉扎"]


def test_bigram_breaks_tie():
    # with a bigram boost the path through the pair gets cheaper but the
    # segmentation (dictionary words) is unchanged
    a = hhmm_segment(S, bigram_freq={"购买@了": 5000})
    assert [t.text for t in a] == ["我", "购买", "了", "道具", "和", "服装"]


def test_registered_analyzer():
    assert [t.term for t in get_analyzer("smart_chinese")(S)] == \
        ["我", "购买", "了", "道具", "和", "服装"]


def test_stopset_matches_reference_file():
    assert len(SMARTCN_STOP_WORDS) == 53
