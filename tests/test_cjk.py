"""CJK analysis chain (functions/cjk.py): width folding, bigram
emission, the cjk stop set."""

from __future__ import annotations

import lucene_solr_old_spark.functions.cjk  # noqa: F401  (registers)
from lucene_solr_old_spark.functions.cjk import (
    cjk_analyze, cjk_bigrams, cjk_width_fold)
from lucene_solr_old_spark.functions.tokenizer import get_analyzer


def test_bigrams_of_han_run():
    assert cjk_bigrams("数据处理系统") == ["数据", "据处", "处理", "理系",
                                           "系统"]


def test_lone_cjk_char_is_unigram():
    assert cjk_bigrams("中") == ["中"]


def test_mixed_script_token():
    assert cjk_bigrams("abc中文def") == ["abc", "中文", "def"]


def test_width_folding():
    assert cjk_width_fold("ＡＢＣ１２３") == "ABC123"
    assert cjk_width_fold("ｱｲｳ") == "アイウ"
    assert cjk_width_fold("　") == " "


def test_full_chain_terms_and_stops():
    terms = [t.term for t in
             cjk_analyze("big 数据处理系统 the data 中 ｱｲウ ＡＢＣ")]
    assert terms == ["big", "数据", "据处", "处理", "理系", "系统",
                     "data", "中", "アイ", "イウ", "abc"]


def test_stop_holes_preserved():
    toks = cjk_analyze("the 数据")
    # 'the' consumed position 0; the bigram sits at position 1
    assert [(t.term, t.pos) for t in toks] == [("数据", 1)]


def test_registered_analyzer():
    assert get_analyzer("cjk") is cjk_analyze


def test_hangul_and_katakana_bigrams():
    assert cjk_bigrams("한국어") == ["한국", "국어"]
    assert cjk_bigrams("カタカナ") == ["カタ", "タカ", "カナ"]
