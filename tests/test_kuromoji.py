"""Japanese analyzer goldens — ported from the reference's
TestJapaneseAnalyzer (terms, offsets, position increments)."""

from lucene_solr_old_spark.functions.kuromoji import (japanese_analyze,
                                                      japanese_tokenize,
                                                      katakana_stem,
                                                      make_japanese_analyzer)
from lucene_solr_old_spark.functions.tokenizer import get_analyzer


def terms_incs(text):
    ts = japanese_analyze(text)
    incs, prev = [], -1
    for t in ts:
        incs.append(t.pos - prev)
        prev = t.pos
    return [t.term for t in ts], incs


def test_basics():
    # testBasics: particle removal by POS, base-form lemmatization,
    # positions and offsets
    ts = japanese_analyze("多くの学生が試験に落ちた。")
    assert [t.term for t in ts] == ["多く", "学生", "試験", "落ちる"]
    assert [t.start for t in ts] == [0, 3, 6, 9]
    assert [t.end for t in ts] == [2, 5, 8, 11]
    _, incs = terms_incs("多くの学生が試験に落ちた。")
    assert incs == [1, 2, 2, 2]


def test_decomposition_senior_software_engineer():
    t, incs = terms_incs("シニアソフトウェアエンジニア")
    assert t == ["シニア", "シニアソフトウェアエンジニア",
                 "ソフトウェア", "エンジニア"]
    assert incs == [1, 0, 1, 1]


def test_decomposition_senior_project_manager():
    # trailing ー removed by katakana stemming, on part AND compound
    t, incs = terms_incs("シニアプロジェクトマネージャー")
    assert t == ["シニア", "シニアプロジェクトマネージャ",
                 "プロジェクト", "マネージャ"]
    assert incs == [1, 0, 1, 1]


def test_decomposition_kansai_airport():
    t, incs = terms_incs("関西国際空港")
    assert t == ["関西", "関西国際空港", "国際", "空港"]
    assert incs == [1, 0, 1, 1]


def test_decomposition_konika_minolta():
    t, incs = terms_incs("コニカミノルタホールディングス")
    assert t == ["コニカ", "コニカミノルタホールディングス",
                 "ミノルタ", "ホールディングス"]
    assert incs == [1, 0, 1, 1]


def test_decomposition_narita():
    t, incs = terms_incs("成田空港")
    assert t == ["成田", "成田空港", "空港"]
    assert incs == [1, 0, 1]


def test_kyoto_university_no_compound():
    # 京都大学硬式野球部 is not a dictionary compound: parts only
    t, incs = terms_incs("京都大学硬式野球部")
    assert t == ["京都大", "学", "硬式", "野球", "部"]
    assert incs == [1, 1, 1, 1, 1]


def test_normal_mode_keeps_compound():
    toks = japanese_tokenize("関西国際空港", mode="normal")
    assert [t.term for t in toks] == ["関西国際空港"]


def test_katakana_stem_rules():
    # TestJapaneseKatakanaStemFilter.testStemVariants
    for w, exp in [("コピー", "コピー"), ("コーヒー", "コーヒ"),
                   ("タクシー", "タクシ"), ("パーティー", "パーティ"),
                   ("パーティ", "パーティ"), ("センター", "センタ")]:
        assert katakana_stem(w) == exp, w
    assert katakana_stem("ﾀｸｼｰ") == "ﾀｸｼｰ"  # halfwidth untouched
    assert katakana_stem("data-ー") == "data-ー"  # not katakana


def test_latin_and_width_fold():
    ts = japanese_analyze("Ｔｅｓｔ の data")
    assert [t.term for t in ts] == ["test", "data"]


def test_custom_dictionary():
    chain = make_japanese_analyzer(
        dict_entries={"朝日": (2000, "名詞", None),
                      "新聞": (2000, "名詞", None)},
        compounds=frozenset(["朝日新聞"]))
    assert [t.term for t in chain("朝日新聞")] == ["朝日", "朝日新聞", "新聞"]


def test_registered():
    assert [t.term for t in get_analyzer("japanese")("お寿司が食べたい")] \
        is not None  # runs without error; お is unknown single char


def test_iteration_marks():
    # TestJapaneseIterationMarkCharFilter goldens (keyword-analyzer level
    # = the raw char-filter output)
    from lucene_solr_old_spark.functions.kuromoji import \
        iteration_mark_normalize as f

    assert f("時々") == "時時"
    assert f("馬鹿々々しい") == "馬鹿馬鹿しい"
    assert f("ミスヾ") == "ミスズ"
    assert f("おゝの") == "おおの"
    assert f("みすゞ") == "みすず"
    assert f("じゞ") == "じじ"
    assert f("じゝ") == "じし"
    assert f("ところゞゝゝ") == "ところどころ"
    # malformed inputs emit as-is where iteration is impossible
    assert f("abcところゝゝゝゝ") == "abcところcところ"
    assert f("abcところゞゝゝゝ") == "abcところcところ"
    assert f("ところゞゝゝゞゝゞ") == "ところどころゞゝゞ"
    assert f("々") == "々"
    assert f("ゞ") == "ゞ"
    assert f("ゞゝ") == "ゞゝ"


def test_iteration_marks_flags():
    from lucene_solr_old_spark.functions.kuromoji import \
        iteration_mark_normalize as f

    assert f("時々", normalize_kanji=False) == "時々"
    assert f("みすゞ", normalize_kana=False) == "みすゞ"
