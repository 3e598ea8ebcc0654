"""ICUTokenizer composite segmentation — reference TestICUTokenizer
goldens (tokenizer + nfkc_cf normalize, the reference's
ICUTokenizer + ICUNormalizer2Filter chain)."""

from lucene_solr_old_spark.functions.icu2 import icu_normalize
from lucene_solr_old_spark.functions.icu_segment import icu_tokenize


def analyze(text):
    return [icu_normalize(t) for t, _s, _e in icu_tokenize(text)]


def test_armenian():
    assert analyze(
        "Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն "
        "վիքիպեդիայում) գրվել են կամավորների կողմից ու համարյա բոլոր "
        "հոդվածները կարող է խմբագրել ցանկաց մարդ ով կարող է բացել "
        "Վիքիպեդիայի կայքը։") == [
        "վիքիպեդիայի", "13", "միլիոն", "հոդվածները", "4,600", "հայերեն",
        "վիքիպեդիայում", "գրվել", "են", "կամավորների", "կողմից", "ու",
        "համարյա", "բոլոր", "հոդվածները", "կարող", "է", "խմբագրել",
        "ցանկաց", "մարդ", "ով", "կարող", "է", "բացել", "վիքիպեդիայի",
        "կայքը"]


def test_amharic():
    assert analyze(
        "ዊኪፔድያ የባለ ብዙ ቋንቋ የተሟላ ትክክለኛና ነጻ መዝገበ ዕውቀት (ኢንሳይክሎፒዲያ) ነው። "
        "ማንኛውም") == [
        "ዊኪፔድያ", "የባለ", "ብዙ", "ቋንቋ", "የተሟላ", "ትክክለኛና", "ነጻ", "መዝገበ",
        "ዕውቀት", "ኢንሳይክሎፒዲያ", "ነው", "ማንኛውም"]


def test_arabic_head():
    toks = analyze(
        "الفيلم الوثائقي الأول عن ويكيبيديا يسمى \"الحقيقة بالأرقام: "
        "قصة ويكيبيديا\" (بالإنجليزية: Truth in Numbers: The Wikipedia "
        "Story)، سيتم إطلاقه في 2008.")
    assert toks[:10] == ["الفيلم", "الوثائقي", "الأول", "عن", "ويكيبيديا",
                         "يسمى", "الحقيقة", "بالأرقام", "قصة", "ويكيبيديا"]
    assert toks[-2:] == ["في", "2008"]


def test_aramaic_syriac_marks_glue():
    toks = analyze(
        "ܘܝܩܝܦܕܝܐ (ܐܢܓܠܝܐ: Wikipedia) ܗܘ ܐܝܢܣܩܠܘܦܕܝܐ ܚܐܪܬܐ ܕܐܢܛܪܢܛ "
        "ܒܠܫܢ̈ܐ ܣܓܝܐ̈ܐ܂")
    assert toks[:10] == ["ܘܝܩܝܦܕܝܐ", "ܐܢܓܠܝܐ", "wikipedia", "ܗܘ",
                         "ܐܝܢܣܩܠܘܦܕܝܐ", "ܚܐܪܬܐ", "ܕܐܢܛܪܢܛ", "ܒܠܫܢ̈ܐ",
                         "ܣܓܝܐ̈ܐ", "ܫܡܗ"][:9]


def test_bengali():
    assert analyze(
        "এই বিশ্বকোষ পরিচালনা করে উইকিমিডিয়া ফাউন্ডেশন (একটি অলাভজনক "
        "সংস্থা)।")[:9] == [
        "এই", "বিশ্বকোষ", "পরিচালনা", "করে", "উইকিমিডিয়া", "ফাউন্ডেশন",
        "একটি", "অলাভজনক", "সংস্থা"]


def test_farsi_digits():
    toks = analyze("ویکی پدیای انگلیسی در تاریخ ۲۵ دی ۱۳۷۹ به صورت")
    assert toks == ["ویکی", "پدیای", "انگلیسی", "در", "تاریخ", "۲۵",
                    "دی", "۱۳۷۹", "به", "صورت"]


def test_greek_final_sigma_folds():
    toks = analyze("Γράφεται σε συνεργασία από εθελοντές με το "
                   "λογισμικό wiki,")
    assert toks == ["γράφεται", "σε", "συνεργασία", "από", "εθελοντέσ",
                    "με", "το", "λογισμικό", "wiki"]


def test_thai():
    assert analyze("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔") == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
        "แล้ว", "เธอ", "จะ", "ไป", "ไหน", "๑๒๓๔"]


def test_lao():
    assert analyze("ກວ່າດອກ") == ["ກວ່າ", "ດອກ"]


def test_tibetan():
    assert analyze(
        "སྣོན་མཛོད་དང་ལས་འདིས་བོད་ཡིག་མི་ཉམས་གོང་འཕེལ་དུ་གཏོང་བར་"
        "ཧ་ཅང་དགེ་མཚན་མཆིས་སོ། །") == [
        "སྣོན", "མཛོད", "དང", "ལས", "འདིས", "བོད", "ཡིག", "མི", "ཉམས",
        "གོང", "འཕེལ", "དུ", "གཏོང", "བར", "ཧ", "ཅང", "དགེ", "མཚན",
        "མཆིས", "སོ"]


def test_chinese_per_char_and_width():
    assert analyze("我是中国人。 １２３４ Ｔｅｓｔｓ ") == [
        "我", "是", "中", "国", "人", "1234", "tests"]


def test_empty_and_degenerate():
    assert analyze("") == []
    assert analyze(".") == []
    assert analyze(" ") == []


def test_offsets_cover_source():
    toks = icu_tokenize("abc ๑๒๓๔ 我是")
    for term, s, e in toks:
        assert "abc ๑๒๓๔ 我是"[s:e] == term

# ---- r5: full mid-token UAX#29 rules (WB6/7, WB7a-c, WB11/12) --------------
# fixtures from TestICUTokenizer testApostrophesSA / testNumericSA /
# testDelimitersSA / testTextWithNumbersSA / testVariousTextSA /
# testAlphanumericSA / testKoreanSA / testLUCENE1545 / testOffsets

def test_apostrophes_sa():
    assert analyze("O'Reilly") == ["o'reilly"]
    assert analyze("you're") == ["you're"]
    assert analyze("she's") == ["she's"]
    assert analyze("Jim's") == ["jim's"]
    assert analyze("don't") == ["don't"]
    assert analyze("O'Reilly's") == ["o'reilly's"]
    # curly apostrophe (U+2019, MidNumLet) joins too (nfkc_cf keeps it)
    assert analyze("don’t") == ["don’t"]


def test_numeric_sa():
    assert analyze("21.35") == ["21.35"]
    assert analyze("R2D2 C3PO") == ["r2d2", "c3po"]
    assert analyze("216.239.63.104") == ["216.239.63.104"]
    # Single_Quote joins digits too (WB11/12): Swiss thousands
    assert analyze("1'000") == ["1'000"]


def test_delimiters_sa():
    assert analyze("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert analyze("dogs,chase,cats") == ["dogs", "chase", "cats"]
    assert analyze("ac/dc") == ["ac", "dc"]


def test_text_with_numbers_sa():
    assert analyze("David has 5000 bones") == ["david", "has", "5000",
                                               "bones"]


def test_various_text_sa():
    assert analyze("C embedded developers wanted") == [
        "c", "embedded", "developers", "wanted"]
    assert analyze("foo bar FOO BAR") == ["foo", "bar", "foo", "bar"]
    assert analyze("foo      bar .  FOO <> BAR") == [
        "foo", "bar", "foo", "bar"]
    assert analyze('"QUOTED" word') == ["quoted", "word"]


def test_alphanumeric_sa():
    assert analyze("B2B") == ["b2b"]
    assert analyze("2B") == ["2b"]


def test_korean_sa():
    assert analyze("안녕하세요 한글입니다") == ["안녕하세요", "한글입니다"]
    assert analyze("훈민정음") == ["훈민정음"]


def test_lucene1545_combining_mark():
    # U+0364 COMBINING LATIN SMALL LETTER E glues (WB4)
    assert analyze("moͤchte") == ["moͤchte"]


def test_hebrew_quote_rules():
    # WB7a: Single_Quote attaches after a Hebrew letter word-FINALLY
    assert analyze("צ'ארלס") == ["צ'ארלס"]
    assert analyze("צ'") == ["צ'"]
    # WB7b/c: straight double quote INSIDE a Hebrew word (gershayim)
    assert analyze('צה"ל') == ['צה"ל']
    # ...but not word-finally
    assert analyze('צה"') == ["צה"]
    # U+05F4 HEBREW GERSHAYIM itself is MidLetter
    assert analyze("צה״ל") == ["צה״ל"]
    # U+05F3 HEBREW GERESH is ALetter and continues the word
    assert analyze("צ׳ארלס") == ["צ׳ארלס"]


def test_colon_midletter_icu52():
    # U+003A was MidLetter through Unicode 6.3 (the reference's ICU 52);
    # a:b joins, trailing colon does not attach
    assert analyze("a:b") == ["a:b"]
    assert analyze("ab: cd") == ["ab", "cd"]


def test_offsets_fixture():
    toks = icu_tokenize("David has 5000 bones")
    assert [(s, e) for _t, s, e in toks] == [
        (0, 5), (6, 9), (10, 14), (15, 20)]
