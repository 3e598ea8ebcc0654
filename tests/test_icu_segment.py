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
