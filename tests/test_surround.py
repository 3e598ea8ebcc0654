"""Surround query parser — ported reference fixtures.

Match-set goldens and exception sets are the reference's own
``queryparser/src/test/.../surround/query/Test01Exceptions.java``,
``Test02Boolean.java`` and ``Test03Distance.java`` (docs1/docs2/docs3
corpora, expdnrs arrays) — engine-independent oracles.
"""

import pytest

from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.plans.surround import (ParseException,
                                                  TooManyBasicQueries,
                                                  parse_surround,
                                                  surround_search)

DOCS1 = ["word1 word2 word3", "word4 word5", "ord1 ord2 ord3",
         "orda1 orda2 orda3 word2 worda3", "a c e a b c"]
DOCS2 = ["w1 w2 w3 w4 w5", "w1 w3 w2 w3", ""]
DOCS3 = [
    "low pressure temperature inversion and rain",
    "when the temperature has a negative height above a depression "
    "no precipitation gradient is expected",
    "when the temperature has a negative height gradient above a "
    "depression no precipitation is expected",
    "",
]


@pytest.fixture(scope="module")
def db1(spark):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(DOCS1)], "doc_key STRING, text STRING")
    return build_index(df, key_col="doc_key", text_col="text",
                       num_segments=2, analyzer="ws_lower").persist()


@pytest.fixture(scope="module")
def db2(spark):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(DOCS2)], "doc_key STRING, text STRING")
    return build_index(df, key_col="doc_key", text_col="text",
                       num_segments=2, analyzer="ws_lower").persist()


@pytest.fixture(scope="module")
def db3(spark):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(DOCS3)], "doc_key STRING, text STRING")
    return build_index(df, key_col="doc_key", text_col="text",
                       num_segments=2, analyzer="ws_lower").persist()


def _match(index, query, max_bq=16):
    rows = surround_search(index, query, k=20,
                           max_basic_queries=max_bq).collect()
    return sorted(int(r["key"]) for r in rows)


# ---- Test01Exceptions + Test03Distance exception queries -------------------

EXCEPTION_QUERIES = [
    "*", "a*", "ab*", "?", "a?", "ab?", "a???b", "a?", "a*b?",
    "word1 word2", "word2 AND", "word1 OR", "AND(word2)", "AND(word2,)",
    "AND(word2,word1,)", "OR(word2)", "OR(word2 ,", "OR(word2 , word1 ,)",
    "xx NOT", "xx (a AND b)", "(a AND b", "a OR b)",
    "or(word2+ not ord+, and xyz,def)", "",
    # Test03Distance: non-DistanceSubQuery inside a distance operator
    "(aa and bb) w cc", "(aa or bb) w (cc and dd)", "(aa not bb) w cc",
    "(aa or bb) w (bi:cc)", "(aa or bb) w bi:cc", "(aa or bi:bb) w cc",
    "(aa or (bi:bb)) w cc", "(aa or (bb and dd)) w cc",
]


@pytest.mark.parametrize("q", EXCEPTION_QUERIES)
def test_exception_queries(q):
    with pytest.raises(ParseException):
        parse_surround(q)


def test_opt_is_a_plain_term():
    # "(aa opt bb) w cc" fails in the reference because OPT is not an
    # operator -> juxtaposed terms; same here
    with pytest.raises(ParseException):
        parse_surround("(aa opt bb) w cc")


# ---- Test02Boolean ---------------------------------------------------------

BOOLEAN_CASES = [
    ("word1", [0]),
    ("word*", [0, 1, 3]),
    ("ord2", [2]),
    ("kxork*", []),
    ("wor*", [0, 1, 3]),
    ("ab", []),
    ("abc?", []),
    ("word?", [0, 1, 3]),
    ("w?rd?", [0, 1, 3]),
    ("w*rd?", [0, 1, 3]),
    ("w*rd??", [3]),
    ("w*?da?", [3]),
    ("w?da?", []),
    ("word1 AND word2", [0]),
    ("word* and ord*", [3]),
    ("and(word1,word2)", [0]),
    ("word1 or word2", [0, 3]),
    ("word* OR ord*", [0, 1, 2, 3]),
    ("OR (word1, word2)", [0, 3]),
    ("word2 NOT word1", [3]),
    ("word2* not ord*", [0]),
    ("(word1 or ab)and or(word2,xyz, defg)", [0]),
    ("or( word2* not ord*, and(xyz,def))", [0]),
]


@pytest.mark.parametrize("q,exp", BOOLEAN_CASES)
def test_boolean(db1, q, exp):
    assert _match(db1, q) == exp


# ---- Test03Distance --------------------------------------------------------

DIST1_CASES = [
    ("word1 w word2", [0]),
    ("word1 n word2", [0]),
    ("word2 n word1", [0]),
    ("word2 w word1", []),
    ("word2 2W word1", []),
    ("word2 2N word1", [0]),
    ("word1 2N word2", [0]),
    ("word2 3w word1", []),
    ("word2 3n word1", [0]),
    ("word1 3n word2", [0]),
    ("orda1 w orda3", []),
    ("orda1 2w orda3", [3]),
    ("word1* w word2", [0]),
    ("word* w word2", [0]),
    ("word2 w word*", [0, 3]),
    ("word* n word2", [0, 3]),
    ("word2 n word*", [0, 3]),
    ("word1* w word2*", [0]),
    ("word1* N word2*", [0]),
    ("kxork* w kxor*", []),
    ("kxork* 99n kxor*", []),
    ("word2* 2W word1*", []),
    ("word2* 2N word1*", [0]),
    ("ord* W word*", [3]),
    ("ord* N word*", [3]),
    ("word* N ord*", [3]),
    ("(orda2 OR orda3) W word*", [3]),
    ("(orda2 OR orda3) W (word2 OR worda3)", [3]),
    ("(orda2 OR orda3) 2W (word2 OR worda3)", [3]),
    ("(orda2 OR orda3) 2N (word2 OR worda3)", [3]),
]


@pytest.mark.parametrize("q,exp", DIST1_CASES)
def test_distance_db1(db1, q, exp):
    assert _match(db1, q) == exp


DIST2_CASES = [
    ("W (w1, w2, w3)", [0]),
    ("N(w1, w2, w3)", [0, 1]),
    ("N(w3, w1, w2)", [0, 1]),
    ("2W(w1,w2,w3)", [0, 1]),
    ("2N(w1,w2,w3)", [0, 1]),
    ("2N(w2,w3,w1)", [0, 1]),
    ("w1 W w2 W w3", [0]),
    ("w1 N w2 N w3", [0]),
    ("w1 2W w2 2W w3", [0, 1]),
    ("w1 2N w2 2N w3", [0, 1]),
]


@pytest.mark.parametrize("q,exp", DIST2_CASES)
def test_distance_db2(db2, q, exp):
    assert _match(db2, q) == exp


def test_distance_db3_nested_example(db3):
    # Test03Distance.test3Example01 — "query does not match doc 1
    # because 'gradient' is in wrong place there"
    q = ("50n((low w pressure*) or depression*,"
         "5n(temperat*, (invers* or (negativ* 3n gradient*))),"
         "rain* or precipitat*)")
    assert _match(db3, q, max_bq=64) == [0, 2]


# ---- parser structure / weights / budget -----------------------------------

def test_left_associative_pairwise_nesting():
    ast = parse_surround("w1 2W w2 3W w3")
    # ((w1 2W w2) 3W w3): outer dist 3 over [inner, w3]
    assert ast[0] == "dist" and ast[2] == 3 and ast[3] is True
    inner = ast[1][0]
    assert inner[0] == "dist" and inner[2] == 2


def test_precedence_or_lowest():
    ast = parse_surround("a OR b AND c")
    assert ast[0] == "or"
    assert ast[1][1][0] == "and"


def test_fields_parse_and_ignore(db1):
    assert _match(db1, "bi:word1") == [0]
    assert parse_surround("bi:word1")[0] == "fields"


def test_weights(db1):
    assert _match(db1, "word1^2") == [0]
    with pytest.raises(ParseException):
        parse_surround("word1^0")


def test_quoted_terms(db1):
    assert _match(db1, '"word1"') == [0]
    assert _match(db1, '"word1" w "word2"') == [0]


def test_too_many_basic_queries(db1):
    with pytest.raises(TooManyBasicQueries):
        _match(db1, "word* OR ord*", max_bq=2)


def test_not_chain(db1):
    # a NOT b NOT c: first MUST, rest MUST_NOT (NotQuery.java)
    assert _match(db1, "word2 NOT word1 NOT worda3") == []
    assert _match(db1, "word2 NOT kxyz NOT kxyz2") == [0, 3]
