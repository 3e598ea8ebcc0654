"""XML query parser (CoreParser) vs the reference's TestParser fixtures.

Every XML document below is transcribed (minus the Apache license
headers) from ``lucene/queryparser/src/test/.../xml/*.xml``; the corpus
mimics the reuters sample TestParser indexes (a ``contents`` field plus
a ``date`` metadata field) at toy scale.  TestParser.java asserts
hit-count > 0 and dumps results; here the semantics are pinned exactly
(which docs match, exclusion, filter bounds, nesting).
"""

import pytest

from lucene_solr_old_spark.operators import search as S
from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.plans.xml import (ParserException, XBool, XSpan,
                                             XTerm, parse_xml_query,
                                             xml_search)

DOCS = [
    # (key, contents, date)
    ("d01", "bank of england raises rates", "19870408"),
    ("d02", "sumitomo bank merger talks stall", "19870410"),
    ("d03", "merger of two regional banks", "19870410"),
    ("d04", "bank merger approved by board", "19870411"),
    ("d05", "miners killed in mine accident", "19870410"),
    ("d06", "workers worker strike at mine", "19870411"),
    ("d07", "fire burn damages the plant", "19870412"),
    ("d08", "sumitomo trading results improve", "19870413"),
    ("d09", "bank profits rise on trading", "19870409"),
    ("d10", "england cricket and the bank holiday", "19870412"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame([(k, c) for k, c, _ in DOCS],
                               "url STRING, text STRING")
    return build_index(df, num_segments=2, analyzer="ws_lower").persist()


@pytest.fixture(scope="module")
def attrs(spark):
    return spark.createDataFrame([(k, d) for k, _, d in DOCS],
                                 "key STRING, date STRING")


def keys(df):
    return {r["key"] for r in df.collect()}


def test_term_query(idx):
    # TermQuery.xml
    got = xml_search(idx, '<TermQuery fieldName="contents">sumitomo</TermQuery>',
                     k=20)
    assert keys(got) == {"d02", "d08"}


def test_term_query_is_not_analyzed(idx):
    # TermQueryBuilder uses the text verbatim: an upper-case term misses
    # the lower-cased index (classic raw-term footgun the XML API keeps)
    got = xml_search(idx, '<TermQuery fieldName="contents">Sumitomo</TermQuery>',
                     k=20)
    assert keys(got) == set()


def test_boolean_query(idx):
    # BooleanQuery.xml: should merger, mustnot sumitomo, must bank
    xml = """
    <BooleanQuery fieldName="contents">
      <Clause occurs="should"><TermQuery>merger</TermQuery></Clause>
      <Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>
      <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
    </BooleanQuery>"""
    got = xml_search(idx, xml, k=20)
    # bank docs minus the sumitomo doc (d02); d03 has 'banks' not 'bank'
    assert keys(got) == {"d01", "d04", "d09", "d10"}
    # merger should-clause lifts d04 above bank-only docs
    rows = {r["key"]: r["score"] for r in got.collect()}
    assert rows["d04"] > rows["d01"]


def test_nested_boolean_query(idx):
    # NestedBooleanQuery.xml: the grandchild-clause regression — the
    # nested bool's MUST failure must not leak into the outer query
    xml = """
    <BooleanQuery fieldName="contents">
      <Clause occurs="should">
        <BooleanQuery fieldName="contents">
          <Clause occurs="must">
            <TermQuery>doesNotExistButShouldBeOKBecauseOtherClauseExists</TermQuery>
          </Clause>
        </BooleanQuery>
      </Clause>
      <Clause occurs="should"><TermQuery>bank</TermQuery></Clause>
    </BooleanQuery>"""
    got = xml_search(idx, xml, k=20)
    assert keys(got) == {"d01", "d02", "d04", "d09", "d10"}


def test_disjunction_max_query(idx):
    # DisjunctionMaxQuery.xml shape (fields collapsed to contents)
    xml = """
    <DisjunctionMaxQuery>
      <TermQuery fieldName="contents">merger</TermQuery>
      <DisjunctionMaxQuery tieBreaker="1.2">
        <TermQuery fieldName="contents">trading</TermQuery>
      </DisjunctionMaxQuery>
    </DisjunctionMaxQuery>"""
    got = xml_search(idx, xml, k=20)
    assert keys(got) == {"d02", "d03", "d04", "d08", "d09"}
    # outer tie=0.0: a doc matching both takes max(single scores)
    single_m = {r["key"]: r["score"] for r in xml_search(
        idx, '<TermQuery fieldName="contents">merger</TermQuery>', k=20
    ).collect()}
    both = {r["key"]: r["score"] for r in got.collect()}
    assert both["d03"] == pytest.approx(single_m["d03"], rel=1e-6)


def test_user_query_phrase(idx):
    # UserInputQuery.xml: classic syntax '"Bank of England"'
    xml = '<UserQuery fieldName="contents">"bank of england"</UserQuery>'
    got = xml_search(idx, xml, k=20)
    assert keys(got) == {"d01"}


def test_terms_query(idx):
    # TermsQuery.xml: analyzed disjunction 'sumitomo bank'
    got = xml_search(
        idx, '<TermsQuery fieldName="contents">Sumitomo Bank</TermsQuery>',
        k=20)
    assert keys(got) == {"d01", "d02", "d04", "d08", "d09", "d10"}
    # minimumNumberShouldMatch=2 keeps only the doc with both
    got2 = xml_search(idx, """
      <TermsQuery fieldName="contents" minimumNumberShouldMatch="2">
        Sumitomo Bank</TermsQuery>""", k=20)
    assert keys(got2) == {"d02"}


def test_boosting_term_query(idx):
    # BoostingTermQuery.xml: payload-free index -> scores like the term
    got = xml_search(
        idx,
        '<BoostingTermQuery fieldName="contents">sumitomo</BoostingTermQuery>',
        k=20)
    assert keys(got) == {"d02", "d08"}


def test_match_all_docs_filtered(idx, attrs):
    # MatchAllDocsQuery.xml: match-all filtered to the date window
    xml = """
    <FilteredQuery>
      <Query><MatchAllDocsQuery/></Query>
      <Filter><RangeFilter fieldName="date" lowerTerm="19870409"
                           upperTerm="19870412"/></Filter>
    </FilteredQuery>"""
    got = xml_search(idx, xml, k=20, attrs=attrs)
    assert keys(got) == {"d02", "d03", "d04", "d05", "d06", "d07",
                         "d09", "d10"}
    assert all(r["score"] == 1.0 for r in got.collect())


def test_range_filter_query(idx, attrs):
    # RangeFilterQuery.xml: boolean query + date filter
    xml = """
    <FilteredQuery>
      <Query>
        <BooleanQuery fieldName="contents">
          <Clause occurs="should"><TermQuery>merger</TermQuery></Clause>
          <Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>
          <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
        </BooleanQuery>
      </Query>
      <Filter><RangeFilter fieldName="date" lowerTerm="19870409"
                           upperTerm="19870412"/></Filter>
    </FilteredQuery>"""
    got = xml_search(idx, xml, k=20, attrs=attrs)
    # d01 (19870408) now excluded by the date filter
    assert keys(got) == {"d04", "d09", "d10"}


def test_constant_score_query(idx, attrs):
    # ConstantScoreQuery.xml
    xml = """
    <ConstantScoreQuery boost="2.5">
      <RangeFilter fieldName="date" lowerTerm="19870409"
                   upperTerm="19870412"/>
    </ConstantScoreQuery>"""
    got = xml_search(idx, xml, k=20, attrs=attrs)
    assert len(keys(got)) == 8
    assert all(r["score"] == pytest.approx(2.5) for r in got.collect())


def test_span_query(idx):
    # SpanQuery.xml: the full composite span tree
    xml = """
    <SpanOr fieldName="contents">
      <SpanNear slop="8" inOrder="false">
        <SpanOr>
          <SpanTerm>killed</SpanTerm>
          <SpanTerm>died</SpanTerm>
          <SpanTerm>dead</SpanTerm>
        </SpanOr>
        <SpanOr>
          <SpanOrTerms>miner miners</SpanOrTerms>
          <SpanNear slop="6" inOrder="false">
            <SpanTerm>mine</SpanTerm>
            <SpanOrTerms>worker workers</SpanOrTerms>
          </SpanNear>
        </SpanOr>
      </SpanNear>
      <SpanFirst end="10">
        <SpanOrTerms>fire burn</SpanOrTerms>
      </SpanFirst>
    </SpanOr>"""
    got = xml_search(idx, xml, k=20)
    # d05: killed near miners; d07: fire within first 10 positions;
    # d06: mine near worker(s) but no killed/died/dead -> no match
    assert keys(got) == {"d05", "d07"}


def test_span_not(idx):
    xml = """
    <SpanNot fieldName="contents">
      <Include>
        <SpanNear slop="2" inOrder="true">
          <SpanTerm>bank</SpanTerm>
          <SpanTerm>merger</SpanTerm>
        </SpanNear>
      </Include>
      <Exclude><SpanTerm>merger</SpanTerm></Exclude>
    </SpanNot>"""
    got = xml_search(idx, xml, k=20)
    # SpanNot drops include spans that OVERLAP an exclude span (not
    # whole docs containing the term): excluding 'merger' kills every
    # 'bank merger' span since the span itself contains it
    assert keys(got) == set()
    xml2 = """
    <SpanNot fieldName="contents">
      <Include>
        <SpanNear slop="2" inOrder="true">
          <SpanTerm>bank</SpanTerm>
          <SpanTerm>merger</SpanTerm>
        </SpanNear>
      </Include>
      <Exclude><SpanTerm>sumitomo</SpanTerm></Exclude>
    </SpanNot>"""
    # 'sumitomo' (pos 0 in d02) does not overlap its 'bank merger' span
    # (pos 1-2), so d02 survives alongside d04
    assert keys(xml_search(idx, xml2, k=20)) == {"d02", "d04"}


def test_boosting_query(idx):
    # BoostingQuery.xml shape: bank docs, sumitomo-context demoted
    xml = """
    <BoostingQuery boost="0.01">
      <Query><TermQuery fieldName="contents">bank</TermQuery></Query>
      <ContextQuery>
        <TermQuery fieldName="contents">sumitomo</TermQuery>
      </ContextQuery>
    </BoostingQuery>"""
    got = xml_search(idx, xml, k=20)
    rows = {r["key"]: r["score"] for r in got.collect()}
    assert set(rows) == {"d01", "d02", "d04", "d09", "d10"}
    assert rows["d02"] < min(v for k, v in rows.items() if k != "d02")


def test_fuzzy_like_this(idx):
    # FuzzyLikeThisQuery.xml: misspelt 'Sumitimo' still reaches sumitomo
    xml = """
    <FuzzyLikeThisQuery>
      <Field fieldName="contents">sumitimo bank</Field>
    </FuzzyLikeThisQuery>"""
    got = xml_search(idx, xml, k=20)
    assert {"d02", "d08"} <= keys(got)


def test_terms_filter(idx, attrs):
    # TermsFilterQuery.xml shape
    xml = """
    <FilteredQuery>
      <Query><MatchAllDocsQuery/></Query>
      <Filter><TermsFilter fieldName="contents">sumitomo</TermsFilter></Filter>
    </FilteredQuery>"""
    got = xml_search(idx, xml, k=20, attrs=attrs)
    assert keys(got) == {"d02", "d08"}


def test_boolean_filter(idx, attrs):
    # BooleanFilter.xml shape: date window AND NOT sumitomo
    xml = """
    <ConstantScoreQuery>
      <BooleanFilter>
        <Clause occurs="must">
          <RangeFilter fieldName="date" lowerTerm="19870409"
                       upperTerm="19870412"/>
        </Clause>
        <Clause occurs="mustnot">
          <TermsFilter fieldName="contents">sumitomo</TermsFilter>
        </Clause>
      </BooleanFilter>
    </ConstantScoreQuery>"""
    got = xml_search(idx, xml, k=20, attrs=attrs)
    assert keys(got) == {"d03", "d04", "d05", "d06", "d07", "d09", "d10"}


def test_cached_filter_delegates(idx, attrs):
    # CachedFilter.xml: wraps a filter, same result set
    xml = """
    <ConstantScoreQuery>
      <CachedFilter>
        <RangeFilter fieldName="date" lowerTerm="19870412"
                     upperTerm="19870413"/>
      </CachedFilter>
    </ConstantScoreQuery>"""
    got = xml_search(idx, xml, k=20, attrs=attrs)
    assert keys(got) == {"d07", "d08", "d10"}


def test_parse_errors():
    with pytest.raises(ParserException):
        parse_xml_query("<NoSuchQuery>x</NoSuchQuery>")
    with pytest.raises(ParserException):
        parse_xml_query("<TermQuery fieldName='f'>   </TermQuery>")
    with pytest.raises(ParserException):
        parse_xml_query("not xml at all <<<")
    with pytest.raises(ParserException):
        parse_xml_query("""
          <BooleanQuery><Clause occurs="banana">
            <TermQuery fieldName="f">x</TermQuery>
          </Clause></BooleanQuery>""")
    with pytest.raises(ParserException):
        # SpanNear without slop (DOMUtils.getAttributeOrFail)
        parse_xml_query("""
          <SpanNear fieldName="f"><SpanTerm>a</SpanTerm>
          <SpanTerm>b</SpanTerm></SpanNear>""")


def test_field_name_inheritance():
    node = parse_xml_query("""
      <BooleanQuery fieldName="contents">
        <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
      </BooleanQuery>""")
    assert isinstance(node, XBool)
    occ, child = node.clauses[0]
    assert isinstance(child, XTerm) and child.field == "contents"
    span = parse_xml_query("""
      <SpanOr fieldName="contents"><SpanTerm>a</SpanTerm></SpanOr>""")
    assert isinstance(span, XSpan) and span.field == "contents"


def test_content_field_enforced(idx):
    with pytest.raises(ParserException):
        xml_search(idx, '<TermQuery fieldName="title">x</TermQuery>',
                   k=5, content_field="contents").collect()


def test_matches_classic_scoring(idx):
    # the XML TermQuery scores identically to the engine's term search
    got = {r["key"]: r["score"] for r in xml_search(
        idx, '<TermQuery fieldName="contents">merger</TermQuery>',
        k=20, precision="float64").collect()}
    ref = {r["key"]: r["score"] for r in S.search_or(
        idx, "merger", k=20, precision="float64").collect()}
    assert got == ref
