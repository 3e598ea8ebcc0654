"""XML query parser (CoreParser) — programmatic query trees over XML.

Re-derivation of the reference's
``lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/CoreParser.java:67-118``
builder registry and its ``builders/`` package, mapped onto this
engine's existing plan objects instead of Lucene Query objects:

==================  =====================================================
XML element         engine mapping
==================  =====================================================
TermQuery           raw (un-analyzed) term -> BM25 term score frame
                    (``TermQueryBuilder.java``: text used verbatim)
TermsQuery          analyzer-tokenized -> SHOULD disjunction with
                    minimumNumberShouldMatch (``TermsQueryBuilder.java``)
MatchAllDocsQuery   every doc, score = boost
BooleanQuery        Clause children with occurs=must/mustnot/should,
                    nested queries allowed; DIRECT children only (the
                    NestedBooleanQuery.xml regression fixture)
DisjunctionMaxQuery max + tieBreaker * rest over child disjuncts
UserQuery           classic-parser syntax via plans/query.parse_query
                    (``UserInputQueryBuilder.java``)
ConstantScoreQuery  filter -> docs at score = boost
FilteredQuery       <Query> scored, semi-joined with <Filter> docs
BoostingQuery       <Query> scored; docs also matching <ContextQuery>
                    have score * boost (``queries/BoostingQuery.java``)
FuzzyLikeThisQuery  per <Field>: analyze, fuzzy-expand each token,
                    disjunction (documented simplification of the
                    reference's prioritized-term flattening)
Span*               SpanTerm / SpanOrTerms / SpanOr / SpanNear /
                    SpanFirst / SpanNot / BoostingTermQuery -> the span
                    tuple trees of operators/spans.py
RangeFilter         metadata column range (attrs) or indexed-term range
NumericRange*       numeric metadata column range
TermsFilter         analyzed terms -> docs containing any
BooleanFilter       filter combination with occurs semantics
CachedFilter        delegates to the wrapped filter/query (the LRU
                    cache maps to Spark's own plan/shuffle reuse)
==================  =====================================================

``fieldName`` resolves with ancestor inheritance exactly like
``DOMUtils.getAttributeWithInheritance``.  The engine indexes one
content field; term/span queries must target it (default any), while
filters may target metadata columns supplied via ``attrs``.

Fixtures: every ``queryparser/src/test/.../xml/*.xml`` file this
surface supports is transcribed in tests/test_xml_query.py.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field as dfield

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import get_analyzer
from ..operators import search as S
from ..operators.indexer import InvertedIndex
from ..operators.spans import span_score_frame
from .query import (BoolQuery, FuzzyClause, _clause_frame, bool_score_frame,
                    parse_query)

__all__ = ["ParserException", "parse_xml_query", "xml_score_frame",
           "xml_search"]


class ParserException(ValueError):
    """Mirror of ``queryparser/xml/ParserException.java``."""


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------

@dataclass
class XTerm:
    field: str | None
    term: str
    boost: float = 1.0


@dataclass
class XTerms:
    field: str | None
    text: str
    boost: float = 1.0
    min_should_match: int = 0


@dataclass
class XMatchAll:
    boost: float = 1.0


@dataclass
class XBool:
    clauses: list = dfield(default_factory=list)   # [(occur, node)]
    boost: float = 1.0
    min_should_match: int = 0


@dataclass
class XDisMax:
    children: list = dfield(default_factory=list)
    tie: float = 0.0
    boost: float = 1.0


@dataclass
class XUser:
    field: str | None
    text: str
    boost: float = 1.0


@dataclass
class XConstantScore:
    filt: object
    boost: float = 1.0


@dataclass
class XFiltered:
    query: object
    filt: object
    boost: float = 1.0


@dataclass
class XBoosting:
    match: object
    context: object
    demote_boost: float = 0.0


@dataclass
class XFuzzyLikeThis:
    fields: list = dfield(default_factory=list)    # [(field, text)]
    max_num_terms: int = 50
    min_similarity: float = 0.5
    prefix_length: int = 0
    boost: float = 1.0


@dataclass
class XSpan:
    field: str | None
    tree: object          # span node tree (terms possibly unanalyzed)
    boost: float = 1.0


# filters
@dataclass
class XRangeFilter:
    field: str
    lower: str
    upper: str
    include_lower: bool = True
    include_upper: bool = True
    numeric: bool = False


@dataclass
class XTermsFilter:
    field: str | None
    text: str


@dataclass
class XBoolFilter:
    clauses: list = dfield(default_factory=list)   # [(occur, filter)]


# --------------------------------------------------------------------------
# parse
# --------------------------------------------------------------------------

def _fattr(e, name, default):
    v = e.get(name)
    return default if v is None else float(v)


def _iattr(e, name, default):
    v = e.get(name)
    return default if v is None else int(v)


def _battr(e, name, default):
    v = e.get(name)
    return default if v is None else v.lower() == "true"


def _text(e) -> str:
    t = "".join(e.itertext()).strip()
    if not t:
        raise ParserException(f"<{e.tag}> requires non-blank text")
    return t


def _children(e):
    return [c for c in e if isinstance(c.tag, str)]


def _first_child(e):
    kids = _children(e)
    if not kids:
        raise ParserException(f"<{e.tag}> requires a child element")
    return kids[0]


def _child_by_tag(e, tag):
    for c in _children(e):
        if c.tag == tag:
            return c
    raise ParserException(f"<{e.tag}> requires a <{tag}> child")


def parse_xml_query(xml: str):
    """Parse an XML query document to the engine AST."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ParserException(f"Error parsing XML stream: {exc}") from exc
    return _parse_query_elem(root, None)


def _parse_query_elem(e, inh_field):
    field = e.get("fieldName") or inh_field
    boost = _fattr(e, "boost", 1.0)
    tag = e.tag
    if tag == "TermQuery":
        return XTerm(field, _text(e), boost)
    if tag == "TermsQuery":
        return XTerms(field, _text(e), boost,
                      _iattr(e, "minimumNumberShouldMatch", 0))
    if tag == "MatchAllDocsQuery":
        return XMatchAll(boost)
    if tag == "BooleanQuery":
        bq = XBool(boost=boost,
                   min_should_match=_iattr(e, "minimumNumberShouldMatch", 0))
        for c in _children(e):
            if c.tag != "Clause":
                continue
            occ = (c.get("occurs") or "should").lower()
            if occ not in ("must", "mustnot", "should"):
                raise ParserException(
                    f'Invalid value for "occurs" attribute of clause: {occ}')
            bq.clauses.append((occ, _parse_query_elem(_first_child(c), field)))
        return bq
    if tag == "DisjunctionMaxQuery":
        return XDisMax([_parse_query_elem(c, field) for c in _children(e)],
                       tie=_fattr(e, "tieBreaker", 0.0), boost=boost)
    if tag == "UserQuery":
        return XUser(field, _text(e), boost)
    if tag == "ConstantScoreQuery":
        return XConstantScore(_parse_filter_elem(_first_child(e), field),
                              boost)
    if tag == "FilteredQuery":
        q = _parse_query_elem(_first_child(_child_by_tag(e, "Query")), field)
        f = _parse_filter_elem(_first_child(_child_by_tag(e, "Filter")),
                               field)
        return XFiltered(q, f, boost)
    if tag == "BoostingQuery":
        # queries/BoostingQuery.java: <Query> scored normally, docs also
        # matching <ContextQuery> multiplied by boost (typically < 1)
        q = _parse_query_elem(_first_child(_child_by_tag(e, "Query")), field)
        c = _parse_query_elem(
            _first_child(_child_by_tag(e, "ContextQuery")), field)
        return XBoosting(q, c, _fattr(e, "boost", 0.0))
    if tag == "FuzzyLikeThisQuery":
        flt = XFuzzyLikeThis(
            max_num_terms=_iattr(e, "maxNumTerms", 50),
            min_similarity=_fattr(e, "minSimilarity", 0.5),
            prefix_length=_iattr(e, "prefixLength", 0),
            boost=boost)
        for c in _children(e):
            if c.tag == "Field":
                flt.fields.append((c.get("fieldName") or field, _text(c)))
        return flt
    if tag in ("SpanTerm", "SpanOrTerms", "SpanOr", "SpanNear", "SpanFirst",
               "SpanNot", "BoostingTermQuery"):
        return XSpan(field, _parse_span_elem(e, field), boost)
    raise ParserException(f"No QueryObjectBuilder defined for node {tag}")


def _parse_span_elem(e, inh_field):
    """-> span node; ("orterms", text) is resolved by the executor with
    the index analyzer (``SpanOrTermsBuilder.java`` analyzes at build)."""
    field = e.get("fieldName") or inh_field
    tag = e.tag
    if tag in ("SpanTerm", "BoostingTermQuery"):
        # BoostingTermBuilder: PayloadTermQuery(AveragePayloadFunction);
        # without indexed payloads the average is 1.0, i.e. a SpanTerm
        return ("term", _text(e))
    if tag == "SpanOrTerms":
        return ("orterms", _text(e))
    if tag == "SpanOr":
        return ("or", [_parse_span_elem(c, field) for c in _children(e)])
    if tag == "SpanNear":
        slop = e.get("slop")
        if slop is None:
            raise ParserException("SpanNear requires slop attribute")
        return ("near", [_parse_span_elem(c, field) for c in _children(e)],
                int(slop), _battr(e, "inOrder", False))
    if tag == "SpanFirst":
        return ("first", _parse_span_elem(_first_child(e), field),
                _iattr(e, "end", 1))
    if tag == "SpanNot":
        inc = _parse_span_elem(_first_child(_child_by_tag(e, "Include")),
                               field)
        exc = _parse_span_elem(_first_child(_child_by_tag(e, "Exclude")),
                               field)
        return ("not", inc, exc)
    raise ParserException(f"No SpanQueryObjectBuilder defined for node {tag}")


def _parse_filter_elem(e, inh_field):
    field = e.get("fieldName") or inh_field
    tag = e.tag
    if tag == "RangeFilter":
        return XRangeFilter(field, e.get("lowerTerm") or "",
                            e.get("upperTerm") or "",
                            _battr(e, "includeLower", True),
                            _battr(e, "includeUpper", True))
    if tag == "NumericRangeFilter" or tag == "NumericRangeQuery":
        return XRangeFilter(field, e.get("lowerTerm") or "",
                            e.get("upperTerm") or "",
                            _battr(e, "includeLower", True),
                            _battr(e, "includeUpper", True), numeric=True)
    if tag == "TermsFilter":
        return XTermsFilter(field, _text(e))
    if tag == "BooleanFilter":
        bf = XBoolFilter()
        for c in _children(e):
            if c.tag != "Clause":
                continue
            occ = (c.get("occurs") or "should").lower()
            bf.clauses.append((occ,
                               _parse_filter_elem(_first_child(c), field)))
        return bf
    if tag == "CachedFilter":
        # CachedFilterBuilder LRU-caches the wrapped filter's DocIdSet;
        # Spark reuses the physical plan/shuffle instead — delegate
        return _parse_filter_elem(_first_child(e), field)
    raise ParserException(f"No FilterBuilder defined for node {tag}")


# --------------------------------------------------------------------------
# execute
# --------------------------------------------------------------------------

def _docset_from_frame(frame: DataFrame) -> DataFrame:
    return frame.select("seg", "docid").distinct()


def _all_docs(index: InvertedIndex) -> DataFrame:
    return index.docmeta.select("seg", "docid")


def _resolve_orterms(tree, analyzer):
    """SpanOrTerms text -> ("or", [term...]) with the index analyzer."""
    kind = tree[0]
    if kind == "orterms":
        terms = [t.term for t in analyzer(tree[1])]
        return ("or", [("term", t) for t in terms])
    if kind == "term":
        return tree
    if kind == "near":
        return ("near", [_resolve_orterms(c, analyzer) for c in tree[1]],
                tree[2], tree[3])
    if kind == "or":
        return ("or", [_resolve_orterms(c, analyzer) for c in tree[1]])
    if kind == "first":
        return ("first", _resolve_orterms(tree[1], analyzer), tree[2])
    if kind == "not":
        return ("not", _resolve_orterms(tree[1], analyzer),
                _resolve_orterms(tree[2], analyzer))
    raise ParserException(f"unknown span node {kind!r}")


class _Executor:
    def __init__(self, index: InvertedIndex, precision: str,
                 attrs: DataFrame | None, content_field: str | None):
        self.index = index
        self.precision = precision
        self.stype = "double" if precision == "float64" else "float"
        self.attrs = attrs
        self.content_field = content_field
        self._attr_docs = None

    # -- field routing ----------------------------------------------------

    def _check_content(self, field):
        if (field is not None and self.content_field is not None
                and field != self.content_field):
            raise ParserException(
                f"field {field!r} is not the indexed content field "
                f"{self.content_field!r}")

    def _attr_frame(self) -> DataFrame:
        """attrs joined to (seg, docid) through docmeta.key."""
        if self._attr_docs is None:
            if self.attrs is None:
                raise ParserException(
                    "metadata filter requires attrs= DataFrame")
            self._attr_docs = self.index.docmeta.select(
                "seg", "docid", "key").join(self.attrs, "key")
        return self._attr_docs

    # -- scoring frames ---------------------------------------------------

    def frame(self, node) -> DataFrame | None:
        """-> (seg, docid, score) or None for a match-nothing node."""
        b = F.lit(getattr(node, "boost", 1.0)).cast(self.stype)
        if isinstance(node, XTerm):
            self._check_content(node.field)
            scored, _ = S.term_score_frame(
                self.index, [node.term], boost=node.boost,
                precision=self.precision)
            return (scored.groupBy("seg", "docid")
                    .agg(F.sum("score").alias("score")))
        if isinstance(node, XTerms):
            self._check_content(node.field)
            analyzer = get_analyzer(self.index.analyzer)
            terms = [t.term for t in analyzer(node.text)]
            if not terms:
                return None
            scored, _ = S.term_score_frame(
                self.index, terms, boost=node.boost,
                precision=self.precision)
            agg = scored.groupBy("seg", "docid").agg(
                F.sum("score").alias("score"),
                F.countDistinct("term").alias("nmatched"))
            if node.min_should_match > 0:
                agg = agg.where(F.col("nmatched") >= node.min_should_match)
            return agg.select("seg", "docid", "score")
        if isinstance(node, XMatchAll):
            return _all_docs(self.index).withColumn(
                "score", F.lit(node.boost).cast(self.stype))
        if isinstance(node, XBool):
            return self._bool_frame(node)
        if isinstance(node, XDisMax):
            return self._dismax_frame(node)
        if isinstance(node, XUser):
            self._check_content(node.field)
            bq = parse_query(node.text)
            if node.boost != 1.0:
                for cl in bq.must + bq.should:
                    cl.boost *= node.boost
            return bool_score_frame(self.index, bq, self.precision)
        if isinstance(node, XConstantScore):
            docs = self.filter_docs(node.filt)
            return docs.withColumn("score",
                                   F.lit(node.boost).cast(self.stype))
        if isinstance(node, XFiltered):
            f = self.frame(node.query)
            if f is None:
                return None
            docs = self.filter_docs(node.filt)
            out = f.join(docs, ["seg", "docid"], "left_semi")
            if node.boost != 1.0:
                out = out.withColumn("score", (F.col("score") * b)
                                     .cast(self.stype))
            return out
        if isinstance(node, XBoosting):
            f = self.frame(node.match)
            if f is None:
                return None
            ctx = self.frame(node.context)
            if ctx is None:
                return f
            ctx_docs = _docset_from_frame(ctx).withColumn(
                "in_ctx", F.lit(1))
            return (f.join(ctx_docs, ["seg", "docid"], "left")
                    .withColumn(
                        "score",
                        F.when(F.col("in_ctx").isNotNull(),
                               (F.col("score")
                                * F.lit(node.demote_boost).cast(self.stype))
                               .cast(self.stype))
                        .otherwise(F.col("score")))
                    .select("seg", "docid", "score"))
        if isinstance(node, XFuzzyLikeThis):
            return self._fuzzy_like_this_frame(node)
        if isinstance(node, XSpan):
            self._check_content(node.field)
            analyzer = get_analyzer(self.index.analyzer)
            tree = _resolve_orterms(node.tree, analyzer)
            frame = span_score_frame(self.index, tree, self.precision)
            out = frame.select("seg", "docid", "score")
            if node.boost != 1.0:
                out = out.withColumn("score", (F.col("score") * b)
                                     .cast(self.stype))
            return out
        raise ParserException(f"unsupported query node {type(node).__name__}")

    def _bool_frame(self, node: XBool) -> DataFrame | None:
        frames = []
        n_must = 0
        excludes = []
        for occ, child in node.clauses:
            if occ == "mustnot":
                f = self.frame(child)
                if f is not None:
                    excludes.append(_docset_from_frame(f))
                continue
            f = self.frame(child)
            if f is None:
                if occ == "must":
                    return None
                continue
            frames.append(f.withColumn("is_must",
                                       F.lit(1 if occ == "must" else 0)))
            if occ == "must":
                n_must += 1
        if not frames:
            return None
        union = frames[0]
        for f in frames[1:]:
            union = union.unionByName(f)
        agg = union.groupBy("seg", "docid").agg(
            F.sum("score").alias("score"),
            F.sum("is_must").alias("n_must_matched"),
            F.count("*").alias("n_matched"))
        if n_must:
            agg = agg.where(F.col("n_must_matched") == n_must)
        if node.min_should_match:
            agg = agg.where(F.col("n_matched") - F.col("n_must_matched")
                            >= node.min_should_match)
        out = agg.select("seg", "docid", "score")
        for ex in excludes:
            out = out.join(ex, ["seg", "docid"], "left_anti")
        if node.boost != 1.0:
            out = out.withColumn(
                "score",
                (F.col("score") * F.lit(node.boost).cast(self.stype))
                .cast(self.stype))
        return out

    def _dismax_frame(self, node: XDisMax) -> DataFrame | None:
        frames = []
        for child in node.children:
            f = self.frame(child)
            if f is not None:
                frames.append(f)
        if not frames:
            return None
        union = frames[0]
        for f in frames[1:]:
            union = union.unionByName(f)
        tie = F.lit(node.tie).cast(self.stype)
        agg = union.groupBy("seg", "docid").agg(
            (F.max("score")
             + tie * (F.sum("score") - F.max("score"))).cast(self.stype)
            .alias("score"))
        if node.boost != 1.0:
            agg = agg.withColumn(
                "score",
                (F.col("score") * F.lit(node.boost).cast(self.stype))
                .cast(self.stype))
        return agg

    def _fuzzy_like_this_frame(self, node: XFuzzyLikeThis) -> DataFrame | None:
        # FuzzyLikeThisQuery.java flattens the per-field variants into a
        # prioritized disjunction; simplification (documented): each
        # analyzed token fuzzy-expands (maxEdits from minSimilarity as
        # FuzzyQuery.floatToEdits) and the union scores as a disjunction
        analyzer = get_analyzer(self.index.analyzer)
        max_edits = 1 if node.min_similarity >= 0.5 else 2
        frames = []
        cid = 0
        for field, text in node.fields:
            self._check_content(field)
            for tok in analyzer(text):
                clause = FuzzyClause(tok.term, max_edits, node.boost,
                                     max_expansions=node.max_num_terms)
                f = _clause_frame(self.index, clause, cid, self.precision)
                if f is not None:
                    frames.append(f.select("seg", "docid", "score"))
                    cid += 1
        if not frames:
            return None
        union = frames[0]
        for f in frames[1:]:
            union = union.unionByName(f)
        return (union.groupBy("seg", "docid")
                .agg(F.sum("score").cast(self.stype).alias("score")))

    # -- filters ----------------------------------------------------------

    def filter_docs(self, filt) -> DataFrame:
        """-> distinct (seg, docid) matching the filter."""
        if isinstance(filt, XRangeFilter):
            af = self.attrs is not None and filt.field in self.attrs.columns
            if af:
                col = F.col(filt.field)
                if filt.numeric:
                    col = col.cast("double")
                    lo, hi = float(filt.lower), float(filt.upper)
                else:
                    lo, hi = filt.lower, filt.upper
                pred = ((col >= lo if filt.include_lower else col > lo)
                        & (col <= hi if filt.include_upper else col < hi))
                return (self._attr_frame().where(pred)
                        .select("seg", "docid").distinct())
            # indexed content-field term range (TermRangeFilter)
            self._check_content(filt.field)
            t = F.col("term")
            pred = ((t >= filt.lower if filt.include_lower
                     else t > filt.lower)
                    & (t <= filt.upper if filt.include_upper
                       else t < filt.upper))
            return (self.index.postings.where(pred)
                    .select("seg",
                            F.explode("postings.docid").alias("docid"))
                    .distinct())
        if isinstance(filt, XTermsFilter):
            self._check_content(filt.field)
            analyzer = get_analyzer(self.index.analyzer)
            terms = [t.term for t in analyzer(filt.text)]
            if not terms:
                return _all_docs(self.index).limit(0)
            return (self.index.postings
                    .where(F.col("term").isin(terms))
                    .select("seg",
                            F.explode("postings.docid").alias("docid"))
                    .distinct())
        if isinstance(filt, XBoolFilter):
            out = None
            shoulds = []
            for occ, child in filt.clauses:
                docs = self.filter_docs(child)
                if occ == "must":
                    out = docs if out is None else out.join(
                        docs, ["seg", "docid"], "left_semi")
                elif occ == "should":
                    shoulds.append(docs)
            if shoulds:
                su = shoulds[0]
                for s in shoulds[1:]:
                    su = su.unionByName(s)
                su = su.distinct()
                out = su if out is None else out.join(
                    su, ["seg", "docid"], "left_semi")
            if out is None:
                out = _all_docs(self.index)
            for occ, child in filt.clauses:
                if occ == "mustnot":
                    out = out.join(self.filter_docs(child),
                                   ["seg", "docid"], "left_anti")
            return out
        raise ParserException(
            f"unsupported filter node {type(filt).__name__}")


def xml_score_frame(index: InvertedIndex, xml, precision: str = "float32",
                    attrs: DataFrame | None = None,
                    content_field: str | None = None) -> DataFrame | None:
    """Parse (if a string) and score an XML query -> (seg, docid, score)
    frame, or None when it matches nothing."""
    node = parse_xml_query(xml) if isinstance(xml, str) else xml
    return _Executor(index, precision, attrs, content_field).frame(node)


def xml_search(index: InvertedIndex, xml, k: int = 10,
               precision: str = "float32",
               attrs: DataFrame | None = None,
               content_field: str | None = None) -> DataFrame:
    """CoreParser.parse + IndexSearcher.search: top-k (key, score)."""
    stype = "double" if precision == "float64" else "float"
    frame = xml_score_frame(index, xml, precision, attrs, content_field)
    if frame is None:
        return index.docmeta.select(
            "key", F.lit(0.0).cast(stype).alias("score")).limit(0)
    out = frame.join(index.docmeta.select("seg", "docid", "key"),
                     ["seg", "docid"])
    return (out.select("key", F.col("score").cast(stype).alias("score"))
            .orderBy(F.desc("score"), F.asc("key"))
            .limit(k))
