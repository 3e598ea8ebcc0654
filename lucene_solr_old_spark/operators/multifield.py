"""Multi-field indexing + fielded queries.

Lucene documents carry many indexed fields, each with its own analyzer,
postings, norms and collection stats (``document/Document.java``,
``index/FieldInfos.java``); queries address fields as ``field:term`` with
per-field idf/avgdl (the classic QueryParser's fielded-term syntax,
``queryparser/classic/QueryParserBase.java``).

Spark shape: one InvertedIndex per field over the same key space (per-field
stats fall out for free — each field's segstats is its own), wrapped by
MultiFieldIndex; a fielded disjunction is the float sum of per-field BM25
frames grouped by doc key.  Cross-field scoring matches Lucene: each
(field, term) clause scores against ITS field's stats.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from .indexer import InvertedIndex, build_index
from .search import term_score_frame
from ..functions.tokenizer import get_analyzer

__all__ = ["MultiFieldIndex", "build_multifield_index", "search_fielded",
           "search_edismax", "masked_span_query",
           "calculate_min_should_match"]


def calculate_min_should_match(optional_clause_count: int,
                               spec: str) -> int:
    """Solr's minimum-should-match SPEC calculator
    (``solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java:551``,
    ``calculateMinShouldMatch``): plain int, negative int (n - x),
    percentage with truncation toward zero, negative percentage, and
    space-separated conditionals ``upper<value`` evaluated left to
    right (the FIRST condition with n <= upper returns the running
    result; later conditions recompute it).

    One documented deviation: conditionals split on ANY whitespace.
    The reference splits on a single space (``spacePattern``), which
    makes its own test fixtures (" 3 < -25% \\n 10 < -3 ") throw
    NumberFormatException on the stray "\\n" token — verified against
    the compiled reference method; every fixture value in
    SolrPluginUtilsTest.testMinShouldMatchCalculator holds under the
    any-whitespace split."""
    result = optional_clause_count
    spec = spec.strip()
    if "<" in spec:
        spec = re.sub(r"(\s+<\s*)|(\s*<\s+)", "<", spec)
        for s in spec.split():
            parts = s.split("<")
            upper = int(parts[0])
            if optional_clause_count <= upper:
                return result
            result = calculate_min_should_match(optional_clause_count,
                                                parts[1])
        return result
    if "%" in spec:
        percent = int(spec[:spec.index("%")])
        calc = result * percent / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    if optional_clause_count < result:
        return optional_clause_count
    return result if result >= 0 else 0


class MultiFieldIndex:
    def __init__(self, indexes: dict[str, InvertedIndex],
                 default_field: str):
        if default_field not in indexes:
            raise ValueError(f"default field {default_field!r} not indexed")
        self.indexes = indexes
        self.default_field = default_field

    def field(self, name: str) -> InvertedIndex:
        return self.indexes[name]


def build_multifield_index(
    docs: DataFrame,
    key_col: str,
    fields: dict[str, str],          # field name -> text column
    default_field: str,
    num_segments: int = 8,
    analyzers: dict[str, str] | None = None,
) -> MultiFieldIndex:
    analyzers = analyzers or {}
    indexes = {}
    for fname, col in fields.items():
        indexes[fname] = build_index(
            docs, key_col=key_col, text_col=col,
            num_segments=num_segments,
            analyzer=analyzers.get(fname, "english"))
    return MultiFieldIndex(indexes, default_field)


_FIELDED = re.compile(r"(?:([A-Za-z_][A-Za-z0-9_]*):)?(\S+)")


def parse_fielded(query: str, default_field: str) -> list[tuple[str, str]]:
    """'title:foo bar' -> [(title, foo), (default, bar)]."""
    out = []
    for m in _FIELDED.finditer(query):
        out.append((m.group(1) or default_field, m.group(2)))
    return out


def search_fielded(mfi: MultiFieldIndex, query: str, k: int = 10,
                   precision: str = "float32") -> DataFrame:
    """Cross-field disjunction: per-(field, term) BM25 against that field's
    stats, float-summed per doc key; top-k (key, score)."""
    clauses = parse_fielded(query, mfi.default_field)
    by_field: dict[str, list[str]] = {}
    for fname, raw in clauses:
        idx = mfi.indexes.get(fname)
        if idx is None:
            continue
        for t in get_analyzer(idx.analyzer)(raw):
            by_field.setdefault(fname, []).append(t.term)

    frames = []
    for fname, terms in by_field.items():
        idx = mfi.indexes[fname]
        scored, _ = term_score_frame(idx, terms, precision=precision)
        per_doc = scored.groupBy("seg", "docid").agg(
            F.sum("score").alias("score"))
        keyed = (per_doc.join(idx.docmeta.select("seg", "docid", "key"),
                              ["seg", "docid"])
                 .select("key", "score"))
        frames.append(keyed)
    if not frames:
        any_idx = mfi.indexes[mfi.default_field]
        return any_idx.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    stype = "double" if precision == "float64" else "float"
    return (union.groupBy("key")
            .agg(F.sum("score").cast(stype).alias("score"))
            .orderBy(F.desc("score"), F.asc("key"))
            .limit(k))


def search_edismax(mfi: MultiFieldIndex, query_text: str,
                   qf: dict[str, float], tie: float = 0.0,
                   mm: int | str = 0, k: int = 10,
                   precision: str = "float32",
                   pf: dict[str, float] | None = None) -> DataFrame:
    """ExtendedDisMax (``solr/core/src/java/org/apache/solr/search/
    ExtendedDismaxQParser.java``): each whitespace word of the user query
    becomes a DisjunctionMaxQuery across the ``qf`` fields (per-field
    analysis, per-field stats, per-field boost), clause score =
    max_field + tie * (sum - max); the clause dismaxes are summed, and
    ``mm`` (minimum-should-match) requires that many clauses to hit —
    an int, or a Solr mm SPEC string ("75%", "-2", "3<-25% 10<-3")
    resolved with :func:`calculate_min_should_match` against the number
    of analyzed clauses.  ``pf`` (phrase fields, {field: boost}) adds
    the whole analyzed query as a phrase boost per field: documents
    already matching the main query gain the phrase score (the edismax
    ``pf`` re-ranking — ``ExtendedDismaxQParser.getPhraseQuery``).

    Plan: per (clause, field) score frames keyed by doc key, ONE union ->
    groupBy(key, clause) computes the dismax -> groupBy(key) sums + counts
    matched clauses; pf adds a LEFT-joined phrase frame (main-query
    matches keep their score when the phrase is absent).  Cross-field
    alignment happens on the shared doc key (fields are sibling indexes
    over the same corpus).
    """
    stype = "double" if precision == "float64" else "float"
    words = [w for w in query_text.split() if w]
    frames = []
    built_clauses: set[int] = set()
    for ci, word in enumerate(words):
        for fname, boost in qf.items():
            idx = mfi.indexes.get(fname)
            if idx is None:
                continue
            terms = [t.term for t in get_analyzer(idx.analyzer)(word)]
            if not terms:
                continue
            built_clauses.add(ci)
            scored, _ = term_score_frame(idx, terms, boost=boost,
                                         precision=precision)
            per_doc = scored.groupBy("seg", "docid").agg(
                F.sum("score").alias("fscore"))
            keyed = (per_doc.join(idx.docmeta.select("seg", "docid", "key"),
                                  ["seg", "docid"])
                     .select("key", F.lit(ci).alias("clause"), "fscore"))
            frames.append(keyed)
    if not frames:
        any_idx = mfi.indexes[mfi.default_field]
        return any_idx.docmeta.select(
            "key", F.lit(0.0).cast("float").alias("score")).limit(0)
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    per_clause = union.groupBy("key", "clause").agg(
        (F.max("fscore")
         + F.lit(tie).cast(stype) * (F.sum("fscore") - F.max("fscore")))
        .alias("cscore"))
    agg = per_clause.groupBy("key").agg(
        F.sum("cscore").cast(stype).alias("score"),
        F.count("*").alias("nmatched"))
    # mm SPEC strings resolve against the number of OPTIONAL CLAUSES the
    # parser actually built, not the raw whitespace word count — a word
    # whose per-field analysis yields no terms (e.g. a stopword under an
    # 'english'-analyzed field) produces no clause in Solr's edismax and
    # must not count toward minimum-should-match
    # (``ExtendedDismaxQParser.java`` applies mm via
    # ``SolrPluginUtils.setMinShouldMatch`` to the built BooleanQuery).
    msm = (calculate_min_should_match(len(built_clauses), mm)
           if isinstance(mm, str) else mm)
    if msm > 0:
        agg = agg.where(F.col("nmatched") >= msm)
    if pf:
        from . import search as _S
        for fname, boost in pf.items():
            idx = mfi.indexes.get(fname)
            if idx is None:
                continue
            pterms = [t.term for t in get_analyzer(idx.analyzer)(query_text)]
            if len(pterms) < 2:
                continue
            pframe = (_S.phrase_score_frame(idx, pterms, precision, boost)
                      .join(idx.docmeta.select("seg", "docid", "key"),
                            ["seg", "docid"])
                      .groupBy("key")
                      .agg(F.sum("score").alias("pscore")))
            agg = (agg.join(pframe, "key", "left")
                   .withColumn("score",
                               (F.col("score")
                                + F.coalesce(F.col("pscore"),
                                             F.lit(0.0))).cast(stype))
                   .drop("pscore"))
    return (agg.select("key", "score")
            .orderBy(F.desc("score"), F.asc("key"))
            .limit(k))


# ---------------------------------------------------------------------------
# FieldMaskingSpanQuery
# ---------------------------------------------------------------------------

_MASK_SEP = "\x1f"


def _retag(node, field: str):
    """Resolve ("mask", child, real_field) nodes by tagging every leaf term
    with the field whose postings evaluate it; mask nodes disappear (they
    only change field attribution — ``spans/FieldMaskingSpanQuery.java``:
    the wrapped spans enumerate the REAL field, the query reports the
    masked field)."""
    kind = node[0]
    if kind == "mask":
        return _retag(node[1], node[2])
    if kind == "term":
        return ("term", f"{field}{_MASK_SEP}{node[1]}")
    if kind in ("near",):
        return ("near", [_retag(c, field) for c in node[1]],
                node[2], node[3])
    if kind == "or":
        return ("or", [_retag(c, field) for c in node[1]])
    if kind == "not":
        return ("not", _retag(node[1], field), _retag(node[2], field))
    if kind in ("first", "posrange"):
        return (kind, _retag(node[1], field), *node[2:])
    raise ValueError(f"unknown span node {kind!r}")


def masked_span_query(mfi: MultiFieldIndex, tree, k: int = 10,
                      precision: str = "float32") -> DataFrame:
    """Span tree with ("mask", child, real_field) nodes — the
    FieldMaskingSpanQuery composition: spans from different same-analyzer
    fields participate in ONE near/or/not tree, correct only when the
    fields carry parallel positions (the reference's documented contract).

    Scoring follows the Javadoc note: Similarity + collection statistics
    (avgdl, norm cache) come from the MASKED field (= default field); each
    leaf's term statistics (df for idf) come from its REAL field.

    Plan: per-field postings pruned to that field's leaf terms (parquet
    pushdown) -> join each field's docmeta for the shared key -> union ->
    per-key (term, positions) collection -> the exact NearSpans kernels
    (functions/phrasepos.py) over field-tagged terms -> BM25 ->
    TakeOrderedAndProject."""
    import numpy as np

    from .search import _Scorer, idf64
    from .spans import _required_terms, _span_tree_udf, _tree_terms

    tagged = _retag(tree, mfi.default_field)
    by_field: dict[str, set] = {}
    for tt in set(_tree_terms(tagged)):
        fld, t = tt.split(_MASK_SEP, 1)
        by_field.setdefault(fld, set()).add(t)

    frames = []
    for fld, terms in sorted(by_field.items()):
        idx = mfi.field(fld)
        if not idx.with_positions:
            raise ValueError(f"field {fld!r} indexed without positions")
        rows = (idx.postings.where(F.col("term").isin(sorted(terms)))
                .select("seg", "term", F.explode("postings").alias("p"))
                .select("seg",
                        F.concat(F.lit(fld + _MASK_SEP),
                                 F.col("term")).alias("term"),
                        F.col("p.docid").alias("docid"),
                        F.col("p.positions").alias("pos"))
                .join(idx.docmeta.select("seg", "docid", "key"),
                      ["seg", "docid"])
                .select("key", "term", "pos"))
        frames.append(rows)
    rows = frames[0]
    for f in frames[1:]:
        rows = rows.unionByName(f)

    req = sorted(_required_terms(tagged))
    per_key = rows.groupBy("key").agg(
        F.sum(F.when(F.col("term").isin(req), 1).otherwise(0)).alias("nreq"),
        F.collect_list(F.struct("term", "pos")).alias("termpos"))
    if req:
        per_key = per_key.where(F.col("nreq") == len(req))

    # norms of the masked field; term stats of each leaf's real field
    masked_idx = mfi.field(mfi.default_field)
    scorer = _Scorer(masked_idx, [], precision)
    if precision == "float64":
        w = 0.0
        for tt in sorted(set(_tree_terms(tagged))):
            fld, t = tt.split(_MASK_SEP, 1)
            df = mfi.field(fld).term_stats([t]).get(t, (0, 0))[0]
            w += idf64(df, scorer.stats.max_doc)
        weight_value = w * (float(scorer.stats.k1) + 1.0)
    else:
        acc = np.float32(0.0)
        for tt in sorted(set(_tree_terms(tagged))):
            fld, t = tt.split(_MASK_SEP, 1)
            df = mfi.field(fld).term_stats([t]).get(t, (0, 0))[0]
            acc = acc + scorer.stats.idf(df)
        weight_value = float(acc * (scorer.stats.k1 + np.float32(1.0)))
    stype = "double" if precision == "float64" else "float"

    scored = (per_key
              .join(masked_idx.docmeta.select("key", "norm"), "key")
              .withColumn("sfreq", _span_tree_udf(
                  tagged, f32=(precision != "float64"))(F.col("termpos")))
              .where(F.col("sfreq") > 0)
              .withColumn(
                  "score",
                  (F.lit(weight_value).cast(stype)
                   * F.col("sfreq").cast(stype))
                  / (F.col("sfreq").cast(stype) + scorer.norm_factor())))
    return (scored.select("key", F.col("score").cast(stype).alias("score"))
            .orderBy(F.desc("score"), F.asc("key"))
            .limit(k))
