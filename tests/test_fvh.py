"""FastVectorHighlighter analogue (highlight.fvh_highlight).

Reference: lucene/highlighter/src/java/org/apache/lucene/search/
vectorhighlight/ — FieldPhraseList (phrase-aware matching),
SimpleFragListBuilder (greedy fragment windows), ScoreOrderFragmentsBuilder
(fragments ordered by total phrase weight)."""

from __future__ import annotations

from lucene_solr_old_spark.operators.highlight import (_phrase_matches,
                                                       fvh_highlight)
from lucene_solr_old_spark.functions.tokenizer import get_analyzer


def _rows(df):
    return sorted(
        ((r["key"], r["frag_rank"], r["score"], r["snippet"])
         for r in df.collect()))


def test_phrase_matches_only_consecutive():
    toks = get_analyzer("ws_stop")("quick fox jumps quick brown fox")
    # phrase "quick fox": positions (0,1) match; (3,?) needs fox at 4 -> no
    spans = _phrase_matches(toks, [["quick", "fox"]])
    assert len(spans) == 1
    s, e, n = spans[0]
    assert (s, e, n) == (0, len("quick fox"), 2)


def test_phrase_aware_vs_classic(spark):
    # the classic per-term highlighter would light up doc "b"; FVH must not:
    # its terms never occur as the consecutive phrase
    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps"),
         ("b", "quick thinking saved the fox")],
        "key STRING, text STRING")
    out = _rows(fvh_highlight(df, ["quick brown"], analyzer="ws_stop",
                              frag_size=50))
    assert [r[0] for r in out] == ["a"]
    assert "<b>quick brown</b>" in out[0][3]


def test_multiple_fragments_score_ordered(spark):
    # two match clusters far apart; the denser cluster must rank first
    text = ("alpha beta " + "filler " * 30
            + "alpha beta alpha beta")
    df = spark.createDataFrame([("d", text)], "key STRING, text STRING")
    out = fvh_highlight(df, ["alpha beta"], analyzer="ws_stop", frag_size=60,
                        max_frags=2).collect()
    assert len(out) == 2
    r0 = [r for r in out if r["frag_rank"] == 0][0]
    r1 = [r for r in out if r["frag_rank"] == 1][0]
    assert r0["score"] == 4.0 and r1["score"] == 2.0   # 2 phrases vs 1
    assert r0["snippet"].count("<b>alpha beta</b>") == 2
    assert r1["snippet"].count("<b>alpha beta</b>") == 1


def test_single_term_and_no_match(spark):
    df = spark.createDataFrame(
        [("a", "left gamma right"), ("b", "nothing here")],
        "key STRING, text STRING")
    out = _rows(fvh_highlight(df, ["gamma"], analyzer="ws_stop"))
    assert [r[0] for r in out] == ["a"]
    assert "<b>gamma</b>" in out[0][3]


def test_stemmed_phrase_original_casing(spark):
    # english chain: query "running fox" highlights "Running Foxes"
    df = spark.createDataFrame(
        [("a", "The Running Foxes escaped.")], "key STRING, text STRING")
    out = _rows(fvh_highlight(df, ["running foxes"], analyzer="english",
                              frag_size=80))
    assert "<b>Running Foxes</b>" in out[0][3]
