"""Exact positional kernels vs hand-derived expectations.

Expected values are derived BY HAND from the reference algorithm
(``search/SloppyPhraseScorer.java``, ``spans/NearSpansOrdered.java``,
``spans/NearSpansUnordered.java``), including its documented asymmetries
(SloppyPhraseScorer Javadoc :82-99 gives "x a b a y" / "a b c b a" /
"a b c b a f g" as canonical cases) — NOT from running the kernel, so
these fixtures certify reference fidelity rather than self-consistency.
"""

import pytest

from lucene_solr_old_spark.functions.phrasepos import (
    eval_span_tree, sloppy_phrase_freq, span_first, span_near_ordered_matches,
    span_near_unordered_matches, span_not, span_or, span_freq)


def positions(text):
    toks = text.split()
    pos = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    return pos


def phrase(doc, query_terms, slop, f32=True, offsets=None):
    pos = positions(doc)
    if any(t not in pos for t in query_terms):
        return 0.0
    if offsets is None:
        offsets = list(range(len(query_terms)))
    first = {t: query_terms.index(t) for t in set(query_terms)}
    term_ids = [first[t] for t in query_terms]
    return sloppy_phrase_freq([pos[t] for t in query_terms], offsets, slop,
                              term_ids=term_ids, f32=f32)


def intervals(doc):
    return {t: [(p, p + 1) for p in ps] for t, ps in positions(doc).items()}


class TestSloppyPhrase:
    def test_javadoc_x_a_b_a_y(self):
        # "a b"~2 on "x a b a y": "a b" dist 0 (1.0) + "b a" dist 2 (1/3)
        assert phrase("x a b a y", ["a", "b"], 2, f32=False) == \
            pytest.approx(1.0 + 1.0 / 3.0)

    def test_javadoc_asymmetry_abc_vs_cba(self):
        # "a b c b a": "a b c"~4 -> exact(1.0) + two dist-4 (0.2+0.2) = 1.4
        # but "c b a"~4 -> dist-4 (0.2) + exact reversed (1.0) = 1.2
        # (the pq walk does not enumerate all combinations, :93-97)
        assert phrase("a b c b a", ["a", "b", "c"], 4, f32=False) == \
            pytest.approx(1.4)
        assert phrase("a b c b a", ["c", "b", "a"], 4, f32=False) == \
            pytest.approx(1.2)

    def test_javadoc_cb_single_match(self):
        # "a b c b a f g" (:96-98): "c b"~2 COULD be matched twice but the
        # pq walk counts only ONE match — it keeps minimizing matchLength
        # (2 -> 0) instead of scoring the distance-2 combination, ending
        # with the single exact match.  "g f"~2 likewise finds one match
        # (numMatches equal — the Javadoc's sense of "same"), at distance 2.
        assert phrase("a b c b a f g", ["c", "b"], 2, f32=False) == \
            pytest.approx(1.0)
        assert phrase("a b c b a f g", ["g", "f"], 2, f32=False) == \
            pytest.approx(1.0 / 3.0)

    def test_distance_one(self):
        # "a x b", "a b"~1: single match at distance 1 -> 1/2
        assert phrase("a x b", ["a", "b"], 1, f32=False) == pytest.approx(0.5)
        # slop 0 via the sloppy kernel: no match
        assert phrase("a x b", ["a", "b"], 0, f32=False) == 0.0

    def test_repeated_term_exact(self):
        # "a b a"~1 on "a b a": one exact match (repeat groups prevent the
        # two 'a' pps from colliding on the same token)
        assert phrase("a b a", ["a", "b", "a"], 1, f32=False) == \
            pytest.approx(1.0)

    def test_repeated_term_two_matches(self):
        # "a b a"~2 on "a b a b a": exact at 0-2 and 2-4
        assert phrase("a b a b a", ["a", "b", "a"], 2, f32=False) == \
            pytest.approx(2.0)

    def test_repeated_term_no_double_count_single_occurrence(self):
        # "a a"~2 on "x a y": the second 'a' pp exhausts during repeat-group
        # advance -> no match at all
        assert phrase("x a y", ["a", "a"], 2, f32=False) == 0.0
        # "a a"~0 on "a a": one exact match
        assert phrase("a a", ["a", "a"], 0, f32=False) == pytest.approx(1.0)

    def test_query_position_holes(self):
        # analyzed "a <stop> b" -> offsets [0, 2]: doc "a x b" is now the
        # EXACT alignment (distance 0), adjacent "a b" is distance... the
        # hole shifts pp space by the analyzed position, like PhraseQuery
        # .add(term, position) with position increments
        assert phrase("a x b", ["a", "b"], 0, f32=False,
                      offsets=[0, 2]) == pytest.approx(1.0)
        assert phrase("a b q", ["a", "b"], 1, f32=False,
                      offsets=[0, 2]) == pytest.approx(0.5)

    def test_f32_accumulation_matches_f64_closely(self):
        v32 = phrase("x a b a y", ["a", "b"], 2, f32=True)
        v64 = phrase("x a b a y", ["a", "b"], 2, f32=False)
        assert v32 == pytest.approx(v64, rel=1e-6)


class TestNearSpansOrdered:
    def test_two_matches_with_overlap(self):
        # NearSpansOrdered Javadoc (:46-54): "t1 t2 t3"~1 on
        # "t1 t2 t1 t3 t2 t3" matches twice
        iv = intervals("t1 t2 t1 t3 t2 t3")
        got = span_near_ordered_matches(
            [iv["t1"], iv["t2"], iv["t3"]], 1)
        assert [(s, e) for s, e, _ in got] == [(0, 4), (2, 6)]

    def test_strict_order_required(self):
        iv = intervals("b x a")
        assert span_near_ordered_matches([iv["a"], iv["b"]], 5) == []

    def test_slop_is_gap_sum(self):
        # "a x x b": gap of 2 between a-end and b-start
        iv = intervals("a x x b")
        got = span_near_ordered_matches([iv["a"], iv["b"]], 2)
        assert got == [(0, 4, 2)]
        assert span_near_ordered_matches([iv["a"], iv["b"]], 1) == []

    def test_greedy_min_slop_per_anchor(self):
        # "a a b": shrink picks the closest 'a' before b -> slop 0
        iv = intervals("a a b")
        got = span_near_ordered_matches([iv["a"], iv["b"]], 0)
        assert got == [(1, 3, 0)]


class TestNearSpansUnordered:
    def test_order_free_match(self):
        iv = intervals("b x a")
        got = span_near_unordered_matches([iv["a"], iv["b"]], 2)
        # window b..a: max.end - min.start - totalLen = 3 - 0 - 2 = 1 <= 2
        assert got == [(0, 3)]

    def test_overlapping_same_position_quirk(self):
        # known reference behavior: "a a"~0 matches a SINGLE 'a' (both
        # cells sit on the same token; 1 - 0 - 2 = -1 <= 0)
        iv = intervals("x a y")
        got = span_near_unordered_matches([iv["a"], iv["a"]], 0)
        assert got == [(1, 2)]

    def test_min_windows_enumerated(self):
        iv = intervals("a x b x a")
        got = span_near_unordered_matches([iv["a"], iv["b"]], 1)
        assert got == [(0, 3), (2, 5)]


class TestSpanAlgebra:
    def test_span_or_merges_sorted(self):
        iv = intervals("a b c a")
        assert span_or([iv["a"], iv["c"]]) == [(0, 1), (2, 3), (3, 4)]

    def test_span_not_removes_overlaps(self):
        inc = [(0, 2), (4, 6)]
        exc = [(1, 2)]
        assert span_not(inc, exc) == [(4, 6)]

    def test_span_first(self):
        assert span_first([(0, 1), (3, 4)], 2) == [(0, 1)]

    def test_tree_near_of_or(self):
        # near(or(a,b), c, slop=0, ordered) on "a c b c"
        iv = intervals("a c b c")
        tree = ("near", [("or", [("term", "a"), ("term", "b")]),
                         ("term", "c")], 0, True)
        got = eval_span_tree(tree, iv)
        assert got == [(0, 2), (2, 4)]

    def test_tree_not_inside_near(self):
        # spans of a NOT overlapping x, then near with b
        iv = intervals("a b x a b")
        tree = ("near", [("not", ("term", "a"), ("term", "x")),
                         ("term", "b")], 0, True)
        got = eval_span_tree(tree, iv)
        assert got == [(0, 2), (3, 5)]

    def test_span_freq_slop_factor(self):
        # freq = sum 1/(width+1)
        assert span_freq([(0, 2), (2, 6)], f32=False) == \
            pytest.approx(1.0 / 3.0 + 1.0 / 5.0)


def test_span_position_range():
    from lucene_solr_old_spark.functions.phrasepos import (
        eval_span_tree, span_position_range)

    spans = [(0, 1), (3, 4), (7, 8)]
    assert span_position_range(spans, 2, 5) == [(3, 4)]
    iv = intervals("aa bb aa cc aa")
    # near(aa, cc) restricted to positions [2, 5]
    tree = ("posrange", ("near", [("term", "aa"), ("term", "cc")], 0, True),
            2, 4)
    assert eval_span_tree(tree, iv) == [(2, 4)]
