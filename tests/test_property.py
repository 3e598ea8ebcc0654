"""Randomized property tests (the reference's LuceneTestCase-style random
testing, SURVEY.md §5) — pure-Python kernels, no Spark session needed."""

from hypothesis import given, settings, strategies as st

from lucene_solr_old_spark.functions.phrasepos import (
    sloppy_phrase_freq, span_near_ordered_matches,
    span_near_unordered_matches)


def _positions(seq, term):
    return [i for i, t in enumerate(seq) if t == term]


words = st.sampled_from(["a", "b", "c", "d"])
docs = st.lists(words, min_size=1, max_size=30)


class TestSloppyKernelProperties:
    @given(doc=docs, slop=st.integers(0, 5))
    @settings(max_examples=200, deadline=None)
    def test_freq_nonnegative_and_bounded(self, doc, slop):
        """0 <= sloppyFreq <= anchor-term occurrence count (each match
        consumes at least one advance of some pp)."""
        q = ["a", "b"]
        pa, pb = _positions(doc, "a"), _positions(doc, "b")
        if not pa or not pb:
            return
        f = sloppy_phrase_freq([pa, pb], [0, 1], slop, term_ids=[0, 1],
                               f32=False)
        assert f >= 0.0
        assert f <= len(pa) + len(pb)  # match count bound

    @given(doc=docs)
    @settings(max_examples=200, deadline=None)
    def test_slop0_distinct_terms_equals_intersection(self, doc):
        """At slop=0 with distinct terms, the pq walk counts EXACTLY the
        aligned positions (|{p : p in A, p+1 in B}|) with factor 1.0 each
        — an independent closed-form oracle for the kernel."""
        pa, pb = _positions(doc, "a"), _positions(doc, "b")
        if not pa or not pb:
            return
        expected = len(set(pa) & {p - 1 for p in pb})
        got = sloppy_phrase_freq([pa, pb], [0, 1], 0, term_ids=[0, 1],
                                 f32=False)
        assert got == float(expected)

    @given(doc=docs, slop=st.integers(0, 4))
    @settings(max_examples=200, deadline=None)
    def test_monotone_in_slop(self, doc, slop):
        """Wider slop never DECREASES the match count (every match at
        slop s is a match at slop s+1; factors only get added)."""
        pa, pb = _positions(doc, "a"), _positions(doc, "b")
        if not pa or not pb:
            return
        f1 = sloppy_phrase_freq([pa, pb], [0, 1], slop, term_ids=[0, 1],
                                f32=False)
        f2 = sloppy_phrase_freq([pa, pb], [0, 1], slop + 1,
                                term_ids=[0, 1], f32=False)
        assert f2 >= f1 - 1e-12


class TestSpanKernelProperties:
    @given(doc=docs, slop=st.integers(0, 4))
    @settings(max_examples=200, deadline=None)
    def test_ordered_matches_are_ordered_and_within_slop(self, doc, slop):
        iva = [(p, p + 1) for p in _positions(doc, "a")]
        ivb = [(p, p + 1) for p in _positions(doc, "b")]
        if not iva or not ivb:
            return
        for s, e, ms in span_near_ordered_matches([iva, ivb], slop):
            assert 0 <= ms <= slop
            assert e - s >= 2  # spans both terms
            # an 'a' starts the span, a 'b' ends it, in order
            assert doc[s] == "a" and doc[e - 1] == "b"
            assert s < e - 1 or doc[s] == doc[e - 1]

    @given(doc=docs, slop=st.integers(0, 4))
    @settings(max_examples=200, deadline=None)
    def test_unordered_window_bound(self, doc, slop):
        """atMatch: window minus total sub-span length <= slop."""
        iva = [(p, p + 1) for p in _positions(doc, "a")]
        ivb = [(p, p + 1) for p in _positions(doc, "b")]
        if not iva or not ivb:
            return
        for s, e in span_near_unordered_matches([iva, ivb], slop):
            assert (e - s) - 2 <= slop

    @given(doc=docs)
    @settings(max_examples=100, deadline=None)
    def test_ordered_subset_of_unordered(self, doc):
        """Every ordered match window also satisfies the unordered bound
        (ordered is strictly more constrained at the same slop)."""
        iva = [(p, p + 1) for p in _positions(doc, "a")]
        ivb = [(p, p + 1) for p in _positions(doc, "b")]
        if not iva or not ivb:
            return
        slop = 3
        ordered = span_near_ordered_matches([iva, ivb], slop)
        for s, e, _ms in ordered:
            assert (e - s) - 2 <= slop


class TestCodecProperties:
    @given(st.lists(st.tuples(st.integers(0, 1 << 20), st.integers(1, 255),
                              st.integers(0, 255)),
                    min_size=1, max_size=400, unique_by=lambda t: t[0]))
    @settings(max_examples=100, deadline=None)
    def test_block_roundtrip_random(self, rows):
        """Random posting lists round-trip through the varbyte blocks."""
        import numpy as np

        from lucene_solr_old_spark.operators.codec import (decode_block,
                                                           encode_blocks)

        rows.sort()
        d = [r[0] for r in rows]
        f = [r[1] for r in rows]
        nb = [r[2] for r in rows]
        blocks = encode_blocks(d, f, nb, None)
        dd, ff, nn = [], [], []
        for blk in blocks:
            bd, bf, bn = decode_block(blk)
            dd.extend(bd.tolist())
            ff.extend(bf.tolist())
            nn.extend(bn.tolist())
            assert blk["first_docid"] == bd[0]
            assert blk["last_docid"] == bd[-1]
            assert blk["max_tf"] == int(np.max(bf))
        assert dd == d and ff == f and nn == nb


class TestFilterProperties:
    @given(st.text(alphabet="aB1-'x.Z ", min_size=1, max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_wdf_parts_preserve_alnum_stream(self, raw):
        """Concatenating WDF parts reproduces the token's alphanumeric
        characters in order (nothing invented, nothing lost — modulo the
        possessive 's rule, disabled here)."""
        from lucene_solr_old_spark.functions.filters import word_delimiter
        from lucene_solr_old_spark.functions.tokenizer import Token

        toks = [Token(w, i, 0, len(w))
                for i, w in enumerate(raw.split()) if w]
        out = word_delimiter(toks, stem_english_possessive=False)
        got = "".join(t.term for t in out)
        expected = "".join(c for w in raw.split() for c in w if c.isalnum())
        assert got == expected

    @given(st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=1,
                    max_size=12))
    @settings(max_examples=100, deadline=None)
    def test_shingle_count(self, terms):
        """Contiguous tokens: bigram shingle count == n-1; positions
        strictly increasing."""
        from lucene_solr_old_spark.functions.filters import shingle
        from lucene_solr_old_spark.functions.tokenizer import Token

        toks = [Token(t, i, i * 3, i * 3 + 2) for i, t in enumerate(terms)]
        out = shingle(toks, output_unigrams=False)
        assert len(out) == max(0, len(terms) - 1)
        assert [t.pos for t in out] == list(range(len(terms) - 1))
