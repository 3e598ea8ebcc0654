"""BPE tokenizer: trainer goldens (Sennrich 2016 worked example), a naive
reference trainer as a differential oracle, the order-apply == min-rank
encoding equivalence, and Spark path parity (catalyst chained-replace vs
the memoized Arrow encoder)."""

import random
from collections import Counter, defaultdict

import pytest

from lucene_solr_old_spark.operators.bpe import (
    EOW, PRETOKEN_RE, _merge_symbols, bpe_encode, bpe_train, encode_word,
    pretokenize, word_counts, wrap_symbols)


# ---------------------------------------------------------------------------
# naive reference trainer: recount every pair each round (Sennrich 2016
# Algorithm 1, executable pseudocode) — the oracle for the incremental one
# ---------------------------------------------------------------------------

def naive_train(wc, num_merges, min_count=2, eow=EOW):
    words = {}
    for w, c in sorted(wc, key=lambda x: (-x[1], x[0])):
        if w:
            words[tuple(list(w) + ([eow] if eow else []))] = \
                words.get(tuple(list(w) + ([eow] if eow else [])), 0) + c
    merges = []
    for _ in range(num_merges):
        pc = defaultdict(int)
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_count:
            break
        merges.append(best)
        words = {tuple(_merge_symbols(list(s), best)): c
                 for s, c in words.items()}
    return merges


def apply_in_order(word, merges, eow=EOW):
    syms = list(word) + ([eow] if eow else [])
    for p in merges:
        syms = _merge_symbols(syms, p)
    return syms


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_worked_example():
    m = bpe_train(SENNRICH, 5, min_count=2)
    # ACL-2016 §3.2 example vocabulary: es, est, est</w> (lo/low follow by
    # the deterministic count-then-lexicographic rule: l·o count 7 > 6)
    assert m[:5] == [("e", "s"), ("es", "t"), ("est", "</w>"),
                     ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(bpe_train(SENNRICH, 10))}
    assert encode_word("lowest", ranks) == ["low", "est</w>"]
    assert encode_word("low", ranks) == ["low</w>"]
    assert encode_word("xyzzy", ranks) == ["x", "y", "z", "z", "y", "</w>"]


def test_incremental_equals_naive_random():
    rng = random.Random(7)
    alpha = "abcde"
    for trial in range(25):
        wc = [("".join(rng.choice(alpha)
                       for _ in range(rng.randint(1, 8))),
               rng.randint(1, 9))
              for _ in range(rng.randint(1, 40))]
        # collapse duplicate words (word_counts would)
        agg = Counter()
        for w, c in wc:
            agg[w] += c
        wc = sorted(agg.items())
        n = rng.randint(1, 30)
        assert bpe_train(wc, n, min_count=1) == naive_train(wc, n,
                                                            min_count=1), \
            f"trial {trial}: {wc}"


def test_min_count_stops():
    wc = [("ab", 1), ("cd", 1)]
    assert bpe_train(wc, 10, min_count=2) == []
    assert len(bpe_train(wc, 10, min_count=1)) > 0


def test_no_eow_mode():
    m = bpe_train(SENNRICH, 3, eow=None)
    assert ("est", "</w>") not in m
    ranks = {p: i for i, p in enumerate(m)}
    assert "".join(encode_word("newest", ranks, eow=None)) == "newest"


def test_order_apply_equals_min_rank():
    rng = random.Random(13)
    alpha = "abc"
    for _ in range(40):
        wc = Counter("".join(rng.choice(alpha)
                             for _ in range(rng.randint(1, 7)))
                     for _ in range(60))
        merges = bpe_train(sorted(wc.items()), rng.randint(1, 25),
                           min_count=1)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in list(wc) + ["aaaa", "abcabc", "c"]:
            assert apply_in_order(w, merges) == encode_word(w, ranks), \
                (w, merges)


def test_merge_symbols_overlap():
    # simultaneous left-to-right: aaa -> (aa)a, aaaa -> (aa)(aa)
    assert _merge_symbols(list("aaa"), ("a", "a")) == ["aa", "a"]
    assert _merge_symbols(list("aaaa"), ("a", "a")) == ["aa", "aa"]


def test_wrap_symbols():
    assert wrap_symbols("ab") == "\x02a\x03\x02b\x03\x02</w>\x03"
    assert wrap_symbols("a", eow=None) == "\x02a\x03"


# ---------------------------------------------------------------------------
# Spark paths
# ---------------------------------------------------------------------------

DOCS = [
    (0, "the lowest lower low"),
    (1, "Newest of the new, wide & widest!"),
    (2, ""),
    (3, None),
    (4, "low low low 42 42 low-est"),
    (5, "sub\x0bword \x02weird\x03 ctrl\u2028chars"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id INT, text STRING")


def test_word_counts_spark(spark, docs_df):
    got = {r["word"]: r["count"] for r in word_counts(docs_df).collect()}
    import re
    cnt = Counter()
    for _, t in DOCS:
        for w in re.findall(PRETOKEN_RE, re.sub(
                "[\x00-\x08\x0b\x0e-\x1f\x7f\u0085\u2028\u2029]", " ",
                (t or "").lower())):
            cnt[w] += 1
    assert got == dict(cnt)
    assert got["low"] == 5 and got["&"] == 1 and got["42"] == 2


def test_pretokenize_order(spark, docs_df):
    rows = {r["doc_id"]: r["words"]
            for r in pretokenize(docs_df).collect()}
    assert rows[1] == ["newest", "of", "the", "new", ",", "wide", "&",
                       "widest", "!"]
    assert rows[2] == [] and rows[3] == []
    # scrubbed code points (\x0b, \x02/\x03, U+2028) act as separators
    assert rows[5] == ["sub", "word", "weird", "ctrl", "chars"]


def test_encode_paths_agree(spark, docs_df):
    wc = word_counts(docs_df)
    merges = bpe_train(wc, 24, min_count=2)
    assert merges, "trainer found no merges on the fixture corpus"
    a = {r["doc_id"]: (r["tokens_str"], r["n_tokens"])
         for r in bpe_encode(docs_df, merges, method="catalyst").collect()}
    b = {r["doc_id"]: (r["tokens_str"], r["n_tokens"])
         for r in bpe_encode(docs_df, merges, method="pandas").collect()}
    assert a == b
    # and both equal the pure-python reference encoding
    ranks = {p: i for i, p in enumerate(merges)}
    import re
    for did, text in DOCS:
        toks = []
        for w in re.findall(PRETOKEN_RE, re.sub(
                "[\x00-\x08\x0b\x0e-\x1f\x7f\u0085\u2028\u2029]", " ",
                (text or "").lower())):
            toks.extend(encode_word(w, ranks))
        assert a[did] == (" ".join(toks), len(toks)), did


def test_encode_empty_merge_table(spark, docs_df):
    out = {r["doc_id"]: r["tokens_str"]
           for r in bpe_encode(docs_df, [], method="catalyst").collect()}
    assert out[0].split(" ")[:4] == ["t", "h", "e", "</w>"]
    assert out[2] == ""


def test_train_from_dataframe_deterministic(spark, docs_df):
    wc = word_counts(docs_df)
    m1 = bpe_train(wc, 12, min_count=2)
    m2 = bpe_train(wc.repartition(7), 12, min_count=2)
    assert m1 == m2


def test_encode_rejects_bad_merge_symbols(spark, docs_df):
    import pytest as _pytest
    for bad in [[("a", "b c")], [("a", "")], [("\x02", "x")]]:
        with _pytest.raises(ValueError):
            bpe_encode(docs_df, bad)


def test_word_counts_plan_map_side_combine(spark, docs_df):
    plan = word_counts(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan  # map-side combine before the shuffle


def test_unicode_whitespace_parity(spark):
    # NBSP / ideographic space: Python \\s (unicode) vs Java/RE2 \\s
    # (ascii) diverge — the scrub must make all three paths agree
    df = spark.createDataFrame(
        [(0, "a\u00a0b c\u3000d e\u0085f gh"),
         (1, "nb\u00a0sp everywhere\u202fhere")],
        "doc_id INT, text STRING")
    merges = [("a", "b"), ("s", "p")]
    a = {r["doc_id"]: (r["tokens_str"], r["n_tokens"])
         for r in bpe_encode(df, merges, method="catalyst").collect()}
    b = {r["doc_id"]: (r["tokens_str"], r["n_tokens"])
         for r in bpe_encode(df, merges, method="pandas").collect()}
    assert a == b
    wc = {r["word"]: r["count"] for r in word_counts(df).collect()}
    assert "a\u00a0b" not in wc and wc["b"] == 1 and wc["nb"] == 1
