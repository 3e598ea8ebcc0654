"""Sequence packing (operators/packing.py) and the n-gram tokenizer
range variants."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_solr_old_spark.functions.tokenizers2 import (
    edge_ngram_tokenize, ngram_tokenize)
from lucene_solr_old_spark.operators.packing import pack_sequences


def test_ngram_tokenize_range():
    assert [t.term for t in ngram_tokenize("abcd", 1, 2)] == [
        "a", "ab", "b", "bc", "c", "cd", "d"]
    assert [t.pos for t in ngram_tokenize("ab", 1, 2)] == [0, 1, 2]


def test_edge_ngram_tokenize_front_and_back():
    assert [t.term for t in edge_ngram_tokenize("abcd", 1, 3)] == [
        "a", "ab", "abc"]
    assert [t.term for t in edge_ngram_tokenize("abcd", 1, 3, back=True)] \
        == ["d", "cd", "bcd"]
    assert [t.term for t in edge_ngram_tokenize("ab", 1, 5)] == ["a", "ab"]


def _mkdocs(spark, sizes):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_respects_budget(spark):
    docs = _mkdocs(spark, [40, 40, 40, 30, 30, 20])
    packs = pack_sequences(docs, max_tokens=100,
                           num_partitions=1).collect()
    assert sum(p["n_docs"] for p in packs) == 6
    assert all(p["total_tokens"] <= 100 for p in packs)
    assert not any(p["oversize"] for p in packs)
    # greedy on key order: [40,40]+... never exceeds, and utilization is
    # reported through total_tokens
    all_ids = sorted(d for p in packs for d in p["doc_ids"])
    assert all_ids == [str(i) for i in range(6)]


def test_pack_oversize_doc_is_flagged_alone(spark):
    docs = _mkdocs(spark, [10, 500, 10])
    packs = {tuple(p["doc_ids"]): p
             for p in pack_sequences(docs, max_tokens=100,
                                     num_partitions=1).collect()}
    big = [p for p in packs.values() if p["oversize"]]
    assert len(big) == 1 and big[0]["doc_ids"] == ["1"]
    assert big[0]["total_tokens"] == 500


def test_pack_deterministic_across_partitionings(spark):
    docs = _mkdocs(spark, [30, 70, 20, 80, 50, 50, 10])
    a = sorted(tuple(p["doc_ids"]) for p in
               pack_sequences(docs, 100, num_partitions=4).collect())
    b = sorted(tuple(p["doc_ids"]) for p in
               pack_sequences(docs.repartition(3), 100,
                              num_partitions=4).collect())
    assert a == b


def test_pack_single_exchange_plan(spark):
    docs = _mkdocs(spark, [10, 20])
    plan = pack_sequences(docs, 100)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1


# ---- order-stable variant ---------------------------------------------------

def test_stable_pack_layout_independent(spark):
    from lucene_solr_old_spark.operators.packing import pack_sequences_stable

    docs = _mkdocs(spark, [30, 70, 20, 80, 50, 50, 10, 120, 5])
    a = sorted(map(tuple, pack_sequences_stable(docs, 100)
                   .select("seq_id", "n_docs", "total_tokens", "oversize")
                   .collect()))
    b = sorted(map(tuple, pack_sequences_stable(docs.repartition(7), 100)
                   .select("seq_id", "n_docs", "total_tokens", "oversize")
                   .collect()))
    assert a == b and a  # identical INCLUDING seq ids


def test_stable_pack_matches_reference_scan(spark):
    import hashlib

    from lucene_solr_old_spark.operators.packing import pack_sequences_stable

    lens = [10, 90, 40, 70, 200, 1, 1, 130, 60]
    docs = _mkdocs(spark, lens)
    got = {p["seq_id"]: (tuple(p["doc_ids"]), p["total_tokens"],
                         p["oversize"])
           for p in pack_sequences_stable(docs, 100).collect()}

    # driver-side reference: same md5 bucket, key order, greedy rule
    buckets = {}
    for i, n in enumerate(lens):
        k = str(i)
        buckets.setdefault(
            hashlib.md5(k.encode()).hexdigest()[:1], []).append((k, n))
    exp = {}
    for bk, rows in buckets.items():
        seq, cur, keys = -1, 0, []
        for k, n in sorted(rows):
            if seq < 0 or cur + n > 100:
                if keys:
                    exp[f"{bk}-{seq}"] = (tuple(keys), cur, cur > 100)
                seq, cur, keys = seq + 1, 0, []
            keys.append(k)
            cur += n
        if keys:
            exp[f"{bk}-{seq}"] = (tuple(keys), cur, cur > 100)
    assert got == exp


def test_stable_pack_single_exchange_plan(spark):
    from lucene_solr_old_spark.operators.packing import pack_sequences_stable

    docs = _mkdocs(spark, [10, 20])
    plan = pack_sequences_stable(docs, 100)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1


# ---- overlapping passage chunking -------------------------------------------

def test_chunk_documents_overlap(spark):
    from lucene_solr_old_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10)))],
        "doc_id long, text string")
    rows = {r["chunk_id"]: r for r in
            chunk_documents(docs, chunk_tokens=4, overlap=2).collect()}
    # stride 2: chunks at 0,2,4,6 — a chunk at 8 would be {w8,w9}, a
    # strict subset of chunk 3's {w6..w9}, so it is suppressed
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w2 w3 w4 w5"
    assert rows[3]["chunk_text"] == "w6 w7 w8 w9"
    assert rows[3]["n_tokens"] == 4


def test_chunk_documents_no_overlap(spark):
    from lucene_solr_old_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id long, text string")
    rows = sorted((r["chunk_id"], r["chunk_text"]) for r in
                  chunk_documents(docs, chunk_tokens=2).collect())
    assert rows == [(0, "a b"), (1, "c d"), (2, "e")]


def test_chunk_documents_bad_overlap_raises(spark):
    import pytest

    from lucene_solr_old_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_trailing_subset_suppressed(spark):
    """A final partial chunk shorter than overlap adds no new tokens
    (strict subset of the previous chunk) and must be suppressed: 13
    tokens, chunk=16, overlap=4 -> exactly one chunk (round-4 advice)."""
    from lucene_solr_old_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [("d1", " ".join(f"t{i}" for i in range(13))),
         ("d2", " ".join(f"t{i}" for i in range(17))),   # 17 > 16: 2 chunks
         ("d3", " ".join(f"t{i}" for i in range(16)))],  # exactly one
        "doc_id string, text string")
    out = {(r["key"], r["chunk_id"]): r for r in
           chunk_documents(docs, chunk_tokens=16, overlap=4).collect()}
    by_doc = {}
    for (k, c) in out:
        by_doc.setdefault(k, []).append(c)
    assert sorted(by_doc["d1"]) == [0]        # 13 <= 12+4: chunk 1 dropped
    assert sorted(by_doc["d2"]) == [0, 1]     # 17 > 16: chunk 1 adds t16
    assert sorted(by_doc["d3"]) == [0]
    # chunk 1 of d2 still covers [12, 17) with the 4-token overlap
    assert out[("d2", 1)]["n_tokens"] == 5
    assert out[("d2", 1)]["chunk_text"].split() == [
        "t12", "t13", "t14", "t15", "t16"]


def test_stable_pack_streaming_matches_buffered_semantics(spark):
    """The streaming rewrite (sortWithinPartitions + one-pack state) must
    produce the identical content-derived packing under any layout."""
    from lucene_solr_old_spark.operators.packing import pack_sequences_stable

    rows = [(f"doc{i:03d}", " ".join(["w"] * (7 + (i * 13) % 40)))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted(map(tuple, pack_sequences_stable(docs, 64).collect()))
    b = sorted(map(tuple, pack_sequences_stable(
        docs.repartition(7), 64, hex_chars=2).collect()))
    # hex_chars changes seq ids (bucket prefix) but membership/budget hold
    assert sum(p[2] for p in a) == 60 == sum(p[2] for p in b)
    assert all(p[3] <= 64 or p[2] == 1 for p in a)
    ids_a = sorted(d for p in a for d in p[1])
    ids_b = sorted(d for p in b for d in p[1])
    assert ids_a == ids_b == sorted(r[0] for r in rows)
    # same hex_chars + different layout -> bit-identical packs
    c = sorted(map(tuple, pack_sequences_stable(
        docs.repartition(11), 64).collect()))
    assert a == c
