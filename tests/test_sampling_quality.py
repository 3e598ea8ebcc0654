"""Deterministic hash sampling/mixing/splitting (operators/sampling.py)
and retrieval-quality metrics (operators/quality.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.quality import eval_ranking
from lucene_solr_old_spark.operators.sampling import (
    hash_sample, hash_split, hash_threshold, mix_sources)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(2000)],
        "doc_id long, source string").persist()


def test_hash_threshold_bounds():
    assert hash_threshold(0.0) == "0" * 32
    assert hash_threshold(1.0) == "g"          # above every hex digest
    t = hash_threshold(0.5)
    assert len(t) == 32 and t.startswith("8")


def test_hash_sample_rate_and_determinism(spark, docs):
    kept1 = {r["doc_id"] for r in hash_sample(docs, 0.3, seed="a").collect()}
    kept2 = {r["doc_id"] for r in
             hash_sample(docs.repartition(7), 0.3, seed="a").collect()}
    assert kept1 == kept2                      # partitioning-independent
    assert 0.25 < len(kept1) / 2000 < 0.35
    # a different seed draws an (essentially) independent sample
    kept3 = {r["doc_id"] for r in hash_sample(docs, 0.3, seed="b").collect()}
    assert kept3 != kept1


def test_hash_sample_is_nested(spark, docs):
    # threshold semantics: the 10% sample is a SUBSET of the 30% sample
    # (same seed) — the property that lets pipelines downsample later
    # without re-reading the corpus
    small = {r["doc_id"] for r in hash_sample(docs, 0.1, seed="a").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.3, seed="a").collect()}
    assert small <= big


def test_mix_sources_rates_and_drop(spark, docs):
    out = mix_sources(docs, {"src0": 1.0, "src1": 0.5}, seed="m")
    counts = {r["source"]: r["cnt"] for r in
              out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"src0", "src1"}     # src2/src3 dropped
    assert counts["src0"] == 500               # rate 1.0 keeps all
    assert 0.4 * 500 < counts["src1"] < 0.6 * 500


def test_hash_split_disjoint_exhaustive(spark, docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                     seed="s")
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 2000        # exhaustive
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert 0.7 < counts["train"] / 2000 < 0.9
    # disjoint by construction (one row -> one split value); stable rerun
    again = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                       seed="s")
    assert out.exceptAll(again).count() == 0


def test_sampling_has_no_shuffle(spark, docs):
    plan = hash_sample(docs, 0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------------ quality

def test_eval_ranking_hand_computed(spark):
    # one query, k=3: ranks 1..3 with rel 1,0,2; one judged doc unranked
    results = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "qid long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(0, 10, 1), (0, 12, 2), (0, 99, 1)], "qid long, doc_id long, rel long")
    row = eval_ranking(results, qrels, k=3).collect()[0]
    assert row["n_rel"] == 3
    assert row["p_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["recall_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    # AP = (1/1 + 2/3) / 3
    assert row["ap"] == pytest.approx((1.0 + 2 / 3) / 3, abs=1e-6)
    assert row["rr"] == 1.0
    dcg = (2 ** 1 - 1) / math.log2(2) + (2 ** 2 - 1) / math.log2(4)
    idcg = (2 ** 2 - 1) / math.log2(2) + (2 ** 1 - 1) / math.log2(3) \
        + (2 ** 1 - 1) / math.log2(4)
    assert row["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_eval_ranking_perfect_and_zero(spark):
    results = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (1, 1, 1)],
        "qid long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1)], "qid long, doc_id long, rel long")
    rows = {r["qid"]: r for r in eval_ranking(results, qrels, k=2).collect()}
    assert rows[0]["ap"] == 1.0 and rows[0]["ndcg_at_k"] == 1.0
    assert rows[0]["recall_at_k"] == 1.0
    # qid 1 has no judgments: all zeros, n_rel 0 (caller filters for MAP)
    assert rows[1]["n_rel"] == 0 and rows[1]["ap"] == 0.0
    assert rows[1]["rr"] == 0.0


def test_eval_ranking_cutoff(spark):
    # the relevant doc sits past k -> contributes nothing at k=1
    results = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "qid long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(0, 2, 1)], "qid long, doc_id long, rel long")
    row = eval_ranking(results, qrels, k=1).collect()[0]
    assert row["p_at_k"] == 0.0 and row["rr"] == 0.0
    assert row["n_rel"] == 1
