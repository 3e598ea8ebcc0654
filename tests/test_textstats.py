"""repetition_stats (Gopher-style repetition signals) unit fixtures; the
full-corpus equivalence is driver-certified by the repetition_stats gate."""

from __future__ import annotations

from lucene_solr_old_spark.operators.textstats import repetition_stats


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"),            # dup 1-2/3; bigrams {a a, a b} top 1/2
         (2, "x y x y x y"),      # dup 1-2/6; bigrams x y:3, y x:2 -> 3/5
         (3, "solo"),             # no bigrams
         (4, "")],                # empty
        "doc_id LONG, text STRING")
    got = {r.doc_id: (r.dup_word_frac, r.top_bigram_frac)
           for r in repetition_stats(df).collect()}
    assert got[1] == (round(1 - 2 / 3, 6), 0.5)
    assert got[2] == (round(1 - 2 / 6, 6), 0.6)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)
