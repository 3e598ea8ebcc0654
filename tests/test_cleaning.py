"""Corpus-cleaning operators (operators/cleaning.py): PII scrub, C4 line
filter, global line dedup, Gopher quality rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.cleaning import (
    c4_line_filter, gopher_quality_filter, line_dedup, pii_scrub)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


# ---------------------------------------------------------------- pii_scrub

def test_pii_scrub_all_three_categories(spark):
    docs = spark.createDataFrame(
        [(0, "mail bob.smith+x@sub.example.co.uk then 192.168.0.255 then "
             "+1 415 555 0100 done"),
         (1, "clean text only")],
        "doc_id long, text string")
    out = _rows(pii_scrub(docs))
    assert out[0]["text_clean"] == \
        "mail <EMAIL> then <IP> then <PHONE> done"
    assert (out[0]["n_email"], out[0]["n_ip"], out[0]["n_phone"]) == (1, 1, 1)
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (0, 0, 0)
    assert out[1]["text_clean"] == "clean text only"


def test_pii_scrub_staged_no_double_count(spark):
    # the host part of user@10.0.0.1 has no alphabetic TLD, so the e-mail
    # pattern skips it and the IP stage catches the address; the digits of
    # an already-redacted IP must not re-match as a phone number
    docs = spark.createDataFrame(
        [(0, "ssh user@10.0.0.1 now")], "doc_id long, text string")
    row = _rows(pii_scrub(docs))[0]
    assert row["text_clean"] == "ssh user@<IP> now"
    assert (row["n_email"], row["n_ip"], row["n_phone"]) == (0, 1, 0)


def test_pii_scrub_multiple_matches_counted(spark):
    docs = spark.createDataFrame(
        [(0, "a@b.com c@d.org 1.2.3.4 5.6.7.8 +44 20 7946 0958")],
        "doc_id long, text string")
    row = _rows(pii_scrub(docs))[0]
    assert (row["n_email"], row["n_ip"], row["n_phone"]) == (2, 2, 1)
    assert row["text_clean"] == "<EMAIL> <EMAIL> <IP> <IP> <PHONE>"


# ------------------------------------------------------------ c4_line_filter

_C4_PAGE = "\n".join([
    "This is a fine sentence.",            # kept
    "too short.",                          # < 3 words
    "no terminal punctuation here",        # no [.!?]$
    "Enable JavaScript to continue.",      # javascript
    "Another perfectly good line!",        # kept
    "Is this a question?",                 # kept
])


def test_c4_line_rules(spark):
    docs = spark.createDataFrame([(0, _C4_PAGE)], "doc_id long, text string")
    row = _rows(c4_line_filter(docs, min_lines=3))[0]
    assert row["text_clean"].split("\n") == [
        "This is a fine sentence.", "Another perfectly good line!",
        "Is this a question?"]
    assert row["n_lines_kept"] == 3
    assert row["page_keep"] is True


@pytest.mark.parametrize("bad,expect", [
    ("lorem ipsum dolor sit amet.", False),
    ("code { block } here.", False),
    ("An ordinary extra line.", True),
])
def test_c4_page_rules(spark, bad, expect):
    docs = spark.createDataFrame(
        [(0, _C4_PAGE + "\n" + bad)], "doc_id long, text string")
    assert _rows(c4_line_filter(docs, min_lines=3))[0]["page_keep"] is expect


def test_c4_min_lines(spark):
    docs = spark.createDataFrame([(0, _C4_PAGE)], "doc_id long, text string")
    assert _rows(c4_line_filter(docs, min_lines=4))[0]["page_keep"] is False


# --------------------------------------------------------------- line_dedup

def test_line_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [(0, "alpha\nSubscribe now\nbeta"),
         (1, "Subscribe now\ngamma\nSubscribe now"),
         (2, "delta\nSubscribe now")],
        "doc_id long, text string")
    out = _rows(line_dedup(docs))
    assert out[0]["text_dedup"] == "alpha\nSubscribe now\nbeta"
    assert (out[0]["n_kept"], out[0]["n_dropped"]) == (3, 0)
    # doc 1 loses BOTH copies (first occurrence lives in doc 0)
    assert out[1]["text_dedup"] == "gamma"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (1, 2)
    assert out[2]["text_dedup"] == "delta"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 1)


def test_line_dedup_within_doc_duplicates(spark):
    docs = spark.createDataFrame(
        [(0, "x\ny\nx\nx")], "doc_id long, text string")
    row = _rows(line_dedup(docs))[0]
    assert row["text_dedup"] == "x\ny"
    assert (row["n_kept"], row["n_dropped"]) == (2, 2)


def test_line_dedup_preserves_line_order(spark):
    docs = spark.createDataFrame(
        [(0, "\n".join(f"line {i}" for i in range(20)))],
        "doc_id long, text string")
    row = _rows(line_dedup(docs))[0]
    assert row["text_dedup"].split("\n") == [f"line {i}" for i in range(20)]


# ----------------------------------------------------------- gopher_quality

def test_gopher_keep_and_reject(spark):
    good = " ".join(["the quick brown fox and that dog have fun with it",
                     "some more of the words to pad out the counter here"]
                    * 4)  # 84 words, mean len ~3.6, all alpha, stops
    docs = spark.createDataFrame(
        [(0, good),
         (1, "short text only"),                       # < min_words
         (2, " ".join(["12345 67890"] * 40))],         # no alpha, no stops
        "doc_id long, text string")
    out = _rows(gopher_quality_filter(docs))
    assert out[0]["keep"] is True
    assert out[0]["stop_hits"] >= 2 and out[0]["alpha_frac"] == 1.0
    assert out[1]["keep"] is False
    assert out[2]["keep"] is False and out[2]["alpha_frac"] == 0.0


def test_gopher_mean_word_length_bounds(spark):
    long_words = " ".join(["supercalifragilistic"] * 60)
    docs = spark.createDataFrame(
        [(0, long_words)], "doc_id long, text string")
    row = _rows(gopher_quality_filter(docs))[0]
    assert row["mean_word_len"] == 20.0
    assert row["keep"] is False


def test_gopher_empty_text(spark):
    docs = spark.createDataFrame([(0, "")], "doc_id long, text string")
    row = _rows(gopher_quality_filter(docs))[0]
    assert row["n_words"] == 0 and row["keep"] is False


# ------------------------------------------------------------------- plans

def test_pii_and_gopher_have_no_shuffle(spark):
    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string")
    for df in (pii_scrub(docs), c4_line_filter(docs),
               gopher_quality_filter(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_line_dedup_shuffle_count(spark):
    # one shuffle on the line hash (window) + one back on the key
    # (reassembly) — nothing else
    docs = spark.createDataFrame(
        [(0, "a\nb"), (1, "b\nc")], "doc_id long, text string")
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2


def test_langid_profile_multilang(spark):
    from lucene_solr_old_spark.operators.textstats import langid_profile

    rows = [(0, "the cat and the dog are here with it"),
            (1, "der hund und die katze sind auch da"),
            (2, "le chat et le chien sont dans la maison"),
            (3, "el gato y el perro con la casa de las cosas"),
            (4, "zzz qqq xxx"), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["pred"] for r in langid_profile(df).collect()}
    assert out == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und", 5: "und"}


def test_langid_profile_tie_breaks_to_first_language(spark):
    from lucene_solr_old_spark.operators.textstats import langid_profile

    # one marker from each of de ('der') and en ('the'): equal scores,
    # prediction must be the alphabetically first language
    df = spark.createDataFrame([(0, "der the")], "doc_id long, text string")
    assert langid_profile(df).collect()[0]["pred"] == "de"
