"""bpe_train's max_types bound: deterministic count-desc/word-asc
truncation, surfaced via a warning instead of silently (r6; the "no
silent caps" rule)."""

import logging

from lucene_solr_old_spark.operators.bpe import bpe_train


def test_truncation_deterministic_by_count_desc_word_asc():
    pairs = [("aa", 5), ("ab", 5), ("bb", 3), ("cc", 2)]
    kept = bpe_train(pairs, 10, max_types=2, min_count=1)
    # top-2 types are aa/ab (count 5, word asc) whatever the input order
    for perm in ([pairs[1], pairs[3], pairs[0], pairs[2]],
                 list(reversed(pairs))):
        assert bpe_train(perm, 10, max_types=2, min_count=1) == kept


def test_dataframe_truncation_warns_and_matches_iterable(spark, caplog):
    rows = [(f"w{i:02d}", 100 - i) for i in range(20)]
    df = spark.createDataFrame(rows, "word STRING, count LONG")
    with caplog.at_level(logging.WARNING,
                         logger="lucene_solr_old_spark.operators.bpe"):
        m_df = bpe_train(df, 5, max_types=10, min_count=1)
    assert any("max_types=10" in r.message for r in caplog.records)
    m_it = bpe_train(rows, 5, max_types=10, min_count=1)
    assert m_df == m_it

    caplog.clear()
    with caplog.at_level(logging.WARNING,
                         logger="lucene_solr_old_spark.operators.bpe"):
        bpe_train(df, 5, max_types=50, min_count=1)
    assert not caplog.records  # no truncation -> no warning
