"""Corpus-cleaning operators for a web-scale training-data pipeline:
PII scrubbing, C4-style line/page filtering, global exact line dedup, and
the Gopher document-quality rules.

These are the standard pre-training cleanup passes published for web text:

* C4 (Raffel et al., "Exploring the Limits of Transfer Learning with a
  Unified Text-to-Text Transformer", JMLR 2020, §2.2): keep only lines
  ending in terminal punctuation with >= 3 words, drop "javascript" lines,
  drop pages with "lorem ipsum" or "{" or fewer than a minimum of retained
  lines.
* CCNet (Wenzek et al., LREC 2020) / RefinedWeb: paragraph-hash dedup
  across the whole corpus keeping the first occurrence.
* Gopher (Rae et al. 2021, §A1.1 "quality filtering"): word-count range,
  mean-word-length range, alphabetic-word ratio, required-stopword hits.

Everything here is pure Catalyst (JVM codegen, no Python UDFs) and shapes
to one map-side-combinable shuffle where a shuffle is needed at all, so
each pass streams at parquet-scan speed on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["pii_scrub", "c4_line_filter", "line_dedup",
           "gopher_quality_filter", "eval_once"]


def eval_once(c: Column) -> Column:
    """Value-identity barrier that forces ``c`` to be evaluated ONCE.

    ``element_at(shuffle(array(c)), 1)`` always returns ``c`` (shuffling a
    one-element array is the identity), but ``shuffle`` is non-deterministic,
    so the optimizer may neither collapse the projection computing it into
    downstream projections nor substitute it into a pushed-down filter
    predicate — the two rewrites that otherwise re-evaluate an expensive
    derived column once per reference (the Catalyst-expression analogue of
    the duplicated-UDF problem; marking the expression non-deterministic is
    the documented fix for both).  Without this, composing
    ``pii_scrub -> c4_line_filter -> where(page_keep) -> gopher -> where(keep)``
    re-ran the full upstream regex chain inside every pushed filter: ~2x
    the whole stack's cost at 300k docs, growing with chain depth.

    Trade-off: a non-deterministic column also blocks pushing *other*
    predicates through the projection, so this wraps only expensive
    derived columns in full-corpus passes (where nothing useful could be
    pushed to the scan anyway), not general query paths.
    """
    return F.element_at(F.shuffle(F.array(c)), 1)

# RE2-compatible (no backrefs / lookaround) so the same patterns run in
# Spark (java.util.regex) and in RE2-based engines used for oracles.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d -]{6,}\d"


def pii_scrub(docs: DataFrame, key_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(key, text_clean, n_email, n_ip, n_phone): redact e-mail addresses,
    IPv4 literals, and international phone numbers with typed placeholder
    tokens, counting each category.

    The three patterns are applied IN ORDER, each counted against the text
    as left by the previous stage (so an address like ``user@10.0.0.1``
    counts once as e-mail, and the digits inside an already-redacted IP
    cannot re-match as a phone number).  Per-row Catalyst string ops only —
    no shuffle, no UDF; the pass is embarrassingly parallel at any scale.
    """
    t0 = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), 0))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), 0))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phone = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), 0))
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    # the 3-regex chain behind text_clean is the single most expensive
    # expression of the cleaning stack — eval_once stops downstream
    # filters/projections from re-running it per reference
    return docs.select(
        F.col(key_col),
        eval_once(t3).alias("text_clean"),
        n_email.cast("long").alias("n_email"),
        n_ip.cast("long").alias("n_ip"),
        n_phone.cast("long").alias("n_phone"),
    )


def _line_words(line):
    return F.filter(F.split(F.trim(line), " "), lambda w: w != F.lit(""))


def c4_line_filter(docs: DataFrame, key_col: str = "doc_id",
                   text_col: str = "text",
                   min_words_per_line: int = 3,
                   min_lines: int = 5) -> DataFrame:
    """(key, text_clean, n_lines_kept, page_keep) — the C4 §2.2 cleanup.

    Line rules (a line survives iff ALL hold):
      * ends in a terminal punctuation mark (``.``, ``!`` or ``?``),
      * has >= ``min_words_per_line`` whitespace words,
      * does not contain the word ``javascript`` (case-insensitive).
    Page rules (``page_keep``):
      * >= ``min_lines`` surviving lines (C4's "fewer than 5 sentences"),
      * the raw page contains neither ``lorem ipsum`` nor ``{``.

    Per-row array expressions only (split -> filter -> array_join): zero
    shuffles, so this composes with the scan at 100 TB.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda x: x.rlike("[.!?]$")
        & (F.size(_line_words(x)) >= F.lit(min_words_per_line))
        & ~F.contains(F.lower(x), F.lit("javascript")))
    # two-projection shape: the per-line filter array is materialized once
    # (eval_once), then every output — and any downstream where(page_keep)
    # — derives from the cheap attribute instead of a fresh copy of the
    # line scan (+ whatever expression produced text_col upstream)
    staged = docs.select(
        F.col(key_col),
        F.col(text_col).alias("_c4_text"),
        eval_once(kept).alias("_c4_kept"),
    )
    kept_c = F.col("_c4_kept")
    page_keep = ((F.size(kept_c) >= F.lit(min_lines))
                 & ~F.contains(F.lower(F.col("_c4_text")), F.lit("lorem ipsum"))
                 & ~F.contains(F.col("_c4_text"), F.lit("{")))
    return staged.select(
        F.col(key_col),
        F.array_join(kept_c, "\n").alias("text_clean"),
        F.size(kept_c).cast("long").alias("n_lines_kept"),
        page_keep.alias("page_keep"),
    )


def line_dedup(docs: DataFrame, key_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(key, text_dedup, n_kept, n_dropped) — corpus-wide exact line dedup
    keeping only the FIRST occurrence of each distinct line (first = lowest
    (key, line position)), the CCNet/RefinedWeb paragraph-dedup discipline
    that strips boilerplate ("subscribe to our newsletter") repeated across
    millions of pages.

    Shape at scale: explode to (line-hash, key, pos), ONE shuffle on the
    hash, a row_number window inside each hash group (group size = global
    frequency of that exact line — the heavy hitters are exactly the
    boilerplate lines we drop, and AQE splits any skewed partition), then
    one shuffle back on the key to reassemble documents in line order.
    Nothing is collected to the driver and no state is per-executor, so the
    pass scales with the shuffle fabric.
    """
    lines = docs.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    w = Window.partitionBy(F.md5(F.col("line"))) \
        .orderBy(F.col(key_col), F.col("pos"))
    ranked = lines.withColumn("rk", F.row_number().over(w))
    out = (ranked
           .groupBy(key_col)
           .agg(
               F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.when(F.col("rk") == 1,
                                  F.struct("pos", "line")))),
                       lambda s: s["line"]),
                   "\n").alias("text_dedup"),
               F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
               .cast("long").alias("n_kept"),
               F.sum(F.when(F.col("rk") != 1, 1).otherwise(0))
               .cast("long").alias("n_dropped")))
    return out


# Gopher §A1.1 required stop words: a document that never uses any of
# these almost certainly is not running English prose.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(docs: DataFrame, key_col: str = "doc_id",
                          text_col: str = "text",
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_len: float = 3.0,
                          max_mean_len: float = 10.0,
                          min_alpha_frac: float = 0.8,
                          min_stop_hits: int = 2,
                          stop_words: tuple = GOPHER_STOPS) -> DataFrame:
    """(key, n_words, mean_word_len, alpha_frac, stop_hits, keep) — the
    Gopher document-quality rules (Rae et al. 2021 §A1.1):

      * ``min_words <= n_words <= max_words``,
      * mean word length in ``[min_mean_len, max_mean_len]``,
      * >= ``min_alpha_frac`` of words contain an alphabetic character,
      * >= ``min_stop_hits`` distinct hits from the required stop-word set
        (``stop_words``; the paper's English eight by default — pass the
        target language's function words for non-English corpora, as
        :func:`..pipelines.web_to_training_data` does).

    (The companion repetition rules live in
    :func:`..textstats.repetition_stats`.)  Pure per-row Catalyst — no
    shuffle; floats rounded to 6 so oracle comparison is exact.
    """
    # stage 1: tokenize once (eval_once — see c4_line_filter); stage 2:
    # per-word stats from the materialized array; stage 3: the keep rule
    # over the computed stats, so where(keep) re-checks six scalar
    # comparisons instead of re-running the word scan per rule
    staged = docs.select(
        F.col(key_col),
        eval_once(_line_words(F.lower(F.col(text_col)))).alias("_g_words"),
    )
    words = F.col("_g_words")
    n = F.size(words)
    nn = n.cast("double")
    mean_len = F.when(
        n > 0,
        F.round(F.aggregate(words, F.lit(0.0),
                            lambda acc, w: acc + F.length(w)) / nn, 6)) \
        .otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    alpha_frac = F.when(n > 0, F.round(n_alpha.cast("double") / nn, 6)) \
        .otherwise(F.lit(0.0))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(s) for s in stop_words])))
    stats = staged.select(
        F.col(key_col),
        n.cast("long").alias("n_words"),
        eval_once(mean_len).alias("mean_word_len"),
        eval_once(alpha_frac).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    keep = ((F.col("n_words") >= F.lit(min_words))
            & (F.col("n_words") <= F.lit(max_words))
            & (F.col("mean_word_len") >= F.lit(min_mean_len))
            & (F.col("mean_word_len") <= F.lit(max_mean_len))
            & (F.col("alpha_frac") >= F.lit(min_alpha_frac))
            & (F.col("stop_hits") >= F.lit(min_stop_hits)))
    return stats.select(
        key_col, "n_words", "mean_word_len", "alpha_frac", "stop_hits",
        keep.alias("keep"),
    )
