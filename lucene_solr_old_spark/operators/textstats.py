"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — the per-document scoring passes of a training-data
pipeline.  All Catalyst expressions (JVM, codegen'd); no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.stopwords import ENGLISH_STOP_WORDS

__all__ = ["token_counts", "langid_en", "quality_score", "doc_fingerprint",
           "repetition_stats", "normalize_url", "langid_profile",
           "all_language_profiles"]

def _stop_arr():
    # built lazily: Column literals need an active SparkContext
    return F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])


def _ws_toks(text_col):
    return F.filter(F.split(F.lower(text_col), " "), lambda x: x != F.lit(""))


def token_counts(docs: DataFrame, key_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(key, n_ws, n_alpha): whitespace token count + alphabetic-run count
    (the BPE-ish regex proxy)."""
    return docs.select(
        F.col(key_col),
        F.size(_ws_toks(F.col(text_col))).cast("long").alias("n_ws"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[a-zA-Z]+"), 0))
        .cast("long").alias("n_alpha"),
    )


def langid_en(docs: DataFrame, key_col: str = "doc_id",
              text_col: str = "text",
              threshold: float = 0.05) -> DataFrame:
    """(key, en_ratio, pred): English-stopword-ratio heuristic language ID.
    en_ratio = |stopword tokens| / |tokens| (rounded 6)."""
    toks = _ws_toks(F.col(text_col))
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(_stop_arr(), x)))
    ratio = F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0))
    return docs.select(
        F.col(key_col),
        F.round(ratio, 6).alias("en_ratio"),
        F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("other"))
        .alias("pred"),
    )


def quality_score(docs: DataFrame, key_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(key, quality): composite heuristic — type/token ratio, non-stopword
    ratio, length saturation.  quality =
    round(0.5*uniq_ratio + 0.3*(1 - stop_ratio) + 0.2*least(1, n/100), 6)."""
    toks = _ws_toks(F.col(text_col))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(_stop_arr(), x)))
    nn = n.cast("double")
    q = (F.lit(0.5) * (nd.cast("double") / nn)
         + F.lit(0.3) * (F.lit(1.0) - n_stop.cast("double") / nn)
         + F.lit(0.2) * F.least(F.lit(1.0), nn / F.lit(100.0)))
    return docs.select(
        F.col(key_col),
        F.when(n > 0, F.round(q, 6)).otherwise(F.lit(0.0)).alias("quality"),
    )


def repetition_stats(docs: DataFrame, key_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(key, dup_word_frac, top_bigram_frac) — Gopher-style repetition
    signals (Rae et al. 2021 §A1.1: "repetition removal"): the fraction of
    duplicated words and the fraction of all word bigrams taken by the
    single most frequent bigram.  High values flag boilerplate/spam for a
    training-data filter.

    Scale shape: the per-doc mode-of-bigrams is computed RELATIONALLY
    (explode -> map-side-combinable groupBy count -> per-doc max), not via
    an O(n^2) per-row array expression — at web scale the two aggregations
    shuffle (doc, bigram) pairs once each and AQE coalesces the skew."""
    toks = _ws_toks(F.col(text_col))
    base = (docs.select(F.col(key_col), toks.alias("toks"))
            .withColumn("n", F.size("toks"))
            .withColumn("n_uniq", F.size(F.array_distinct("toks"))))
    bigrams = base.select(
        F.col(key_col),
        F.explode(F.when(F.col("n") >= 2, F.expr(
            "transform(sequence(0, n - 2), "
            "i -> concat(toks[i], ' ', toks[i + 1]))"))
            .otherwise(F.array())).alias("bigram"))
    top = (bigrams.groupBy(key_col, "bigram").count()
           .groupBy(key_col)
           .agg(F.max("count").alias("top_bg"),
                F.sum("count").alias("n_bg")))
    dup = F.when(F.col("n") > 0,
                 F.lit(1.0) - F.col("n_uniq").cast("double") / F.col("n"))
    topf = F.when(F.col("n_bg").isNotNull() & (F.col("n_bg") > 0),
                  F.col("top_bg").cast("double") / F.col("n_bg"))
    return (base.join(top, key_col, "left")
            .select(F.col(key_col),
                    F.round(F.coalesce(dup, F.lit(0.0)), 6)
                    .alias("dup_word_frac"),
                    F.round(F.coalesce(topf, F.lit(0.0)), 6)
                    .alias("top_bigram_frac")))


def doc_fingerprint(docs: DataFrame, key_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(key, fp): md5 of the normalized (lowercased, stopword-stripped,
    whitespace-joined) token stream — the content fingerprint used for
    near-canonical dedup (the Solr MD5Signature analogue over the analyzed
    stream instead of the raw field)."""
    toks = _ws_toks(F.col(text_col))
    kept = F.filter(toks, lambda x: ~F.array_contains(_stop_arr(), x))
    return docs.select(
        F.col(key_col),
        F.md5(F.concat_ws(" ", kept)).alias("fp"),
    )


def normalize_url(docs: DataFrame, url_col: str = "url",
                  out_col: str = "url_norm") -> DataFrame:
    """Append ``out_col`` = canonicalized URL — the web-pipeline dedup key
    (two crawls of one page routinely differ only in case, default port,
    tracking params, param order, fragment, or a trailing slash).

    Steps (all Catalyst string/array expressions — JVM codegen, no UDF):
      1. lowercase scheme + host,
      2. strip a leading ``www.``,
      3. strip default ports (``:80`` http, ``:443`` https),
      4. drop the fragment,
      5. drop tracking params (``utm_*``, ``gclid``, ``fbclid``, ``ref``),
      6. sort surviving query params (order-insensitive canonical form),
      7. strip a trailing slash from a non-root path.
    """
    u = F.col(url_col)
    # 1-2: scheme+host lowercase, www strip (host = up to first / after //)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    # 3: default ports
    host = F.when(scheme == "http",
                  F.regexp_replace(host, r":80$", "")) \
            .when(scheme == "https",
                  F.regexp_replace(host, r":443$", "")) \
            .otherwise(host)
    tail = F.regexp_extract(rest, r"^[^/?#]*(.*)$", 1)
    # 4: fragment off
    tail = F.regexp_replace(tail, r"#.*$", "")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.regexp_extract(tail, r"^[^?]*\?(.*)$", 1)
    # 5-6: tracking params out, rest sorted
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) &
                  ~p.rlike(r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="))
    canon_q = F.array_join(F.array_sort(params), "&")
    # 7: trailing slash (non-root)
    path = F.when(path == "", F.lit("/")) \
            .otherwise(F.regexp_replace(path, r"(.)/$", "$1"))
    out = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                            canon_q)))
    return docs.withColumn(out_col, out)


def all_language_profiles(n_markers: int = 25) -> dict[str, list[str]]:
    """Function-word marker profiles for EVERY language the engine ships
    a stop set for (22 incl. English) — pass as
    ``langid_profile(profiles=all_language_profiles())`` for wide-net
    language ID, or one entry as a Gopher ``stop_words`` set.  Opt-in by
    design: ``langid_profile``'s default stays the certified 4-language
    profile, so existing predictions (and the langid_multi gate) are
    unchanged.  Markers = the ``n_markers`` shortest stop words (length
    then lexicographic), the same rule the default profile uses."""
    from ..functions import lang as L
    from ..functions.greek import GREEK_STOP_WORDS
    from ..functions.lang2 import (ARMENIAN_STOP_WORDS, BASQUE_STOP_WORDS,
                                   CATALAN_STOP_WORDS)

    sets = {
        "ar": L.ARABIC_STOP_WORDS, "ca": CATALAN_STOP_WORDS,
        "cs": L.CZECH_STOP_WORDS, "da": L.DANISH_STOP_WORDS,
        "de": L.GERMAN_STOP_WORDS, "el": GREEK_STOP_WORDS,
        "en": ENGLISH_STOP_WORDS, "es": L.SPANISH_STOP_WORDS,
        "eu": BASQUE_STOP_WORDS, "fi": L.FINNISH_STOP_WORDS,
        "fr": L.FRENCH_STOP_WORDS, "ga": L.IRISH_STOP_WORDS,
        "hu": L.HUNGARIAN_STOP_WORDS, "hy": ARMENIAN_STOP_WORDS,
        "it": L.ITALIAN_STOP_WORDS, "nl": L.DUTCH_STOP_WORDS,
        "no": L.NORWEGIAN_STOP_WORDS, "pt": L.PORTUGUESE_STOP_WORDS,
        "ro": L.ROMANIAN_STOP_WORDS, "ru": L.RUSSIAN_STOP_WORDS,
        "sv": L.SWEDISH_STOP_WORDS, "tr": L.TURKISH_STOP_WORDS,
    }
    return {code: sorted(words, key=lambda w: (len(w), w))[:n_markers]
            for code, words in sets.items() if words}


def langid_profile(docs: DataFrame, key_col: str = "doc_id",
                   text_col: str = "text",
                   profiles: dict[str, list[str]] | None = None,
                   n_markers: int = 25) -> DataFrame:
    """(key, pred, score): multi-language ID by stopword-profile match —
    for each candidate language, the fraction of the doc's tokens that
    are that language's most characteristic function words; prediction =
    argmax (ties break to the alphabetically first language, 'und' when
    nothing matches).  The default profiles reuse the engine's own
    snowball stop sets, taking the ``n_markers`` SHORTEST words (length
    then lexicographic — function words are short, so this yields
    le/la/et/der/die/the/el/... rather than an alphabetic-prefix
    accident).

    Pure per-row Catalyst (one array_intersect per language): zero
    shuffles, linear in languages x tokens."""
    if profiles is None:
        from ..functions.lang import (FRENCH_STOP_WORDS,
                                      GERMAN_STOP_WORDS,
                                      SPANISH_STOP_WORDS)
        def short(words):
            return sorted(words, key=lambda w: (len(w), w))[:n_markers]

        profiles = {
            "de": short(GERMAN_STOP_WORDS),
            "en": short(ENGLISH_STOP_WORDS),
            "es": short(SPANISH_STOP_WORDS),
            "fr": short(FRENCH_STOP_WORDS),
        }
    toks = _ws_toks(F.col(text_col))
    n = F.size(toks)
    nn = n.cast("double")
    scores = []
    for lang in sorted(profiles):
        marker = F.array(*[F.lit(w) for w in sorted(profiles[lang])])
        hits = F.size(F.filter(toks,
                               lambda x: F.array_contains(marker, x)))
        ratio = F.when(n > 0, F.round(hits.cast("double") / nn, 6)) \
            .otherwise(F.lit(0.0))
        scores.append(F.struct(ratio.alias("score"),
                               F.lit(lang).alias("lang")))
    # argmax with lang-asc ties: max over (score, reversed-lang) trick is
    # fragile; sort desc by score then asc lang via array_sort comparator
    arr = F.array(*scores)
    best = F.array_max(F.transform(
        arr, lambda s: F.struct(
            s["score"].alias("score"),
            # invert lang ordering so array_max prefers the SMALLEST lang
            # on score ties (struct comparison is lexicographic)
            F.transform(F.split(s["lang"], ""),
                        lambda c: -F.ascii(c)).alias("inv"),
            s["lang"].alias("lang"))))
    return docs.select(
        F.col(key_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("pred"),
        best["score"].alias("score"),
    )
