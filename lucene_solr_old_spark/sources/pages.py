"""Synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Deterministic (seeded) generator of the input table from BASELINE.json's
input_hint: ``url:string, warc_ts:timestamp, html:binary, text:string,
lang:string``.  The golden ``text`` column is assembled *independently* of
the HTML-strip extractor: every template node contributes its exact html
and text fragments in parallel, so ``html_to_text(html) == text`` is a real
differential test of the extractor, not a tautology.

Content: Zipf-distributed vocabulary (head-term skew is real at small
scale), the 33 stopwords, possessives, mixed case, numbers, URLs-ish
tokens, and words with known Porter stems — the coverage FIXTURES.md
prescribes.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

__all__ = ["VOCAB_SIZE", "gen_pages", "pages_dataframe", "PAGES_SCHEMA"]

PAGES_SCHEMA = ("url STRING, warc_ts TIMESTAMP, html BINARY, "
                "text STRING, lang STRING")

VOCAB_SIZE = 5000

_PORTER_WORDS = [
    "caresses", "ponies", "relational", "meetings", "running", "hopeful",
    "electrical", "adjustable", "formative", "generalization", "activate",
    "universities", "conditional", "sensibilities", "replacement",
]
_STOP_SAMPLE = ["the", "and", "of", "to", "a", "in", "that", "it", "with",
                "for", "是", "не"]  # two non-en fillers used in non-en docs
_MIXED = ["Don't", "O'Neil's", "U.S.A", "3.14", "1,024", "MP3", "x86",
          "State-of-the-art", "example.com", "Zürich", "café"]


def _vocab() -> list[str]:
    rng = random.Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = set()
    while len(words) < VOCAB_SIZE:
        n = rng.randint(3, 11)
        words.add("".join(rng.choice(alphabet) for _ in range(n)))
    return sorted(words)


_VOCAB = _vocab()


def _zipf_word(rng: random.Random) -> str:
    # rank ~ Zipf(s=1.1): inverse-CDF on a truncated harmonic series
    r = rng.random()
    rank = int(min(VOCAB_SIZE - 1, (1.0 / (1.0 - r * 0.999)) ** 1.6 - 1))
    return _VOCAB[rank]


def _sentence(rng: random.Random, lang: str) -> str:
    n = rng.randint(5, 18)
    words = []
    for _ in range(n):
        p = rng.random()
        if p < 0.28:
            words.append(rng.choice(_STOP_SAMPLE[:10] if lang == "en"
                                    else _STOP_SAMPLE))
        elif p < 0.33:
            words.append(rng.choice(_PORTER_WORDS))
        elif p < 0.37:
            words.append(rng.choice(_MIXED))
        else:
            w = _zipf_word(rng)
            if rng.random() < 0.08:
                w = w.capitalize()
            words.append(w)
    return " ".join(words) + "."


class _Doc:
    """Parallel html/text builder — fragments appended in lockstep."""

    def __init__(self):
        self.html: list[str] = []
        self.text: list[str] = []

    def raw(self, s: str) -> None:
        self.html.append(s)
        self.text.append(s)

    def block(self, tag: str, inner: str, attrs: str = "") -> None:
        self.html.append(f"<{tag}{attrs}>{inner}</{tag}>")
        self.text.append(f"\n{inner}\n")

    def inline(self, tag: str, inner: str) -> None:
        self.html.append(f"<{tag}>{inner}</{tag}>")
        self.text.append(inner)

    def script(self, body: str) -> None:
        self.html.append(f"<script>{body}</script>")
        self.text.append("\n")

    def style(self, body: str) -> None:
        self.html.append(f"<style>{body}</style>")
        self.text.append("\n")

    def comment(self, body: str) -> None:
        self.html.append(f"<!-- {body} -->")

    def entity_amp(self) -> None:
        self.html.append(" &amp; ")
        self.text.append(" & ")

    def br(self) -> None:
        self.html.append("<br>")
        self.text.append("\n")


def _render(rng: random.Random, lang: str) -> tuple[str, str]:
    d = _Doc()
    d.html.append("<html><body>")
    d.text.append("\n\n")
    d.block("h1", _sentence(rng, lang))
    if rng.random() < 0.3:
        d.comment("hidden " + _zipf_word(rng))
    n_paras = rng.randint(1, 5)
    for _ in range(n_paras):
        s = _sentence(rng, lang)
        if rng.random() < 0.25:
            half = len(s) // 2
            d.html.append(f"<p>{s[:half]}<b>{s[half:]}</b></p>")
            d.text.append(f"\n{s}\n")
        else:
            d.block("p", s)
        if rng.random() < 0.15:
            d.entity_amp()
        if rng.random() < 0.15:
            d.br()
    if rng.random() < 0.4:
        d.script("var x = '" + _zipf_word(rng) + "';")
    if rng.random() < 0.2:
        d.style("p { color: red }")
    d.html.append("</body></html>")
    d.text.append("\n\n")
    return "".join(d.html), "".join(d.text)


_LANGS = ["en", "en", "en", "en", "en", "en", "de", "es", "fr", "zh"]


def gen_pages(n: int, seed: int = 42) -> list[tuple]:
    """[(url, warc_ts, html-bytes, text, lang)] — deterministic in (n, seed).

    Each doc is generated from its own ``Random(seed*1e9 + i)`` so any
    subset/sharding of ids yields identical rows (resumability fixture).
    """
    return [_gen_one(i, seed) for i in range(n)]


def _gen_one(i: int, seed: int) -> tuple:
    rng = random.Random(seed * 1_000_000_007 + i)
    lang = _LANGS[rng.randint(0, len(_LANGS) - 1)]
    html, text = _render(rng, lang)
    url = f"https://example{i % 97}.com/p/{i:08d}"
    ts = dt.datetime(2014, 2, 15) + dt.timedelta(seconds=i * 17
                                                 + rng.randint(0, 13))
    return url, ts, html.encode("utf-8"), text, lang


def pages_dataframe(spark: SparkSession, n: int, seed: int = 42,
                    num_partitions: int | None = None) -> DataFrame:
    """Distributed generation: ids are sharded to executors and each doc is
    rendered from its own per-id RNG, so the corpus is identical for any
    partitioning (and generation scales with the cluster, not the driver).
    """
    import pandas as pd

    parts = num_partitions or max(8, n // 5000)

    def render(batches):
        for pdf in batches:
            rows = [_gen_one(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                              "text", "lang"])

    return (spark.range(0, n, numPartitions=parts)
            .mapInPandas(render, schema=PAGES_SCHEMA))
