"""Benchmark content-source readers — the reference's pluggable corpus
feeds (``lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/
feeds/``) as Catalyst-only Spark connectors:

  * :func:`read_line_docs` — ``LineDocSource``: one document per line,
    ``title \\t date \\t body`` (``WriteLineDocTask.SEP``), optional
    ``#``-prefixed header lines skipped;
  * :func:`read_trec` — ``TrecContentSource``: ``<DOC>`` blocks with
    ``<DOCNO>`` names; the GOV2 variant's ``<DOCHDR>`` (first line =
    URL, body after ``</DOCHDR>``) is detected per document
    (``TrecGov2Parser.java:32-50``), otherwise the body is the block
    with the DOCNO element stripped;
  * :func:`read_enwiki` — ``EnwikiContentSource``: ``<page>`` elements
    with title / first ``<id>`` / ``<text>`` body, ``Image:`` pages
    dropped unless ``keep_images`` (EnwikiContentSource.java:127-133),
    tabs/newlines in the body normalized to spaces like the reference.

All three are ``spark.read.text`` with a custom record delimiter plus
``regexp_extract`` — the whole parse stays in whole-stage codegen, one
file-scan stage, no Python.  At 100 TB the files split on the record
delimiter exactly like any other text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_line_docs", "read_trec", "read_enwiki"]


def read_line_docs(spark: SparkSession, path: str) -> DataFrame:
    """(title, date, body) from a WriteLineDocTask file."""
    raw = spark.read.text(path).where(
        ~F.col("value").startswith("#") & (F.trim("value") != ""))
    parts = F.split("value", "\t", 3)
    return raw.select(
        parts.getItem(0).alias("title"),
        parts.getItem(1).alias("date"),
        parts.getItem(2).alias("body"))


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    """(docno, url, body) from TREC <DOC> blocks."""
    raw = (spark.read.option("lineSep", "</DOC>").text(path)
           .where(F.col("value").contains("<DOC>")))
    docno = F.regexp_extract("value", r"(?s)<DOCNO>\s*(.*?)\s*</DOCNO>", 1)
    has_hdr = F.col("value").contains("<DOCHDR>")
    url = F.when(
        has_hdr,
        F.regexp_extract("value", r"(?s)<DOCHDR>\s*(\S+)", 1))
    body_gov2 = F.regexp_extract("value", r"(?s)</DOCHDR>(.*)$", 1)
    body_plain = F.regexp_replace(
        F.regexp_replace("value", r"(?s)<DOCNO>.*?</DOCNO>", ""),
        r"</?DOC>", "")
    body = F.when(has_hdr, body_gov2).otherwise(body_plain)
    return raw.select(
        docno.alias("docno"),
        url.alias("url"),
        # trim() strips spaces only; TREC bodies carry newlines
        F.regexp_replace(body, r"^\s+|\s+$", "").alias("body"))


def read_enwiki(spark: SparkSession, path: str,
                keep_images: bool = False) -> DataFrame:
    """(id, title, body) from a Wikipedia XML dump."""
    raw = (spark.read.option("lineSep", "</page>").text(path)
           .where(F.col("value").contains("<title>")))
    title = F.regexp_extract("value", r"(?s)<title>(.*?)</title>", 1)
    page_id = F.regexp_extract("value", r"<id>(\d+)</id>", 1)
    body = F.regexp_replace(
        F.regexp_extract("value", r"(?s)<text[^>]*>(.*?)</text>", 1),
        "[\t\n]", " ")
    out = raw.select(page_id.cast("long").alias("id"),
                     title.alias("title"), body.alias("body"))
    if not keep_images:
        out = out.where(~F.col("title").startswith("Image:"))
    return out
