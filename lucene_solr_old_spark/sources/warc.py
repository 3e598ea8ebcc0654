"""WARC (Web ARChive, ISO 28500) content source — the Common Crawl ingest
format, completing the benchmark-feed family in :mod:`.readers`
(the reference's pluggable content sources,
``lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/feeds/
ContentSource.java:1-60``, ship LineDoc/TREC/enwiki; a web-scale corpus
today arrives as ``.warc.gz``).

Format (public spec, ISO 28500 / WARC 1.1):

* a record = ``WARC/1.0\\r\\n`` + header lines (``Name: value``, CRLF) +
  blank line + exactly ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``;
* a ``.warc.gz`` file is a plain concatenation of per-record gzip members
  (Python's ``gzip`` reads multi-member streams transparently and
  lazily);
* a ``response`` record's payload is a full HTTP response: status line +
  headers + CRLFCRLF + entity body.

Spark shape: WARC is not line-splittable (binary, per-record gzip
members), so parallelism is per FILE — exactly how Common Crawl shards
its corpus (~90k x ~1 GB files per crawl: far more files than executor
slots on any cluster, so file-granular tasks saturate 1000 executors).
``spark.read.format("binaryFile")`` hands each file to one task; the
parser streams records out of the (lazily inflated) gzip stream and
yields Arrow batches of ``batch_size`` records, so executor memory holds
the compressed file + one batch, never the inflated corpus.

Provenance note: this module implements the public WARC/HTTP specs
directly; nothing comparable exists in the reference (closest are the
TREC/GOV2 ``<DOCHDR>`` feeds, ``TrecGov2Parser.java:32-50``).
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "read_wet", "read_cdx", "iter_warc_records",
           "warc_record_bytes", "build_warc", "build_wet",
           "build_warc_with_cdx", "fetch_record", "surt_key",
           "read_warc_stream",
           "parse_http_response"]

_CRLF = b"\r\n"


# --------------------------------------------------------------------------
# record-level codec (pure Python; used by the reader, the writer, tests)
# --------------------------------------------------------------------------

def _read_headers(fh) -> tuple[dict, bool]:
    """Read CRLF-terminated header lines up to the blank line.  Returns
    ({lower-name: value}, saw_blank)."""
    headers: dict[str, str] = {}
    while True:
        line = fh.readline()
        if not line:
            return headers, False
        if line in (_CRLF, b"\n"):
            return headers, True
        try:
            text = line.decode("utf-8", "replace").rstrip("\r\n")
        except Exception:
            continue
        if ":" in text:
            name, _, value = text.partition(":")
            headers[name.strip().lower()] = value.strip()
    # not reached


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per record from raw WARC bytes —
    gzipped (single- or multi-member) or plain.  ``headers`` maps
    lower-cased names to values and includes the version line under
    ``"warc-version"``.  Malformed trailing garbage ends iteration
    rather than raising (a truncated fetch loses its tail record only).
    """
    if data[:2] == b"\x1f\x8b":
        fh = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        fh = io.BytesIO(data)
    while True:
        # every stream read can blow up on a truncated/corrupt gzip
        # member (EOFError mid-member, BadGzipFile/OSError on trailing
        # garbage, zlib.error on bit rot) — all map to "the tail of this
        # file is gone", same as the plain-bytes truncation below
        try:
            # seek the version line (skip inter-record CRLFs)
            version = None
            while True:
                line = fh.readline()
                if not line:
                    return
                if line.strip() == b"":
                    continue
                if line.startswith(b"WARC/"):
                    version = line.decode("ascii", "replace").strip()
                    break
                return  # not a record boundary: stop at garbage
            headers, ok = _read_headers(fh)
            if not ok:
                return
            headers["warc-version"] = version
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                return
            if length < 0:
                # read(-1) would slurp the rest of the stream as one
                # garbage payload, swallowing every following record
                return
            payload = fh.read(length)
            if len(payload) < length:
                return  # truncated
        except (OSError, EOFError, zlib.error):
            return
        yield headers, payload


def warc_record_bytes(warc_type: str, uri: str | None, date: str,
                      payload: bytes, record_id: str,
                      content_type: str = "application/http;msgtype=response",
                      gzip_member: bool = True) -> bytes:
    """One spec-compliant WARC record, optionally as its own gzip member
    (the ``.warc.gz`` convention: members concatenate into a valid file).
    """
    lines = [b"WARC/1.0",
             b"WARC-Type: " + warc_type.encode(),
             b"WARC-Record-ID: <" + record_id.encode() + b">",
             b"WARC-Date: " + date.encode()]
    if uri is not None:
        lines.append(b"WARC-Target-URI: " + uri.encode())
    lines += [b"Content-Type: " + content_type.encode(),
              b"Content-Length: " + str(len(payload)).encode()]
    raw = _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF
    if gzip_member:
        buf = io.BytesIO()
        # mtime pinned for byte determinism
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(raw)
        return buf.getvalue()
    return raw


def build_warc(docs, base_uri: str = "https://corpus.local/doc/",
               date: str = "2020-01-01T00:00:00Z",
               status: int = 200,
               content_type: str = "text/plain; charset=utf-8",
               gzip_members: bool = True) -> bytes:
    """Serialize ``(doc_key, text)`` pairs as WARC ``response`` records
    (an HTTP 200 wrapping each text) — deterministic bytes, for fixtures,
    round-trip tests, and corpus export."""
    out = io.BytesIO()
    for key, text in docs:
        body = (text or "").encode("utf-8")
        http = (f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {content_type}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                ).encode("ascii") + body
        out.write(warc_record_bytes(
            "response", f"{base_uri}{key}", date, http,
            record_id=f"urn:corpus:{key}", gzip_member=gzip_members))
    return out.getvalue()


def parse_http_response(payload: bytes) -> tuple[int | None, str | None,
                                                 bytes]:
    """(status, content-type, body) from an HTTP response payload; a
    payload with no header/body split parses as (None, None, payload).

    Lenient line endings: real-world archives occasionally carry bare-LF
    HTTP heads; when no CRLFCRLF separator exists, fall back to the first
    blank LF line (headers then split on LF with trailing CR stripped) so
    those records keep their status/content-type instead of being
    silently dropped by http_status filters downstream."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if sep:
        lines = head.split(_CRLF)
    else:
        head, sep, body = payload.partition(b"\n\n")
        if not sep:
            return None, None, payload
        lines = [ln.rstrip(b"\r") for ln in head.split(b"\n")]
    status = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    ctype = None
    for ln in lines[1:]:
        name, _, value = ln.partition(b":")
        if name.strip().lower() == b"content-type":
            ctype = value.strip().decode("latin-1")
            break
    return status, ctype, body


# --------------------------------------------------------------------------
# the Spark source
# --------------------------------------------------------------------------

WARC_SCHEMA = ("path STRING, record_id STRING, warc_type STRING, "
               "target_uri STRING, warc_date STRING, "
               "http_status INT, http_content_type STRING, html STRING")
# with keep_payload=True: the raw entity-body bytes travel as a BINARY
# column — the lossless path for non-text responses (images/audio/pdf),
# which utf-8-replace decoding would mangle; feeds operators/multimodal
WARC_SCHEMA_BIN = WARC_SCHEMA + ", payload BINARY"


def _make_warc_parser(types: set | None, batch_size: int,
                      keep_payload: bool = False):
    """mapInPandas stage shared by the batch and streaming readers."""
    cols = _WARC_COLS + (["payload"] if keep_payload else [])

    def parse(batches):
        import pandas as pd
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows: list[tuple] = []
                for headers, payload in iter_warc_records(bytes(content)):
                    wtype = headers.get("warc-type", "").lower()
                    if types is not None and wtype not in types:
                        continue
                    ctype = headers.get("content-type", "")
                    if ctype.startswith("application/http"):
                        status, http_ct, body = parse_http_response(payload)
                    else:
                        status, http_ct, body = None, None, payload
                    row = (
                        fpath,
                        headers.get("warc-record-id", "").strip("<>"),
                        wtype, headers.get("warc-target-uri"),
                        headers.get("warc-date"), status, http_ct,
                        body.decode("utf-8", "replace"))
                    rows.append(row + (bytearray(body),)
                                if keep_payload else row)
                    if len(rows) >= batch_size:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return parse


def read_warc(spark: SparkSession, path: str,
              record_types: tuple[str, ...] = ("response",),
              batch_size: int = 256,
              keep_payload: bool = False) -> DataFrame:
    """(path, record_id, warc_type, target_uri, warc_date, http_status,
    http_content_type, html) — one row per WARC record of the requested
    types across every ``.warc`` / ``.warc.gz`` under ``path``.

    ``html`` is the HTTP entity body (or the raw payload for non-HTTP
    records) decoded utf-8-replace — ready for
    :func:`...functions.htmlstrip.html_to_text`.  One task per file
    (WARC is not splittable); records stream out of the lazy gzip reader
    in ``batch_size`` Arrow batches, bounding memory at compressed-file
    + one batch.

    ``keep_payload=True`` adds the raw entity-body bytes as a BINARY
    ``payload`` column — the lossless route for image/audio/pdf
    responses (a utf-8-replace string mangles them); compose with
    :mod:`...operators.multimodal` for sniffing and feature extraction.
    """
    types = {t.lower() for t in record_types} if record_types else None
    parse = _make_warc_parser(types, batch_size, keep_payload)
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path)
             .select("path", "content"))
    return files.mapInPandas(
        parse, schema=WARC_SCHEMA_BIN if keep_payload else WARC_SCHEMA)


_WARC_COLS = ["path", "record_id", "warc_type", "target_uri", "warc_date",
              "http_status", "http_content_type", "html"]


def read_warc_stream(spark: SparkSession, path: str,
                     record_types: tuple[str, ...] = ("response",),
                     batch_size: int = 256) -> DataFrame:
    """Streaming twin of :func:`read_warc`: new ``.warc(.gz)`` files
    landing under ``path`` become micro-batches of parsed records — the
    continuous-crawl ingest front of the streaming pipeline (compose with
    :mod:`...streaming.pipeline` dedup / first-seen state and the NRT
    index appends).  Same per-file parallelism and record-batch memory
    bound; the parse is a stateless map, so no watermark is needed here.
    """
    types = {t.lower() for t in record_types} if record_types else None
    parse = _make_warc_parser(types, batch_size)

    files = (spark.readStream.format("binaryFile")
             .schema("path STRING, modificationTime TIMESTAMP, "
                     "length LONG, content BINARY")
             .option("pathGlobFilter", "*.warc*")
             .load(path)
             .select("path", "content"))
    return files.mapInPandas(parse, schema=WARC_SCHEMA)


# --------------------------------------------------------------------------
# CDX(J) index — Common Crawl's URL index for random access into WARC
# --------------------------------------------------------------------------
#
# A CDXJ line is ``<urlkey> <timestamp> <json>`` where the JSON block
# carries url/mime/status/digest plus the WARC locator triplet
# (filename, offset, length).  Because every ``.warc.gz`` record is its
# own gzip member, ``bytes[offset : offset+length]`` is a complete
# compressed record — the index turns the archive into a random-access
# store (the pywb / Common Crawl access pattern).

import json as _json


def surt_key(url: str) -> str:
    """SURT-style canonical sort key: host reversed comma-wise +
    ')' + path, lowercased, scheme/port/www stripped (the Common Crawl
    urlkey convention)."""
    u = url.strip().lower()
    for scheme in ("https://", "http://"):
        if u.startswith(scheme):
            u = u[len(scheme):]
            break
    host, slash, rest = u.partition("/")
    host = host.split("@")[-1].split(":")[0]
    if host.startswith("www."):
        host = host[4:]
    return ",".join(reversed(host.split("."))) + ")/" + rest


def build_warc_with_cdx(docs, filename: str = "docs.warc.gz",
                        base_uri: str = "https://corpus.local/doc/",
                        date: str = "2020-01-01T00:00:00Z",
                        timestamp: str = "20200101000000",
                        status: int = 200,
                        content_type: str = "text/plain; charset=utf-8"
                        ) -> tuple[bytes, str]:
    """(warc_bytes, cdx_text): the .warc.gz plus its CDXJ index with
    byte-accurate (offset, length) per record — the writer knows member
    boundaries, so the index is exact by construction (tested by
    re-fetching every record through :func:`fetch_record`)."""
    warc = io.BytesIO()
    lines = []
    for key, text in docs:
        uri = f"{base_uri}{key}"
        member = build_warc([(key, text)], base_uri=base_uri, date=date,
                            status=status, content_type=content_type,
                            gzip_members=True)
        offset = warc.tell()
        warc.write(member)
        meta = {"url": uri, "mime": content_type.split(";")[0],
                "status": str(status),
                "length": str(len(member)), "offset": str(offset),
                "filename": filename}
        lines.append(f"{surt_key(uri)} {timestamp} "
                     f"{_json.dumps(meta, sort_keys=True)}")
    return warc.getvalue(), "\n".join(lines) + ("\n" if lines else "")


CDX_SCHEMA = ("urlkey STRING, timestamp STRING, url STRING, mime STRING, "
              "status INT, length LONG, offset LONG, filename STRING")


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """(urlkey, timestamp, url, mime, status, length, offset, filename)
    from CDXJ index files — plain line-splittable text, so this parses at
    scan speed with zero Python: split off the two space-delimited fields,
    ``from_json`` the rest."""
    from pyspark.sql import functions as F
    raw = spark.read.text(path).where(F.trim("value") != "")
    urlkey = F.substring_index("value", " ", 1)
    ts = F.element_at(F.split("value", " ", 3), 2)
    blob = F.element_at(F.split("value", " ", 3), 3)
    j = F.from_json(blob, "url STRING, mime STRING, status STRING, "
                          "length STRING, offset STRING, filename STRING")
    return raw.select(
        urlkey.alias("urlkey"), ts.alias("timestamp"),
        j["url"].alias("url"), j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["length"].cast("long").alias("length"),
        j["offset"].cast("long").alias("offset"),
        j["filename"].alias("filename"))


def fetch_record(warc_bytes: bytes, offset: int,
                 length: int) -> tuple[dict, bytes]:
    """Random-access fetch: inflate ONE record from its (offset, length)
    slice of a .warc.gz — the byte-range access pattern the CDX index
    exists for (no scan of the surrounding file)."""
    got = list(iter_warc_records(warc_bytes[offset:offset + length]))
    if len(got) != 1:
        raise ValueError(
            f"slice at offset={offset} length={length} contained "
            f"{len(got)} records, expected exactly 1")
    return got[0]


def read_wet(spark: SparkSession, path: str,
             batch_size: int = 256) -> DataFrame:
    """(path, record_id, target_uri, warc_date, text) — Common Crawl WET
    (extracted-text) files: the same WARC container whose ``conversion``
    records carry the already-extracted plain text as the payload.  Same
    execution shape as :func:`read_warc`."""
    from pyspark.sql import functions as F
    out = read_warc(spark, path, record_types=("conversion",),
                    batch_size=batch_size)
    return out.select("path", "record_id", "target_uri", "warc_date",
                      F.col("html").alias("text"))


def build_wet(docs, base_uri: str = "https://corpus.local/doc/",
              date: str = "2020-01-01T00:00:00Z",
              gzip_members: bool = True) -> bytes:
    """Serialize ``(doc_key, text)`` pairs as WET ``conversion`` records
    (deterministic bytes; the writer dual of :func:`read_wet`)."""
    out = io.BytesIO()
    for key, text in docs:
        out.write(warc_record_bytes(
            "conversion", f"{base_uri}{key}", date,
            (text or "").encode("utf-8"),
            record_id=f"urn:corpus:{key}",
            content_type="text/plain",
            gzip_member=gzip_members))
    return out.getvalue()
