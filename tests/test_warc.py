"""WARC source: spec-level codec round-trips, multi-member gzip, HTTP
parsing, truncation tolerance, and the Spark reader end-to-end over a
written .warc.gz."""

import gzip
import os

import pytest

from lucene_solr_old_spark.sources.warc import (
    build_warc, iter_warc_records, parse_http_response, read_warc,
    warc_record_bytes)


def test_record_bytes_spec_shape():
    raw = warc_record_bytes("response", "http://x/1",
                            "2020-01-01T00:00:00Z", b"PAYLOAD",
                            record_id="urn:x:1", gzip_member=False)
    assert raw.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Type: response\r\n" in raw
    assert b"Content-Length: 7\r\n" in raw
    assert raw.endswith(b"\r\n\r\nPAYLOAD\r\n\r\n")


def test_iter_plain_and_gzip_roundtrip():
    recs = [("a", "hello world"), ("b", "x\r\ny\nz"), ("c", "")]
    for gz in (False, True):
        blob = build_warc(recs, gzip_members=gz)
        got = list(iter_warc_records(blob))
        assert len(got) == 3
        for (key, text), (h, payload) in zip(recs, got):
            assert h["warc-type"] == "response"
            assert h["warc-target-uri"] == f"https://corpus.local/doc/{key}"
            assert h["warc-version"] == "WARC/1.0"
            status, ctype, body = parse_http_response(payload)
            assert status == 200
            assert ctype == "text/plain; charset=utf-8"
            assert body.decode("utf-8") == text


def test_gzip_members_are_independent():
    # each record its own member: slicing one member still parses
    blob1 = build_warc([("a", "one")])
    blob2 = build_warc([("b", "two")])
    both = blob1 + blob2
    assert [h["warc-target-uri"] for h, _ in iter_warc_records(both)] == \
        ["https://corpus.local/doc/a", "https://corpus.local/doc/b"]
    assert len(list(iter_warc_records(blob1))) == 1


def test_mixed_record_types_and_binary_payload():
    img = bytes(range(256))
    rec_meta = warc_record_bytes("metadata", None, "2020-01-01T00:00:00Z",
                                 b"k: v", record_id="urn:m:1",
                                 content_type="application/warc-fields",
                                 gzip_member=False)
    rec_img = warc_record_bytes("resource", "http://x/img",
                                "2020-01-01T00:00:00Z", img,
                                record_id="urn:i:1",
                                content_type="image/png",
                                gzip_member=False)
    got = list(iter_warc_records(rec_meta + rec_img))
    assert [h["warc-type"] for h, _ in got] == ["metadata", "resource"]
    assert got[1][1] == img


def test_truncated_tail_drops_last_record_only():
    blob = build_warc([("a", "first record"), ("b", "second record")],
                      gzip_members=False)
    cut = blob[:len(blob) - 25]  # slice into b's payload
    got = list(iter_warc_records(cut))
    assert len(got) == 1
    assert got[0][0]["warc-target-uri"].endswith("/a")


def test_parse_http_response_edges():
    assert parse_http_response(b"no split here") == (None, None,
                                                     b"no split here")
    s, c, b = parse_http_response(b"HTTP/1.1 301 Moved\r\n"
                                  b"Location: x\r\n\r\nbody")
    assert (s, c, b) == (301, None, b"body")
    s, c, b = parse_http_response(b"HTTP/1.1 noint x\r\n\r\n")
    assert s is None


def test_read_warc_spark(spark, tmp_path):
    docs = [(f"d{i:03d}", f"document {i} body text\nline two {i}")
            for i in range(40)]
    p1 = tmp_path / "part1.warc.gz"
    p1.write_bytes(build_warc(docs[:25]))
    p2 = tmp_path / "part2.warc"
    p2.write_bytes(build_warc(docs[25:], gzip_members=False))
    (tmp_path / "ignored.txt").write_text("not a warc")

    df = read_warc(spark, str(tmp_path), batch_size=7)
    rows = {r["target_uri"].rsplit("/", 1)[1]: r for r in df.collect()}
    assert len(rows) == 40
    for key, text in docs:
        r = rows[key]
        assert r["html"] == text
        assert r["http_status"] == 200
        assert r["warc_type"] == "response"
        assert r["http_content_type"] == "text/plain; charset=utf-8"
        assert r["record_id"] == f"urn:corpus:{key}"
        assert r["warc_date"] == "2020-01-01T00:00:00Z"
    # record_types filter drops everything when nothing matches
    assert read_warc(spark, str(tmp_path),
                     record_types=("request",)).count() == 0


def test_read_warc_deterministic_bytes():
    # mtime pinned: identical input -> identical .warc.gz bytes
    assert build_warc([("k", "v")]) == build_warc([("k", "v")])


def test_read_wet_spark(spark, tmp_path):
    from lucene_solr_old_spark.sources.warc import build_wet, read_wet
    docs = [("w1", "extracted text one"), ("w2", "zeile zwei\numbruch")]
    (tmp_path / "seg.warc.wet.gz").write_bytes(build_wet(docs))
    rows = {r["target_uri"].rsplit("/", 1)[1]: r["text"]
            for r in read_wet(spark, str(tmp_path)).collect()}
    assert rows == dict(docs)
    # conversion records are invisible to the default response reader
    from lucene_solr_old_spark.sources.warc import read_warc
    assert read_warc(spark, str(tmp_path)).count() == 0


def test_surt_key():
    from lucene_solr_old_spark.sources.warc import surt_key
    assert surt_key("https://www.Example.COM/a/b?q=1") == \
        "com,example)/a/b?q=1"
    assert surt_key("http://sub.host.org:8080/") == "org,host,sub)/"
    assert surt_key("https://user@x.net") == "net,x)/"


def test_cdx_offsets_random_access():
    from lucene_solr_old_spark.sources.warc import (
        build_warc_with_cdx, fetch_record, parse_http_response)
    import json
    docs = [(f"k{i}", f"payload number {i} " * (i + 1)) for i in range(12)]
    warc, cdx = build_warc_with_cdx(docs)
    lines = cdx.strip().split("\n")
    assert len(lines) == 12
    for (key, text), line in zip(docs, lines):
        meta = json.loads(line.split(" ", 2)[2])
        h, payload = fetch_record(warc, int(meta["offset"]),
                                  int(meta["length"]))
        assert h["warc-target-uri"].endswith("/" + key)
        _, _, body = parse_http_response(payload)
        assert body.decode("utf-8") == text
    # offsets tile the file exactly
    metas = [json.loads(l.split(" ", 2)[2]) for l in lines]
    assert int(metas[0]["offset"]) == 0
    end = int(metas[-1]["offset"]) + int(metas[-1]["length"])
    assert end == len(warc)


def test_read_cdx_spark(spark, tmp_path):
    from lucene_solr_old_spark.sources.warc import (
        build_warc_with_cdx, read_cdx)
    docs = [(f"c{i}", f"text {i}") for i in range(9)]
    warc, cdx = build_warc_with_cdx(docs, filename="f.warc.gz")
    (tmp_path / "index.cdx").write_text(cdx)
    rows = read_cdx(spark, str(tmp_path / "index.cdx")) \
        .orderBy("offset").collect()
    assert len(rows) == 9
    assert rows[0]["offset"] == 0 and rows[0]["status"] == 200
    assert rows[0]["urlkey"] == "local,corpus)/doc/c0"
    assert rows[0]["filename"] == "f.warc.gz"
    assert all(r["mime"] == "text/plain" for r in rows)
    # lengths sum to the archive size (contiguous members)
    assert sum(r["length"] for r in rows) == len(warc)


def test_read_warc_stream(spark, tmp_path):
    from lucene_solr_old_spark.sources.warc import read_warc_stream
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    (src_dir / "b1.warc.gz").write_bytes(build_warc([("s1", "first")]))
    stream = read_warc_stream(spark, str(src_dir))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("warc_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["target_uri"]: r["html"]
           for r in spark.sql("SELECT * FROM warc_sink").collect()}
    assert got == {"https://corpus.local/doc/s1": "first"}
    # a new file landing = a new micro-batch, no reprocessing of b1
    (src_dir / "b2.warc.gz").write_bytes(build_warc([("s2", "second")]))
    q2 = (stream.writeStream.format("memory").queryName("warc_sink2")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    rows = spark.sql("SELECT target_uri FROM warc_sink2").collect()
    assert {r["target_uri"].rsplit("/", 1)[1] for r in rows} == {"s1", "s2"}


# ---------------------------------------------------------------------------
# property tests (pure codec, no Spark)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    @given(st.lists(st.tuples(
        st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1, max_size=12),
        st.text(max_size=400)), min_size=0, max_size=8),
        st.booleans())
    @settings(max_examples=60, deadline=None)
    def test_prop_roundtrip(docs, gz):
        # unique keys (duplicate keys are fine for WARC, but make the
        # equality check unambiguous)
        seen, uniq = set(), []
        for k, t in docs:
            if k not in seen:
                seen.add(k)
                uniq.append((k, t))
        blob = build_warc(uniq, gzip_members=gz)
        got = list(iter_warc_records(blob))
        assert len(got) == len(uniq)
        for (k, t), (h, payload) in zip(uniq, got):
            assert h["warc-target-uri"].endswith("/" + k)
            _s, _c, body = parse_http_response(payload)
            assert body.decode("utf-8") == t

    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=80, deadline=None)
    def test_prop_garbage_never_raises(junk):
        # arbitrary bytes: the iterator terminates without raising
        assert isinstance(list(iter_warc_records(junk)), list)

    @given(st.integers(min_value=0, max_value=10_000),
           st.binary(min_size=1, max_size=4))
    @settings(max_examples=60, deadline=None)
    def test_prop_corruption_never_raises(pos, patch):
        blob = bytearray(build_warc(
            [("a", "first text here."), ("b", "second text here.")],
            gzip_members=False))
        pos = pos % len(blob)
        blob[pos:pos + len(patch)] = patch
        out = list(iter_warc_records(bytes(blob)))
        assert len(out) <= 2

except ImportError:  # pragma: no cover - hypothesis is in the image
    pass


def test_read_cdx_plan_codegen_only(spark, tmp_path):
    from lucene_solr_old_spark.sources.warc import (
        build_warc_with_cdx, read_cdx)
    _w, cdx = build_warc_with_cdx([("p", "q")])
    (tmp_path / "i.cdx").write_text(cdx)
    plan = read_cdx(spark, str(tmp_path / "i.cdx")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan, plan


def test_gzip_truncation_drops_tail_not_raises():
    blob = build_warc([("a", "first record text"), ("b", "second text")])
    for cut in (10, 25, len(blob) - 5, len(blob) - 30):
        got = list(iter_warc_records(blob[:cut]))  # must not raise
        assert len(got) <= 2
    # trailing garbage after a valid member: keep the valid record
    good = build_warc([("a", "only record")])
    got = list(iter_warc_records(good + b"trailing junk not gzip"))
    assert len(got) == 1
    # gzip magic + junk: no records, no exception
    assert list(iter_warc_records(b"\x1f\x8bjunk")) == []


def test_negative_content_length_does_not_swallow():
    rec_bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:x:bad>\r\n"
               b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
               b"Content-Type: application/http\r\n"
               b"Content-Length: -1\r\n\r\n")
    rec_good = warc_record_bytes("response", "http://x/g",
                                 "2020-01-01T00:00:00Z", b"ok",
                                 record_id="urn:x:g", gzip_member=False)
    got = list(iter_warc_records(rec_bad + rec_good))
    # the corrupt record ends iteration; it must NOT emit a garbage
    # payload containing the good record's bytes
    assert all(b"urn:x:g" not in p for _h, p in got)


def test_streaming_warc_to_nrt_index(spark, tmp_path):
    """Composition: streaming WARC ingest feeding the NRT incremental
    indexer — new crawl files land, segments publish idempotently, a
    re-opened reader sees the new docs (the SearcherManager pattern)."""
    from lucene_solr_old_spark.sources.warc import read_warc_stream
    from lucene_solr_old_spark.streaming.incremental import (
        open_nrt_reader, start_incremental_indexer)
    from lucene_solr_old_spark.operators import search as S

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    (crawl / "b1.warc.gz").write_bytes(build_warc(
        [("d1", "zebra stripes pattern on the savanna."),
         ("d2", "giraffe necks reach the high leaves.")]))
    stream = read_warc_stream(spark, str(crawl)) \
        .selectExpr("target_uri AS url", "html AS text")
    q = start_incremental_indexer(stream, index, ckpt, key_col="url",
                                  text_col="text", analyzer="ws_lower")
    q.awaitTermination(180)

    idx = open_nrt_reader(spark, index, analyzer="ws_lower")
    hit1 = S.search_or(idx, "zebra", k=5).collect()
    assert len(hit1) == 1 and hit1[0]["key"].endswith("/d1")

    # a new crawl file lands; restart from the same checkpoint
    (crawl / "b2.warc.gz").write_bytes(build_warc(
        [("d3", "zebra crossings paint the city street.")]))
    q2 = start_incremental_indexer(stream, index, ckpt, key_col="url",
                                   text_col="text", analyzer="ws_lower")
    q2.awaitTermination(180)

    idx2 = open_nrt_reader(spark, index, analyzer="ws_lower")
    keys = sorted(r["key"].rsplit("/", 1)[1]
                  for r in S.search_or(idx2, "zebra", k=5).collect())
    assert keys == ["d1", "d3"]
    assert idx2.docmeta.count() == 3  # checkpoint prevented reprocessing


def test_keep_payload_binary_lossless(spark, tmp_path):
    from lucene_solr_old_spark.sources.warc import warc_record_bytes
    img = bytes(range(256)) * 4  # every byte value: utf-8 decode mangles
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n"
            + f"Content-Length: {len(img)}\r\n\r\n".encode() + img)
    (tmp_path / "img.warc.gz").write_bytes(warc_record_bytes(
        "response", "http://x/i.png", "2020-01-01T00:00:00Z", http,
        record_id="urn:i:1"))
    row = read_warc(spark, str(tmp_path), keep_payload=True).first()
    assert bytes(row["payload"]) == img
    assert row["http_content_type"] == "image/png"
    # default stays payload-free (no binary column shipped)
    assert "payload" not in read_warc(spark, str(tmp_path)).columns
    # the multimodal sniffer composes on the payload column
    from lucene_solr_old_spark.operators.multimodal import sniff_media_meta
    df = read_warc(spark, str(tmp_path), keep_payload=True) \
        .selectExpr("target_uri AS key", "payload")
    meta = sniff_media_meta(df).first()
    assert meta["format"] is not None or meta["n_bytes"] == len(img)
