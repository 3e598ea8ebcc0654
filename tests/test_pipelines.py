"""End-to-end web_to_training_data: a crafted synthetic crawl exercises
every stage — language filter, C4/Gopher drops, exact + near dedup,
decontamination, split discipline, BPE packing — with deterministic
outcomes."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.pipelines import web_to_training_data
from lucene_solr_old_spark.sources.warc import build_warc


# distinct texts: near-dup clustering must NOT bridge unrelated docs,
# so the eight keepers share only function words (3-shingle overlap ~0)
_EN = [
    "the river bends softly and the old mill turns with a steady creak.",
    "a patient gardener waters the roses and hums to himself while the "
    "morning sun climbs over the eastern wall and warms every single "
    "flower bed near the gate.",
    "the night train rattles past empty fields and the conductor checks "
    "every faded ticket.",
    "fresh bread cools on the wooden counter and soft butter melts into "
    "the warm crust.",
    "the tired fisherman mends his torn net and watches the slow tide "
    "pull away from shore.",
    "two curious children count the bright kites and chase the longest "
    "tail across the open meadow while their mother reads a letter and "
    "the afternoon light turns gold.",
    "the library smells of dust and the lamps hum quietly above the "
    "reading desks.",
    "a winter storm bends the pines and snow settles over the quiet "
    "village roofs.",
]


def _en(i):
    return _EN[i]


DOCS = (
    # 8 clean English docs
    [(f"en{i}", _en(i)) for i in range(8)]
    # exact duplicates of en0 under other urls (only ONE survivor total)
    + [("dupA", _en(0)), ("dupB", _en(0))]
    # near duplicate of en1: one word differs mid-sentence
    + [("near1", _en(1).replace("morning sun", "evening sun"))]
    # German: function-word profile match -> filtered by lang="en"
    + [("de1", "der hund und die katze sind nicht im haus und das wetter "
               "ist heute auch nicht besser oder schlechter.")]
    # junk: no terminal punctuation on any line -> C4 drops the page
    + [("junk1", "no punctuation here at all\nstill none")]
    # junk: brace character -> C4 page rule
    + [("junk2", "the brace { appears and the page must go away now.")]
)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crawl")
    (d / "crawl.warc.gz").write_bytes(build_warc(DOCS))
    return str(d)


@pytest.fixture(scope="module")
def result(spark, warc_dir):
    return web_to_training_data(
        spark, warc_dir, min_words=5, min_lines=1,
        num_merges=64, max_tokens=64)


def test_stage_counts(result):
    s = result.summary()
    assert s["raw_docs"] == len(DOCS)
    # survivors: en0..en7 (en0's exact-dup group keeps min url "dupA"!
    # -> exactly ONE of {en0, dupA, dupB}), minus one of {en1, near1}
    assert s["clean_docs"] == 8
    assert s["encoded_docs"] == 8
    assert 0 < s["train_packs"] <= 8
    assert s["bpe_merges"] == 64


def test_drops_are_the_right_docs(result):
    urls = {r["url"].rsplit("/", 1)[1]
            for r in result.clean.select("url").collect()}
    assert "de1" not in urls and "junk1" not in urls and "junk2" not in urls
    # exact-dup cluster {en0, dupA, dupB}: exactly one survivor (min url)
    assert len(urls & {"en0", "dupA", "dupB"}) == 1
    assert (urls & {"en0", "dupA", "dupB"}) == {"dupA"}
    # near-dup cluster {en1, near1}: exactly one survivor (min url)
    assert len(urls & {"en1", "near1"}) == 1
    assert all(u.startswith(("en", "dup", "near")) for u in urls)


def test_split_discipline(result):
    rows = result.clean.select("url", "split").collect()
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    assert len(rows) == len({r["url"] for r in rows})


def test_packing_budget(result):
    packs = result.packed.collect()
    assert packs, "train split produced no packs"
    for p in packs:
        assert p["oversize"] or p["total_tokens"] <= 64
    # every pack token count equals the sum of its docs' n_tokens
    ntok = {r["url"]: r["n_tokens"]
            for r in result.encoded.collect()}
    for p in packs:
        assert p["total_tokens"] == sum(ntok[d] for d in p["doc_ids"])


def test_deterministic(spark, warc_dir, result):
    again = web_to_training_data(
        spark, warc_dir, min_words=5, min_lines=1,
        num_merges=64, max_tokens=64)
    assert again.merges == result.merges
    a = sorted(r["url"] for r in again.clean.collect())
    b = sorted(r["url"] for r in result.clean.collect())
    assert a == b


def test_decontamination(spark, warc_dir, result):
    # a benchmark carrying en5's first sentence (> 13 shared words)
    bench = spark.createDataFrame(
        [(0, _en(5))], "doc_id INT, text STRING")
    r2 = web_to_training_data(
        spark, warc_dir, min_words=5, min_lines=1,
        merges=result.merges, max_tokens=64, benchmark=bench)
    urls = {r["url"].rsplit("/", 1)[1] for r in r2.clean.collect()}
    assert "en5" not in urls
    assert len(urls) == 7


def test_lang_de_pipeline(spark, warc_dir, result):
    # language-aware Gopher stops: a German pipeline keeps German prose
    # (the paper's English stop rule would drop every German doc)
    r3 = web_to_training_data(
        spark, warc_dir, lang="de", min_words=5, min_lines=1,
        merges=result.merges, max_tokens=64)
    urls = {r["url"].rsplit("/", 1)[1] for r in r3.clean.collect()}
    assert urls == {"de1"}


def test_lang_none_keeps_all_languages_before_gopher(spark, warc_dir,
                                                     result):
    # lang=None skips the language FILTER (the clean frame still carries
    # the predicted lang); the English-stops Gopher rule then drops the
    # German doc — documented behavior for mixed corpora
    r4 = web_to_training_data(
        spark, warc_dir, lang=None, min_words=5, min_lines=1,
        merges=result.merges, max_tokens=64)
    langs = {r["lang"] for r in r4.clean.select("lang").collect()}
    assert langs == {"en"}


def test_all_language_profiles(spark):
    from lucene_solr_old_spark.operators.textstats import (
        all_language_profiles, langid_profile)
    prof = all_language_profiles()
    assert len(prof) >= 20 and all(prof.values())
    assert {"en", "de", "ru", "tr", "pt", "el"} <= set(prof)
    df = spark.createDataFrame(
        [(0, "il gatto dorme sulla sedia e non vuole scendere mai"),
         (1, "он сказал что это было очень хорошо и все согласились"),
         (2, "the cat sleeps on the chair and it will not come down")],
        "doc_id INT, text STRING")
    got = {r["doc_id"]: r["pred"]
           for r in langid_profile(df, profiles=prof).collect()}
    assert got == {0: "it", 1: "ru", 2: "en"}


def test_gopher_stops_wide(spark):
    from lucene_solr_old_spark.pipelines import _gopher_stops
    import pytest as _pytest
    assert len(_gopher_stops("ru")) > 0
    assert _gopher_stops(None) == _gopher_stops("en")
    with _pytest.raises(ValueError):
        _gopher_stops("zz")


def test_duplicate_url_captures_collapse(spark, tmp_path):
    # the same URL captured twice (recrawl): exactly one row survives,
    # carrying the EARLIEST capture — and no row multiplication happens
    from lucene_solr_old_spark.sources.warc import warc_record_bytes
    import io
    body_old = _en(2).encode()
    body_new = _en(3).encode()

    def resp(body, rid, date):
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        return warc_record_bytes("response", "https://x.com/page", date,
                                 http, record_id=rid)

    blob = (resp(body_new, "urn:r:2", "2021-06-01T00:00:00Z")
            + resp(body_old, "urn:r:1", "2020-01-01T00:00:00Z"))
    d = tmp_path / "dup"
    d.mkdir()
    (d / "c.warc.gz").write_bytes(blob)
    r = web_to_training_data(spark, str(d), min_words=5, min_lines=1,
                             num_merges=8, max_tokens=64)
    rows = r.clean.collect()
    assert len(rows) == 1
    assert rows[0]["text"] == _en(2)  # earliest warc_date wins


def test_lang_it_via_wide_profiles(spark, tmp_path):
    # a language outside the old default 4-profile set flows end-to-end
    from lucene_solr_old_spark.sources.warc import build_warc
    it_text = ("il vecchio mulino gira piano e la ruota di legno canta "
               "con la corrente del fiume che non si ferma mai.")
    d = tmp_path / "it"
    d.mkdir()
    (d / "c.warc.gz").write_bytes(build_warc(
        [("it1", it_text), ("en1", _en(0))]))
    r = web_to_training_data(spark, str(d), lang="it", min_words=5,
                             min_lines=1, num_merges=8, max_tokens=64)
    urls = {row["url"].rsplit("/", 1)[1] for row in r.clean.collect()}
    assert urls == {"it1"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        web_to_training_data(spark, str(d), lang="zz", min_words=5)
