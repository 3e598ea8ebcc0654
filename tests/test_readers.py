"""Benchmark content-source readers (sources/readers.py)."""

import os

from lucene_solr_old_spark.sources.readers import (read_enwiki,
                                                   read_line_docs,
                                                   read_trec)

TREC = """<DOC>
<DOCNO> A-1 </DOCNO>
<DOCHDR>
http://x/y
HTTP/1.1 200 OK
</DOCHDR>
one two
</DOC>
<DOC>
<DOCNO>B-2</DOCNO>
three four
</DOC>
"""


def _write(tmp_path, name, content):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write(content)
    return p


def test_trec_gov2_and_plain(spark, tmp_path):
    p = _write(tmp_path, "a.trec", TREC)
    rows = {r["docno"]: r for r in read_trec(spark, p).collect()}
    assert rows["A-1"]["url"] == "http://x/y"
    assert rows["A-1"]["body"] == "one two"
    assert rows["B-2"]["url"] is None
    assert rows["B-2"]["body"] == "three four"


def test_line_docs(spark, tmp_path):
    p = _write(tmp_path, "d.line",
               "# header\nT1\t2026\tbody a\nT2\t2027\tbody b\n")
    rows = sorted((r["title"], r["date"], r["body"])
                  for r in read_line_docs(spark, p).collect())
    assert rows == [("T1", "2026", "body a"), ("T2", "2027", "body b")]


def test_enwiki_image_skip(spark, tmp_path):
    xml = ("<page><title>A</title><id>1</id>"
           "<revision><id>9</id><text>x\ny</text></revision></page>"
           "<page><title>Image:I</title><id>2</id>"
           "<revision><text>z</text></revision></page>")
    p = _write(tmp_path, "w.xml", xml)
    rows = read_enwiki(spark, p).collect()
    assert [(r["id"], r["title"], r["body"]) for r in rows] == \
        [(1, "A", "x y")]
    assert read_enwiki(spark, p, keep_images=True).count() == 2


def test_readers_plan_is_codegen_only(spark, tmp_path):
    p = _write(tmp_path, "a2.trec", TREC)
    plan = read_trec(spark, p)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
