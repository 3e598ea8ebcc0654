"""repetition_stats (Gopher-style repetition signals) unit fixtures; the
full-corpus equivalence is driver-certified by the repetition_stats gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.textstats import repetition_stats


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"),            # dup 1-2/3; bigrams {a a, a b} top 1/2
         (2, "x y x y x y"),      # dup 1-2/6; bigrams x y:3, y x:2 -> 3/5
         (3, "solo"),             # no bigrams
         (4, "")],                # empty
        "doc_id LONG, text STRING")
    got = {r.doc_id: (r.dup_word_frac, r.top_bigram_frac)
           for r in repetition_stats(df).collect()}
    assert got[1] == (round(1 - 2 / 3, 6), 0.5)
    assert got[2] == (round(1 - 2 / 6, 6), 0.6)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)


def test_connected_components_clusters(spark):
    from pyspark.sql import functions as F
    from lucene_solr_old_spark.operators.dedup import (
        connected_components, dup_representatives)

    # two clusters (1-2-3 via chain, 10-11) + singleton 20; transitivity:
    # 1~2 and 2~3 without 1~3 must still collapse to one component
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "a LONG, b LONG")
    verts = spark.createDataFrame(
        [(1,), (2,), (3,), (10,), (11,), (20,)], "doc_id LONG")
    comp = {r.id: r.comp
            for r in connected_components(edges, verts).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}

    reps = dup_representatives(
        connected_components(edges, verts))
    kept = sorted(r.id for r in reps.where(F.col("keep")).collect())
    assert kept == [1, 10, 20]


def test_connected_components_long_chain(spark):
    # a path graph exercises multi-round propagation (diameter > 1)
    from lucene_solr_old_spark.operators.dedup import connected_components

    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a LONG, b LONG")
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id LONG")
    comp = {r.id: r.comp
            for r in connected_components(edges, verts).collect()}
    assert comp == {i: 0 for i in range(n)}


def test_normalize_url(spark):
    from lucene_solr_old_spark.operators.textstats import normalize_url

    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.Example.COM:443/Path/Sub/?utm_source=x&b=2&a=1#f"),
         (2, "http://host.com:80/"),
         (3, "http://host.com:8080/a?z=1&gclid=g"),
         (4, "https://host.com")],
        "doc_id LONG, url STRING")
    got = {r.doc_id: r.url_norm for r in normalize_url(df, "url").collect()}
    # case, www, default port, tracking, param sort, fragment, trail slash
    assert got[1] == "https://example.com/Path/Sub?a=1&b=2"
    assert got[2] == "http://host.com/"          # root slash kept
    assert got[3] == "http://host.com:8080/a?z=1"  # non-default port kept
    assert got[4] == "https://host.com/"         # empty path -> /


def test_decontaminate(spark):
    from lucene_solr_old_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [(1, "a b c d e f g"),        # shares the 5-gram "a b c d e"
         (2, "x y z w v u t"),        # clean
         (3, "q q q q")],             # shorter than n: clean
        "doc_id LONG, text STRING")
    bench = spark.createDataFrame(
        [(100, "a b c d e zz")], "doc_id LONG, text STRING")
    got = {r.doc_id: (r.n_overlaps, r.contaminated)
           for r in decontaminate(train, bench, n=5).collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_normalize_url_idempotent(spark):
    from lucene_solr_old_spark.operators.textstats import normalize_url

    urls = [
        (1, "HTTPS://WWW.Example.COM:443/Path/Sub/?utm_source=x&b=2&a=1#f"),
        (2, "http://host.com:80/"),
        (3, "ftp://Mixed.Case/KeepPath/"),
        (4, "https://a.b/p?x=1&x=0&ref=spam"),
    ]
    df = spark.createDataFrame(urls, "doc_id LONG, url STRING")
    once = normalize_url(df, "url").select(
        "doc_id", F.col("url_norm").alias("url"))
    twice = normalize_url(once, "url")
    rows = twice.collect()
    assert all(r.url == r.url_norm for r in rows), rows


def test_decontaminate_broadcasts_benchmark(spark):
    from lucene_solr_old_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [(i, "w" + " w".join(str(j) for j in range(i, i + 8)))
         for i in range(50)], "doc_id LONG, text STRING")
    bench = train.where(F.col("doc_id") % 10 == 0)
    plan = (decontaminate(train, bench, n=5)
            ._jdf.queryExecution().executedPlan().toString())
    # the benchmark-gram probe must be a broadcast join (map-side
    # semi-join over the corpus grams)
    assert "BroadcastHashJoin" in plan
