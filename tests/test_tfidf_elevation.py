"""ClassicSimilarity (TF-IDF) + query elevation semantics."""

import math

import pytest

from lucene_solr_old_spark.functions.smallfloat import (byte315_to_float,
                                                        doclen_to_norm)
from lucene_solr_old_spark.operators.elevation import elevate_query
from lucene_solr_old_spark.operators.indexer import build_index
from lucene_solr_old_spark.operators.tfidf import search_tfidf

DOCS = [
    ("d1", "spark join spark merge"),
    ("d2", "spark window"),
    ("d3", "join join join table"),
    ("d4", "nothing else"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, "url STRING, text STRING")
    return build_index(df, num_segments=2, analyzer="ws_stop").persist()


def _oracle_tfidf(query_terms, docs=DOCS):
    tok = {u: t.split() for u, t in docs}
    max_doc = len(docs)
    dfv = {t: sum(1 for u in tok if t in tok[u]) for t in set(query_terms)}
    idf = {t: math.log(max_doc / (dfv[t] + 1.0)) + 1.0 for t in dfv}
    qn = 1.0 / math.sqrt(sum(idf[t] ** 2 for t in query_terms))
    out = []
    for u in tok:
        s, matched = 0.0, 0
        for t in set(query_terms):
            freq = tok[u].count(t)
            if not freq:
                continue
            matched += 1
            nv = float(byte315_to_float(int(doclen_to_norm(len(tok[u])))))
            s += math.sqrt(freq) * idf[t] * idf[t] * qn * nv
        if matched:
            out.append((u, s * matched / len(query_terms)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_tfidf_matches_oracle(idx):
    got = [(r["key"], float(r["score"]))
           for r in search_tfidf(idx, "spark join", k=10,
                                 precision="float64").collect()]
    exp = _oracle_tfidf(["spark", "join"])
    assert [k for k, _ in got] == [k for k, _ in exp]
    for (gk, gs), (_ek, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9), gk


def test_tfidf_and_mode(idx):
    got = {r["key"] for r in
           search_tfidf(idx, "spark join", k=10, mode="AND").collect()}
    assert got == {"d1"}


def test_elevation_pins_and_excludes(idx):
    out = [(r["key"], r["elevated"])
           for r in elevate_query(idx, "spark", ["d4", "d2"],
                                  excluded_keys=["d1"], k=10).collect()]
    # d4 doesn't match 'spark' but is force-elevated first; d2 second;
    # remaining organic hits follow; d1 excluded entirely
    assert out[0] == ("d4", True)
    assert out[1] == ("d2", True)
    assert all(not e for _k, e in out[2:])
    assert "d1" not in {k for k, _ in out}


def test_elevation_without_force(idx):
    out = [r["key"] for r in
           elevate_query(idx, "spark", ["d4", "d2"], k=10,
                         force_elevation=False).collect()]
    assert "d4" not in out  # non-matching pin dropped without force
    assert out[0] == "d2"


class TestSuggesters:
    """AnalyzingSuggester / FuzzySuggester / combine (analyzed-key
    semantics aren't SQL-expressible: porter stems in the key)."""

    @pytest.fixture(scope="class")
    def table(self, spark):
        from lucene_solr_old_spark.operators.spell import build_suggest_table

        surfaces = spark.createDataFrame(
            [("Running Shoes", 100), ("Runner's World", 80),
             ("Rain Jacket", 60), ("Ran Fast", 10)],
            "surface STRING, weight LONG")
        return build_suggest_table(surfaces, analyzer="english").persist()

    def test_analyzed_key_matching(self, table):
        from lucene_solr_old_spark.operators.spell import analyzing_suggest

        # "runs" stems to "run" -> matches surfaces whose analyzed key
        # starts with "run" ("running shoes"->"run shoe",
        # "runner's world"->"runner world" does NOT start with "run "...
        got = [r["surface"]
               for r in analyzing_suggest(table, "runs", k=5).collect()]
        assert got[0] == "Running Shoes"
        assert "Rain Jacket" not in got

    def test_fuzzy_tolerates_edit(self, table):
        from lucene_solr_old_spark.operators.spell import fuzzy_suggest

        # "rin jacket" ~1 edit from "rain jacket" (analyzed)
        got = [r["surface"]
               for r in fuzzy_suggest(table, "rin jacket", k=5,
                                      max_edits=1,
                                      non_fuzzy_prefix=1).collect()]
        assert got == ["Rain Jacket"]

    def test_word_combine(self, spark):
        from lucene_solr_old_spark.operators.indexer import build_index
        from lucene_solr_old_spark.operators.spell import (
            word_combine_suggest)

        df = spark.createDataFrame(
            [("d1", "database systems handbook"),
             ("d2", "data base admin")],
            "url STRING, text STRING")
        idx = build_index(df, num_segments=1, analyzer="ws_stop")
        got = [(r["combined"], r["i"])
               for r in word_combine_suggest(
                   idx, ["data", "base", "admin"], k=5).collect()]
        assert got == [("database", 0)]


def test_dfr_and_ib_rank_sensibly(idx):
    """DFR G-L-H2 and IB SPL-DF-H2 run and rank matching docs only."""
    from lucene_solr_old_spark.operators.tfidf import (search_dfr_gl2,
                                                       search_ib_spl)

    for fn in (search_dfr_gl2, search_ib_spl):
        got = [(r["key"], float(r["score"]))
               for r in fn(idx, "spark join", k=10).collect()]
        keys = [k for k, _ in got]
        assert set(keys) <= {"d1", "d2", "d3"}
        assert all(s > 0 for _, s in got)
        # d1 matches both terms: must rank above single-term docs
        assert keys[0] == "d1"


def test_freetext_trigram_backoff(spark):
    from lucene_solr_old_spark.operators.dedup import ws_tokens
    from lucene_solr_old_spark.operators.spell import free_text_suggest

    docs = spark.createDataFrame(
        [(1, "new york city is big"),
         (2, "new york city never sleeps"),
         (3, "new york state of mind"),
         (4, "york minster england")],
        "doc_id INT, text STRING")
    toks = ws_tokens(docs)
    got = {r["word"]: float(r["score"])
           for r in free_text_suggest(toks, "new york", k=5).collect()}
    # trigram: count(new york city)=2 / count(new york)=3
    assert got["city"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["state"] == pytest.approx(1 / 3, abs=1e-6)
    # 'minster' never follows "new york": backs off to bigram york->minster
    # = 0.4 * (1 / count(york)=4)
    assert got["minster"] == pytest.approx(0.4 * 1 / 4, abs=1e-6)
    # top suggestion is the trigram winner
    top = max(got, key=got.get)
    assert top == "city"


def test_infix_suggest(spark):
    from lucene_solr_old_spark.operators.spell import (build_suggest_table,
                                                       infix_suggest)

    surfaces = spark.createDataFrame(
        [("Running Shoes", 100), ("Trail Running", 90),
         ("Shoe Laces", 50), ("Rain Gear", 20)],
        "surface STRING, weight LONG")
    table = build_suggest_table(surfaces, analyzer="english").persist()
    got = [(r["surface"], r["prefix_match"])
           for r in infix_suggest(table, "running", k=5).collect()]
    # prefix match ("Running Shoes" -> key "run shoe") outranks the infix
    # match ("Trail Running" -> "trail run") despite... weights 100 vs 90
    assert got == [("Running Shoes", True), ("Trail Running", False)]
    got2 = [r["surface"] for r in infix_suggest(table, "shoes", k=5).collect()]
    assert set(got2) == {"Running Shoes", "Shoe Laces"}


def test_freetext_table_path_matches_and_has_no_corpus_pass(spark):
    """Suggesting from a prebuilt build_freetext_table frame gives the
    same scores as the token-stream path, and its plan contains no Window
    (no per-call corpus gram pass — VERDICT r02 weak item)."""
    from lucene_solr_old_spark.operators.dedup import ws_tokens
    from lucene_solr_old_spark.operators.spell import (
        build_freetext_table, free_text_suggest)

    docs = spark.createDataFrame(
        [(1, "new york city is big"),
         (2, "new york city never sleeps"),
         (3, "new york state of mind"),
         (4, "york minster england")],
        "doc_id INT, text STRING")
    toks = ws_tokens(docs)
    table = build_freetext_table(toks)
    table = spark.createDataFrame(table.collect(), table.schema)  # frozen

    for ctx in ("new york", "york"):
        a = [(r["word"], float(r["score"]))
             for r in free_text_suggest(toks, ctx, k=5).collect()]
        b = [(r["word"], float(r["score"]))
             for r in free_text_suggest(table, ctx, k=5).collect()]
        assert a == b

    plan = free_text_suggest(
        table, "new york", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
