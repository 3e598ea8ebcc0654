"""Supplementary benchmarks for the r6 optimization round (bench.py is
frozen for measurement — this file carries the noop-sink isolation runs
per guide §1.4 and the dictionary-scaling probe for the pruned
fuzzy/spell expansion).

Prints one JSON line:
  {"metric": "r6_extra", "stages": {...sec...}, "fuzzy_scaling": {...}}

Stages (all computed from the parquet/pages inputs inside the timed
window; the noop sink evaluates every column of every row):
  * clean_stack_noop     — pii->c4->gopher->split, one pass
  * word_counts_noop     — BPE pre-token counting (Arrow partial counts)
  * compress_encode      — block codec over the 300k-page index
  * fused_build_noop     — the zero-persist fused analysis+inversion pass
  * spell_expand_1x/1000x — spellcheck candidate expansion against the
    natural ~5k-term dictionary and a synthetically ~1000x-inflated one
    (~5M terms), with unpruned full-scan references; fuzzy_scaling also
    records how many terms survive the length-band/anchor prefilter —
    i.e. how many exact distance computations actually run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from lucene_solr_old_spark.session import get_spark  # noqa: E402
from lucene_solr_old_spark.sources.pages import pages_dataframe  # noqa: E402
from lucene_solr_old_spark.operators.indexer import (build_index,  # noqa: E402
                                                     compress_index)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
    spark = get_spark("bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    stages: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        stages[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return out

    pages = pages_dataframe(spark, n_pages, seed=42,
                            num_partitions=cpus * 2).persist()
    pages.count()

    # --- cleaning stack (the clean_300k composition), noop-isolated ------
    from lucene_solr_old_spark.operators import cleaning as CL
    from lucene_solr_old_spark.operators.sampling import hash_split
    base = pages.select("url", "text")
    p = CL.pii_scrub(base, key_col="url", text_col="text") \
        .select("url", F.col("text_clean").alias("text"))
    c4 = CL.c4_line_filter(p, key_col="url", text_col="text", min_lines=2)
    kept = c4.where("page_keep").select("url",
                                        F.col("text_clean").alias("text"))
    g = CL.gopher_quality_filter(kept, key_col="url", text_col="text",
                                 min_words=20)
    full = hash_split(g.where("keep"),
                      {"train": 0.9, "val": 0.05, "test": 0.05},
                      key_col="url")
    timed("clean_stack_noop", lambda: noop(full))

    # --- BPE word counting, noop-isolated --------------------------------
    from lucene_solr_old_spark.operators import bpe as B
    wc = B.word_counts(pages, key_col="url", text_col="text")
    timed("word_counts_noop", lambda: noop(wc))

    # --- fused build + compression ---------------------------------------
    nseg = min(cpus, 16)

    def build():
        idx = build_index(pages, key_col="url", html_col="html",
                          num_segments=nseg, analyzer="english",
                          persist_termdoc=False)
        noop(idx.postings)
        return build_index(pages, key_col="url", html_col="html",
                           num_segments=nseg, analyzer="english")

    pidx = timed("fused_build_noop", build)
    pidx.postings.count()
    pidx.collection_stats()
    timed("compress_encode",
          lambda: noop(compress_index(pidx).postings))

    # --- pruned spell/fuzzy expansion vs dictionary size ------------------
    from lucene_solr_old_spark.operators.spell import (edit_candidate_pred,
                                                       spellcheck)
    td = pidx.terms_dict()
    n_terms = td.count()
    # inflate ~1000x with distinct synthetic terms (suffix keeps them
    # unique and realistic-length) — the web-scale-dictionary stand-in;
    # persist so both probes scan materialized data
    copies = int(os.environ.get("SPARK_GRAFT_DICT_COPIES", "999"))
    big = td.unionByName(
        td.crossJoin(spark.range(copies).select(F.col("id").alias("_i")))
        .select(F.concat(F.col("term"), F.lit("x"),
                         F.col("_i").cast("string")).alias("term"),
                "df", "ttf")).persist()
    n_big = big.count()

    class _FakeIdx:
        def __init__(self, terms):
            self._t = terms

        def terms_dict(self):
            return self._t

    def expand(terms_df):
        fake = _FakeIdx(terms_df)
        from lucene_solr_old_spark.operators import spell as SP
        t = SP._global_terms(fake).where(
            edit_candidate_pred("relatinal", 2))
        return (t.withColumn("dist", F.levenshtein(
                    F.col("term"), F.lit("relatinal"), 2))
                .where(F.col("dist") > 0)
                .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
                .limit(5).collect())

    def expand_unpruned(terms_df):
        return (terms_df.withColumn("dist", F.levenshtein(
                    F.col("term"), F.lit("relatinal")))
                .where((F.col("dist") <= 2) & (F.col("dist") > 0))
                .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
                .limit(5).collect())

    td_p = td.persist()
    td_p.count()
    r1 = timed("spell_expand_1x", lambda: expand(td_p))
    r2 = timed("spell_expand_1000x", lambda: expand(big))
    u1 = timed("spell_unpruned_1x", lambda: expand_unpruned(td_p))
    u2 = timed("spell_unpruned_1000x", lambda: expand_unpruned(big))
    assert [tuple(r) for r in r1] == [tuple(r) for r in u1]
    # how many terms survive the prefilter = how many exact distances run
    surv = big.where(edit_candidate_pred("relatinal", 2)).count()

    print(json.dumps({
        "metric": "r6_extra", "unit": "sec", "stages": stages,
        "fuzzy_scaling": {
            "dict_terms_1x": n_terms, "dict_terms_big": n_big,
            "prefilter_survivors_big": surv,
            "pruned_growth": round(stages["spell_expand_1000x"]
                                   / max(stages["spell_expand_1x"], 1e-9), 2),
            "unpruned_growth": round(
                stages["spell_unpruned_1000x"]
                / max(stages["spell_unpruned_1x"], 1e-9), 2),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
