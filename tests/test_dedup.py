"""Dedup scale-path semantics: 64-bit simhash, Hamming bands, df-capped
candidate generation."""

import pytest

from lucene_solr_old_spark.operators.dedup import (
    ngram_jaccard_pairs, simhash, simhash_candidate_pairs, ws_tokens)


@pytest.fixture(scope="module")
def docs(spark):
    boiler = "shared boilerplate header row "  # hot shingles
    rows = [
        (1, boiler + "alpha beta gamma delta epsilon zeta"),
        (2, boiler + "alpha beta gamma delta epsilon eta"),   # near-dup of 1
        (3, boiler + "totally different content here now"),
        (4, "no header unique text entirely separate words"),
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_simhash64_is_64bit_and_signed(spark, docs):
    vals = {r["key"]: r["simhash"]
            for r in simhash(ws_tokens(docs), bits=64).collect()}
    assert len(vals) == 4
    # near-dups land close in Hamming space; spread must exceed 16 bits
    assert any(abs(v) > (1 << 20) for v in vals.values())
    h12 = bin((vals[1] ^ vals[2]) & ((1 << 64) - 1)).count("1")
    h13 = bin((vals[1] ^ vals[3]) & ((1 << 64) - 1)).count("1")
    assert h12 < h13, (h12, h13)


def test_simhash_bands_pigeonhole(spark, docs):
    sim = simhash(ws_tokens(docs), bits=64)
    vals = {r["key"]: r["simhash"] for r in sim.collect()}
    pairs = {(r["a"], r["b"])
             for r in simhash_candidate_pairs(sim, bands=4).collect()}
    # pigeonhole guarantee: any pair within Hamming distance < 4 MUST be a
    # candidate (shares at least one exact 16-bit band)
    keys = sorted(vals)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            hd = bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
            if hd < 4:
                assert (a, b) in pairs, (a, b, hd)


def test_ngram_jaccard_cap_drops_boilerplate_only_pairs(spark, docs):
    toks = ws_tokens(docs)
    full = {(r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(toks, n=3, threshold=0.05).collect()}
    capped = {(r["a"], r["b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(toks, n=3, threshold=0.05,
                                           max_shingle_df=2).collect()}
    # 1-2 share rare shingles -> kept, with the SAME exact jaccard
    assert (1, 2) in capped
    assert capped[(1, 2)] == full[(1, 2)]
    # 1-3 / 2-3 share ONLY the boilerplate shingles -> dropped by the cap
    assert (1, 3) in full and (1, 3) not in capped
    assert (2, 3) in full and (2, 3) not in capped


def test_ann_multiprobe_superset_and_exact_rerank(spark):
    """Multiprobe widens the candidate set; rerank is exact cosine, so
    probed results converge to brute force as probes grow."""
    import random

    from lucene_solr_old_spark.operators.similarity import (ann_search,
                                                            cosine_topk)

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    q = rows[0][1]
    brute = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    got0 = {r["vec_id"] for r in
            ann_search(emb, q, k=5, n_planes=6, probes=0).collect()}
    got4 = {r["vec_id"] for r in
            ann_search(emb, q, k=5, n_planes=6, probes=4).collect()}
    # query vector itself always survives (same bucket, cos=1)
    assert 0 in got0 and 0 in got4
    # more probes -> recall of the true top-5 can only improve
    assert len(got0 & set(brute)) <= len(got4 & set(brute))
