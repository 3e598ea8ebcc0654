"""IVF ANN: deterministic k-means coarse quantizer + probe search
(operators/similarity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.similarity import (
    _round_away, assign_clusters, cosine_topk, ivf_search, kmeans_fit)


@pytest.fixture(scope="module")
def emb(spark):
    # two tight clusters on opposite corners + ids interleaved so seed
    # order is not cluster order
    rows = []
    for i in range(40):
        base = 1.0 if i % 2 == 0 else -1.0
        vec = [base + (i % 7) * 1e-3] * 4
        rows.append((i, vec))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").persist()


def test_round_away_matches_sql_convention():
    assert _round_away(0.1234565, 6) == 0.123457   # half up
    assert _round_away(-0.1234565, 6) == -0.123457  # away from zero
    assert _round_away(1.0, 6) == 1.0


def test_kmeans_deterministic_and_converges(spark, emb):
    c1 = kmeans_fit(emb, k=2, iters=3)
    c2 = kmeans_fit(emb.repartition(5), k=2, iters=3)
    assert c1 == c2                                  # partition-independent
    # the two centroids sit near +1 and -1 (order = seed order: vec 0 is
    # the +1 cluster, vec 1 the -1 cluster)
    assert c1[0][1][0] == pytest.approx(1.003, abs=2e-3)
    assert c1[1][1][0] == pytest.approx(-0.997, abs=2e-3)


def test_assign_clusters_separates(spark, emb):
    cents = kmeans_fit(emb, k=2, iters=2)
    a = {r["vec_id"]: r["cid"] for r in
         assign_clusters(emb, cents).collect()}
    assert all(a[i] == 0 for i in range(0, 40, 2))
    assert all(a[i] == 1 for i in range(1, 40, 2))


def test_empty_cluster_keeps_centroid(spark):
    # all points identical: second seed's cluster is empty after assign
    # (ties go to cid 0) and must keep its previous centroid
    rows = [(i, [1.0, 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(df, k=2, iters=2)
    assert cents[1][1] == [1.0, 1.0]


def test_ivf_search_matches_bruteforce_on_probed_recall(spark, emb):
    cents = kmeans_fit(emb, k=2, iters=2)
    q = [1.0, 1.0, 1.0, 1.0]
    ivf = [r["vec_id"] for r in
           ivf_search(emb, q, cents, k=5, nprobe=1).collect()]
    brute = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    # the query lives squarely in cluster 0: probing 1 cluster already
    # reproduces the exact brute-force top-5
    assert ivf == brute


def test_ivf_search_prunes_to_probed_clusters(spark, emb):
    cents = kmeans_fit(emb, k=2, iters=2)
    q = [1.0, 1.0, 1.0, 1.0]
    out = ivf_search(emb, q, cents, k=40, nprobe=1).collect()
    # nprobe=1 scans only the +1 cluster: half the corpus
    assert len(out) == 20
    assert all(r["vec_id"] % 2 == 0 for r in out)


def test_index_vectors_ivf_equals_inplan_and_prunes(spark, emb, tmp_path):
    """The materialized (vec_id, embedding, cid) table gives identical
    results to the in-plan assignment AND its probe is partition-pruned
    at the parquet scan (the r3 verdict's required evidence)."""
    from lucene_solr_old_spark.operators.similarity import index_vectors

    cents = kmeans_fit(emb, k=2, iters=2)
    path = str(tmp_path / "vecidx")
    idx = index_vectors(emb, centroids=cents, path=path)
    q = [1.0, 1.0, 1.0, 1.0]
    via_index = ivf_search(emb, q, cents, k=5, nprobe=1,
                           index=idx).collect()
    in_plan = ivf_search(emb, q, cents, k=5, nprobe=1).collect()
    assert [(r["vec_id"], r["cos"]) for r in via_index] == \
           [(r["vec_id"], r["cos"]) for r in in_plan]

    # partition pruning: the cid filter must reach the scan as a
    # PartitionFilters entry, not a post-scan Filter
    plan = idx.where(F.col("cid") == 0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan.split(
        "PartitionFilters", 1)[1][:200], plan


def test_index_vectors_lsh_equals_inplan(spark, emb, tmp_path):
    from lucene_solr_old_spark.operators.similarity import (ann_search,
                                                            index_vectors)

    path = str(tmp_path / "vecidx_lsh")
    idx = index_vectors(emb, dim=4, n_planes=4, path=path)
    q = [1.0, 1.0, 1.0, 1.0]
    via_index = ann_search(emb, q, k=5, n_planes=4, probes=1,
                           index=idx).collect()
    in_plan = ann_search(emb, q, k=5, n_planes=4, probes=1).collect()
    assert [(r["vec_id"], r["cos"]) for r in via_index] == \
           [(r["vec_id"], r["cos"]) for r in in_plan]


def test_kmeans_fit_dim_robust(spark):
    """dim=256: the posexplode centroid aggregate keeps the plan narrow
    (no 256-column unroll) and still converges to the two planted
    clusters."""
    rows = []
    for i in range(30):
        base = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, [base + (i % 5) * 1e-3] * 256))
    emb256 = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(emb256, k=2, iters=2)
    assert len(cents) == 2 and all(len(cv) == 256 for _c, cv in cents)
    signs = sorted(1 if cv[0] > 0 else -1 for _c, cv in cents)
    assert signs == [-1, 1]
    a = assign_clusters(emb256, cents)
    counts = {r["cid"]: r["n"] for r in
              a.groupBy("cid").agg(F.count("*").alias("n")).collect()}
    assert sorted(counts.values()) == [15, 15]


def test_embedding_neardup_pairs(spark):
    from lucene_solr_old_spark.operators.similarity import \
        embedding_neardup_pairs

    # 0/1 duplicates (exact + scaled), 2/3 near-orthogonal noise
    rows = [
        (0, [1.0, 0.0, 0.5, 0.2]),
        (1, [2.0, 0.0, 1.0, 0.4]),     # 0 scaled x2 -> cos 1.0
        (2, [-1.0, 1.0, 0.0, 0.0]),
        (3, [0.0, -1.0, 1.0, -0.3]),
        (4, [1.0, 0.01, 0.5, 0.2]),    # near-dup of 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["a"], r["b"]): r["cos"]
           for r in embedding_neardup_pairs(emb, dim=4, threshold=0.99,
                                            n_planes=4).collect()}
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 4) in got and got[(0, 4)] > 0.99
    assert all(a < b for a, b in got)
    assert not any({2, 3} & {a, b} for a, b in got)


def test_embedding_neardup_is_bucket_join_not_cartesian(spark):
    from lucene_solr_old_spark.operators.similarity import \
        embedding_neardup_pairs

    emb = spark.createDataFrame(
        [(i, [float(i % 7) - 3.0] * 8) for i in range(40)],
        "vec_id long, embedding array<float>")
    plan = embedding_neardup_pairs(emb, dim=8, threshold=0.9)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan  # candidate gen is the bucket equi-join


def test_index_param_mismatch_raises(spark, emb, tmp_path):
    """A prebuilt index probed with different build parameters would hit
    the wrong buckets — the probe must ERROR, not return wrong/empty
    neighbors (round-4 advice: similarity.py index= validation)."""
    from lucene_solr_old_spark.operators.similarity import (ann_search,
                                                            index_vectors)

    q = [1.0, 1.0, 1.0, 1.0]
    # LSH: n_planes mismatch
    idx = index_vectors(emb, dim=4, n_planes=4)
    with pytest.raises(ValueError, match="n_planes"):
        ann_search(emb, q, k=3, n_planes=8, index=idx)
    # matching params pass
    assert ann_search(emb, q, k=3, n_planes=4, index=idx).count() == 3
    # IVF: different codebook
    cents = kmeans_fit(emb, k=2, iters=2)
    ividx = index_vectors(emb, centroids=cents)
    other = [(cid, [v + 1.0 for v in cv]) for cid, cv in cents]
    with pytest.raises(ValueError, match="centroid_fp"):
        ivf_search(emb, q, other, k=3, index=ividx)
    assert ivf_search(emb, q, cents, k=3, index=ividx).count() == 3
    # wrong kind entirely: LSH index passed to ivf_search
    with pytest.raises(ValueError, match="cid"):
        ivf_search(emb, q, cents, k=3, index=idx)


def test_load_vector_index_restores_fingerprint(spark, emb, tmp_path):
    """Partition columns lose schema metadata through parquet; the sidecar
    reload path must restore the fingerprint so stored indexes stay
    validated across sessions."""
    from lucene_solr_old_spark.operators.similarity import (
        ann_search, index_vectors, load_vector_index)

    path = str(tmp_path / "vidx")
    index_vectors(emb, dim=4, n_planes=4, path=path)
    loaded = load_vector_index(spark, path)
    assert loaded.schema["bucket"].metadata.get("n_planes") == 4
    q = [1.0, 1.0, 1.0, 1.0]
    with pytest.raises(ValueError, match="n_planes"):
        ann_search(emb, q, k=3, n_planes=8, index=loaded)
    assert ann_search(emb, q, k=3, n_planes=4, index=loaded).count() == 3
    # an unfingerprinted hand-built table is still accepted (precondition)
    bare = spark.read.parquet(path)
    assert ann_search(emb, q, k=3, n_planes=4, index=bare).count() == 3
