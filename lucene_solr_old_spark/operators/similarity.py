"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k — `F.zip_with` dot product + `F.aggregate`
    sequential fold (deterministic summation order), Catalyst-only plan,
    then TakeOrderedAndProject top-k.  The baseline ANN path.
  * sign-random-projection LSH buckets — deterministic md5-derived
    hyperplanes; bucket = bit-packed dot-product signs.  The scale path:
    candidate generation becomes an equi-join on bucket, brute-force only
    within buckets.

At 100 TB the brute-force path is a full scan per query — fine for batch
scoring of a query SET (broadcast the queries, one pass), wrong for
interactive lookup; the LSH bucket table is the indexed variant.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

__all__ = ["cosine_topk", "cosine_score_col", "srp_planes", "lsh_buckets",
           "ann_search", "assign_clusters", "kmeans_fit", "ivf_search"]


def cosine_score_col(vec_col, query: list[float]):
    """cosine(vec_col, query) as a Catalyst expression (float64)."""
    q = F.array(*[F.lit(float(x)).cast("double") for x in query])
    prods = F.zip_with(vec_col, q, lambda x, y: x.cast("double") * y)
    dot = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    sq = F.aggregate(
        F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    qnorm = sum(float(x) * float(x) for x in query) ** 0.5
    return dot / (F.sqrt(sq) * F.lit(qnorm))


def cosine_topk(emb: DataFrame, query: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: one scan, per-partition top-k + merge."""
    return (emb.select(F.col(id_col),
                       F.round(cosine_score_col(F.col(vec_col), query), 6)
                       .alias("cos"))
            .orderBy(F.desc("cos"), F.asc(id_col))
            .limit(k))


def srp_planes(dim: int, n_planes: int = 8) -> list[list[int]]:
    """Deterministic +/-1 hyperplanes: sign from md5(f"{plane}:{i}") parity.
    Reproducible by any engine with md5 (the SQL oracle recomputes them)."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) & 1 else -1)
        planes.append(row)
    return planes


def lsh_buckets(emb: DataFrame, dim: int, n_planes: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, bucket): bit-packed signs of dot(vec, plane_j).  Join two docs'
    buckets for candidate pairs; brute-force cosine within buckets."""
    planes = srp_planes(dim, n_planes)
    bucket = None
    for j, plane in enumerate(planes):
        parr = F.array(*[F.lit(float(s)).cast("double") for s in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), parr,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        bit = F.when(dot > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.select(F.col(id_col), bucket.cast("long").alias("bucket"))


def _query_bucket(query: list[float], planes: list[list[int]]) -> int:
    b = 0
    for j, plane in enumerate(planes):
        dot = sum(float(x) * s for x, s in zip(query, plane))
        if dot > 0:
            b += 1 << j
    return b


def ann_search(emb: DataFrame, query: list[float], k: int = 10,
               n_planes: int = 8, probes: int = 1,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """End-to-end ANN lookup: LSH bucket the corpus, probe the query's
    bucket plus ``probes`` Hamming-1 neighbor buckets (multiprobe LSH —
    flip the planes whose |dot| is smallest, i.e. the least-confident
    bits), then EXACT cosine rerank of the candidates only.

    (id, cos) top-k.  The scan prunes to the probed buckets before any
    vector math: at 10^12 vectors the candidate set is corpus/2^n_planes
    per probe, and the rerank is the only per-candidate float work."""
    dim = len(query)
    planes = srp_planes(dim, n_planes)
    q_bucket = _query_bucket(query, planes)
    # multiprobe: flip the least-confident bits first
    margins = sorted(
        (abs(sum(float(x) * s for x, s in zip(query, plane))), j)
        for j, plane in enumerate(planes))
    targets = [q_bucket]
    for _m, j in margins[:max(0, probes)]:
        targets.append(q_bucket ^ (1 << j))
    buckets = lsh_buckets(emb, dim, n_planes, id_col, vec_col)
    cand_ids = buckets.where(F.col("bucket").isin(targets)).select(id_col)
    cand = emb.join(cand_ids, id_col, "left_semi")
    return (cand.select(F.col(id_col),
                        F.round(cosine_score_col(F.col(vec_col), query), 6)
                        .alias("cos"))
            .orderBy(F.desc("cos"), F.asc(id_col))
            .limit(k))


def _round_away(x: float, digits: int = 6) -> float:
    """Round half AWAY FROM ZERO — the SQL/Spark ``round`` convention
    (Python's builtin round is banker's and would diverge from engines
    on exact half-boundaries)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def assign_clusters(emb: DataFrame, centroids: list[tuple[int, list[float]]],
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_digits: int = 6) -> DataFrame:
    """(id, cid): nearest centroid by squared L2, distances rounded to
    ``round_digits`` before the argmin and ties broken by lowest cid —
    both choices exist so ANY engine recomputing the assignment lands on
    the same clusters (float64 fold-order noise sits far below the
    rounding quantum).  One narrow pass; k fused distance expressions."""
    structs = []
    for cid, cv in centroids:
        carr = F.array(*[F.lit(float(v)).cast("double") for v in cv])
        diff2 = F.zip_with(F.col(vec_col), carr,
                           lambda x, y: (x.cast("double") - y)
                           * (x.cast("double") - y))
        dist = F.round(F.aggregate(diff2, F.lit(0.0),
                                   lambda acc, v: acc + v), round_digits)
        structs.append(F.struct(dist.alias("dist"),
                                F.lit(int(cid)).cast("long").alias("cid")))
    best = F.array_min(F.array(*structs))
    return emb.select(F.col(id_col), best["cid"].alias("cid"))


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_digits: int = 6) -> list[tuple[int, list[float]]]:
    """IVF coarse-quantizer training: Lloyd's k-means with DETERMINISTIC
    everything — seeds are the k lowest-id vectors (cid = seed order),
    every centroid component rounds half-away to ``round_digits`` after
    each mean, and assignment uses :func:`assign_clusters`' rounded
    argmin.  The result is bit-reproducible across engines and reruns,
    which is what lets the IVF index be rebuilt incrementally without
    invalidating old bucket assignments.

    Scale shape per iteration: one narrow assignment pass fused into ONE
    map-side-combinable aggregate (unrolled per-dimension sums -> k rows
    to the driver), then centroids broadcast back as literals.  A cluster
    that goes empty keeps its previous centroid."""
    rows = (emb.orderBy(id_col).limit(k)
            .select(id_col, vec_col).collect())
    cents = [(i, [_round_away(v, round_digits) for v in r[vec_col]])
             for i, r in enumerate(rows)]
    dim = len(cents[0][1])
    for _ in range(iters):
        a = assign_clusters(emb, cents, id_col, vec_col, round_digits)
        joined = emb.select(id_col, vec_col).join(a, id_col)
        sums = joined.groupBy("cid").agg(
            F.count("*").alias("n"),
            *[F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
              for i in range(dim)]).collect()
        new = {r["cid"]: [_round_away(r[f"s{i}"] / r["n"], round_digits)
                          for i in range(dim)] for r in sums}
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    return cents


def ivf_search(emb: DataFrame, query: list[float],
               centroids: list[tuple[int, list[float]]],
               k: int = 10, nprobe: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_digits: int = 6) -> DataFrame:
    """IVF-flat ANN: pick the ``nprobe`` centroids closest to the query
    (driver-side — k distances), scan ONLY their clusters, exact cosine
    rerank inside.  (id, cos) top-k.

    This is the inverted-file counterpart of :func:`ann_search`'s LSH
    path: the coarse quantizer prunes the corpus to ~nprobe/k of its
    vectors before any per-candidate float work, and the cluster
    assignment is a pushable equi-filter on a precomputed cid column when
    the assignment is materialized alongside the vectors."""
    qd = [
        (_round_away(sum((float(x) - c) ** 2 for x, c in zip(query, cv)),
                     round_digits), cid)
        for cid, cv in centroids]
    probes = [cid for _d, cid in sorted(qd)[:max(1, nprobe)]]
    assign = assign_clusters(emb, centroids, id_col, vec_col, round_digits)
    cands = emb.join(assign.where(F.col("cid").isin(probes)), id_col)
    return cosine_topk(cands, query, k, id_col, vec_col)
