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
           "ann_search"]


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
