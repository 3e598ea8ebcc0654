"""Deterministic sampling / mixing / splitting for training-data pipelines.

``DataFrame.sample`` is seed-stable only for a FIXED partitioning: any
repartition, AQE re-plan, or input reorder changes which rows survive.
These operators decide membership from a CONTENT hash (md5 of the key),
so the same document always lands on the same side of every
sample/split — across reruns, cluster sizes, and partition layouts.
That property is what makes 100 TB pipelines reproducible and is the
standard trick (hash-mod sharding) in published web-corpus pipelines.

Mechanics: md5(key) is uniform over [0, 16^32); a rate r keeps rows with
``md5(key) < hex_threshold(r)`` — a plain string comparison on the hex
digest (no bigint conversion, so the same predicate runs verbatim in any
engine).  All operators are per-row Catalyst expressions: zero shuffles,
they compose with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hash_threshold", "hash_sample", "mix_sources", "hash_split"]

_HEX_DIGITS = 12  # threshold resolution: 16^-12 ~ 3.6e-15 rate granularity


def hash_threshold(rate: float) -> str:
    """The 32-hex-char threshold T with P(md5(x) < T) = rate."""
    rate = min(max(rate, 0.0), 1.0)
    if rate >= 1.0:
        return "g"  # compares above every hex digest
    scaled = int(rate * (16 ** _HEX_DIGITS))
    return format(scaled, f"0{_HEX_DIGITS}x") + "0" * (32 - _HEX_DIGITS)


def _salted(key_col: str, seed: str):
    # the seed concatenates INTO the hash input — a different seed is an
    # independent sample, same seed is bit-identical forever
    return F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed)))


def hash_sample(docs: DataFrame, rate: float, key_col: str = "doc_id",
                seed: str = "") -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by content hash."""
    return docs.where(_salted(key_col, seed) < F.lit(hash_threshold(rate)))


def mix_sources(docs: DataFrame, weights: dict[str, float],
                source_col: str = "source", key_col: str = "doc_id",
                seed: str = "") -> DataFrame:
    """Training-mixture sampling: per-source keep rates (e.g. downsample
    Common Crawl to 30%, keep Wikipedia at 100%).  Sources absent from
    ``weights`` are dropped — the mixture is explicit."""
    thresholds = {s: hash_threshold(r) for s, r in weights.items()}
    tmap = F.create_map(*[x for s in sorted(thresholds)
                          for x in (F.lit(s), F.lit(thresholds[s]))])
    return docs.where(tmap[F.col(source_col)].isNotNull()
                      & (_salted(key_col, seed) < tmap[F.col(source_col)]))


def hash_split(docs: DataFrame, fractions: dict[str, float],
               key_col: str = "doc_id", seed: str = "",
               out_col: str = "split") -> DataFrame:
    """Append ``out_col`` assigning each row to exactly one named split
    ("train"/"val"/"test"...) by consecutive hash ranges — disjoint and
    exhaustive when the fractions sum to 1 (the remainder, if any, goes to
    the LAST split so float dust never drops rows)."""
    names = list(fractions)
    h = _salted(key_col, seed)
    cum = 0.0
    bounds = []
    for n in names[:-1]:
        cum += fractions[n]
        bounds.append((n, hash_threshold(cum)))
    expr = None
    for n, t in bounds:  # first matching range wins (CASE order)
        cond = h < F.lit(t)
        expr = F.when(cond, F.lit(n)) if expr is None \
            else expr.when(cond, F.lit(n))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(
        F.lit(names[-1]))
    return docs.withColumn(out_col, expr)
