"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship: build the inverted index over the sf0.001
documents table and run a disjunctive BM25 top-10.
``queries()``     — one entry per implemented operator (SURVEY.md §2 +
training-data pipeline ops); see lucene_solr_old_spark/gate.py.
``oracle_sql()``  — the matching DuckDB SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lucene_solr_old_spark import gate  # noqa: E402
from lucene_solr_old_spark.session import ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: index + BM25 top-10."""
    ship_package(spark)
    from lucene_solr_old_spark.operators import search as S

    idx = gate.doc_index(spark, "/root/testdata/sf0.001")
    return S.search_or(idx, "spark join merge", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)
            return fn(spark, sf_dir.rstrip("/"))
        return run

    return {name: wrap(fn) for name, (fn, _sql) in gate.ordered_gate().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in gate.ordered_gate().items()
            if sql is not None}
