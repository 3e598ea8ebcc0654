"""lucene_solr_old_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression (NOT a port) of the query and data-processing
capabilities of the reference Lucene/Solr snapshot at /root/reference,
built Spark-first: DataFrame/SQL plans, Arrow-vectorized pandas UDFs for
the text kernels, parquet/Iceberg-style segment-per-partition storage.
See SURVEY.md for the full operator inventory and design rationale.
"""

__version__ = "0.1.0"
