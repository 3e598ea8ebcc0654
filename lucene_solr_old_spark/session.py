"""SparkSession helpers with scale-appropriate defaults.

Designed for multi-executor clusters (the engine itself never assumes local
mode); local[N] settings here only serve tests/bench in this sandbox.
AQE is on so skewed query-time joins get runtime splitting
(SURVEY.md §4.2 "skew handling").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "lucene-solr-old-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8))))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # v1 commitJob renames every task file SEQUENTIALLY on the
        # driver — a serial term proportional to output-file count and
        # independent of core count (it capped measured build scaling
        # on this sandbox's single disk).  v2 renames inside each task,
        # overlapped with execution; on a real cluster the same flag
        # is the standard choice for direct-to-table batch writes.
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        # throughput-oriented GC: G1's pause-time tuning costs ~15-25%
        # wall on this allocation-heavy batch profile (parquet encode of
        # nested posting arrays under 16+ writer threads); measured in
        # the BASELINE.md r5 scaling decomposition.  Only effective when
        # this builder launches the JVM (in-process local mode);
        # spark-submit runs pass the same conf on the command line.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # zstd parquet: ~20% fewer output bytes than snappy at equal or
        # better save wall on this profile (nested posting arrays) —
        # measured steady-state 24.5 vs 30.4 MB, 1.7-2.6 s vs 2.8 s on
        # the 300k-page index.  Fewer sink bytes is the right trade when
        # the disk, not the CPU, is the scaling bottleneck (BASELINE.md
        # scaling decomposition).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # let the planner pick shuffled-hash join when its size conditions
        # fit (Spark's own condition: the build side is small per
        # partition) instead of always sort-merge: the collector-side
        # docmeta joins and per-qid windows stop paying two sorts per
        # query.  Not a local-mode trick — this is the standard batch
        # baseline; sort-merge remains the fallback whenever the planner
        # can't prove the hash side fits, and AQE skew handling still
        # applies.  Measured: -1.5-2s on the r6 bench (batch_60q,
        # rank_identity), no regressions.
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    if master:
        builder = builder.master(master)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def package_zip(out_dir: str | None = None) -> str:
    """Zip this package for spark-submit --py-files / addPyFile shipping."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out_dir = out_dir or tempfile.gettempdir()
    zpath = os.path.join(out_dir, "lucene_solr_old_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith((".py",)):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return zpath


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors regardless of driver cwd
    (the local-mode equivalent of ``spark-submit --py-files engine.zip``)."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:  # already added, or non-local FS quirks — non-fatal
        pass
