"""SparkSession factory tuned for the pipeline.

Settings chosen for scale (see SURVEY.md §4): AQE on (skew-join splitting +
shuffle coalescing), Arrow on (the trie scanner is an Arrow-batched
``mapInPandas``), shuffle partitions sized for the local harness but meant
to be overridden via ``spark-submit --conf`` on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgpipe",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4.1's ChecksumCheckpointFileManager deadlocks on local-FS
        # state-store commits under applyInPandasWithState (awaitResult in
        # createWithChecksum never completes); checksums are for detecting
        # checkpoint corruption on remote object stores, safe to disable here
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        .config("spark.driver.memory", os.environ.get("KGPIPE_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def cpu_partition_count(spark, default: int = 200) -> int:
    """Explicit partition count for CPU-bound (Python) stages: AQE may
    coalesce a bare repartition to byte-sized partitions and serialize the
    stage, so callers pin the count — spark.sql.shuffle.partitions when
    numeric, else the cluster default parallelism."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        try:
            return int(spark.sparkContext.defaultParallelism)
        except Exception:
            return default
