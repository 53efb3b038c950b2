"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so the bench can flip parallelism
(local[8] vs local[32] standing in for N vs 4N executors) without touching
pipeline code. All settings are plain public Spark conf keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "datasketches-cpp-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # parse core count out of local[N] to scale shuffle partitions with it —
    # on a real cluster this would be spark.sql.shuffle.partitions ≈ 2-3×
    # total executor cores (and AQE coalesces down from there)
    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = 2 * int(master[6:-1])
        else:
            shuffle_partitions = 2 * cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch size so per-batch numpy state (shingle matrices,
        # lane mixing buffers) stays well inside executor memory at 100 TB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # image corpora are byte-heavy: finer scan splits keep the
        # signature stages parallel even over a handful of fat files
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
