"""SparkSession factory tuned for the sandbox (local[N]) but with settings
that carry to a real multi-executor cluster unchanged.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime coalesce + skew-join splitting replace hand-tuned
  shuffle-partition counts at every SF.
- Arrow on + large batches: the tagger UDF is the hot stage; batch size
  dominates JVM<->Python overhead.
- shuffle.partitions here defaults to cores for local mode; on a cluster it
  is overridden by --conf (AQE coalesces down anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cliner_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = cores if master.startswith("local") else 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_parallelism(df, factor: int = 2):
    """Repartition iff the source provided fewer splits than cores.

    Single small parquet files (one row group) scan as ONE task, serializing
    every downstream zero-shuffle stage onto one core. At production scale
    (many files / many row groups) the partition count exceeds cores and this
    is a no-op — no extra shuffle is introduced where the source already
    parallelizes.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism * factor)
    return df
