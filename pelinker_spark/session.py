"""SparkSession builder tuned for this engine.

Local-mode settings mirror what we would set on a real cluster: AQE on
(runtime re-plan + skew-join splitting), Arrow exchange on (every pandas
UDF crosses the JVM/Python boundary in columnar batches), explicit shuffle
partition count sized to the parallelism level rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pelinker_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local[N] thread count; default $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: default = cores (local mode: more just adds task
    scheduling overhead; on a real cluster this scales with executors).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # This engine's rows are cheap in bytes but expensive in CPU
        # (pandas UDFs, mention explosion): byte-based task sizing starves
        # parallelism. Keep file splits small and never let AQE coalesce
        # below the core count.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m"
        )
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true"
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
