"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same configs are what we would
ship to a real cluster via spark-submit (AQE on, Arrow on, sensible
shuffle partitioning). Parallelism is a parameter so the bench can run
the identical job at two cluster sizes (local[8] vs local[32]) to
evidence the scaling-efficiency criterion.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "decisions_kg_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    parallelism: number of local cores (``local[N]``). Defaults to
    ``$SPARK_GRAFT_CPUS`` or 32. On a real cluster this function would
    not set ``master`` at all (spark-submit owns it); locally we pin it.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalesce + skew-join splitting — the built-in half of
        # the skew story (the other half is explicit salting in operators/).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        # Arrow for every pandas-kernel boundary (no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # 128 MiB scan splits: at 100 TB this yields ~800k well-sized input
        # partitions instead of a handful of giant ones.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # ContextCleaner periodic GC (default 30 MIN): dropped
        # localCheckpoint/broadcast blocks are only freed after a driver
        # GC notices their RDDs are unreferenced — a session running many
        # checkpoint-bearing queries back to back accumulates blocks and
        # progressively degrades (measured round 6: monotonically growing
        # per-run times for an identical query). 30 s bounds the
        # accumulation window; parameterised for cluster deployments.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "30s"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
