"""Checkpoint/resume + lineage/metrics harness.

Parity: the reference persists per-decision ``state.json`` + ``step-*.json``
and resumes by skipping completed keys (`PipelineOrchestrator.ts:106-157`,
`ConcurrentRunner.ts:194-233`). Spark-first translation (SURVEY.md §4):

  - each stage writes its output table once, atomically, to
    ``{workdir}/{stage}`` with a completion marker;
  - stage-level resume: a completed stage is *read*, not recomputed;
  - row-level resume: an interrupted extraction stage re-runs only the
    keys absent from the partial checkpoint — a **left_anti join** on the
    composite key, the north rule's "resumable from checkpoint";
  - per-partition lineage/metrics rows (``run_metrics``) are appended per
    stage, mirroring ConcurrentSummary (`ConcurrentProcessor.ts:47-63`).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER = "_KG_STAGE_COMPLETE.json"


def stage_path(workdir: str, stage: str) -> str:
    return os.path.join(workdir, stage)


def is_complete(workdir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(stage_path(workdir, stage), MARKER))


def write_stage(df: DataFrame, workdir: str, stage: str, partition_by: list[str] | None = None) -> DataFrame:
    """Materialize a stage table + completion marker; returns the re-read DF
    (so downstream plans read the compact parquet, not the long lineage)."""
    path = stage_path(workdir, stage)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    spark = df.sparkSession
    n = spark.read.parquet(path).count()
    with open(os.path.join(path, MARKER), "w") as f:
        json.dump({"stage": stage, "rows": n, "completed_at": time.time()}, f)
    return spark.read.parquet(path)


def read_stage(spark: SparkSession, workdir: str, stage: str) -> DataFrame:
    return spark.read.parquet(stage_path(workdir, stage))


def resume_filter(incoming: DataFrame, done: DataFrame, keys: list[str]) -> DataFrame:
    """Keys already processed are skipped: left_anti on the composite key
    (ConcurrentRunner.ts:194-233 as a join, not a filesystem scan)."""
    return incoming.join(done.select(*keys).distinct(), keys, "left_anti")


def partition_metrics(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-partition lineage rows: (run_id, stage, partition_id, records).

    ``spark_partition_id`` + groupBy is a map-side-combinable agg — cheap
    even at 10^5 partitions.
    """
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("records"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "records",
        )
    )


def append_metrics(metrics: DataFrame, workdir: str) -> None:
    metrics.write.mode("append").parquet(os.path.join(workdir, "run_metrics"))


def stage_summary(ok: DataFrame, failed: DataFrame, run_id: str, stage: str) -> DataFrame:
    """ConcurrentSummary analog (`ConcurrentProcessor.ts:47-63`): totals,
    success rate — one row per stage."""
    n_ok = ok.count()
    n_fail = failed.count()
    total = n_ok + n_fail
    spark = ok.sparkSession
    return spark.createDataFrame(
        [(run_id, stage, total, n_ok, n_fail,
          float(n_ok) / total if total else 1.0)],
        "run_id string, stage string, total_records long, successful long, "
        "failed long, success_rate double",
    )
