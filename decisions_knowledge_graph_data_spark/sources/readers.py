"""Source/sink wrappers (SURVEY.md §2.1).

The reference reads Postgres (SELECT-only), JSONL batch files, per-decision
JSON directories, and CSV dimensions; it writes JSONL, per-key JSON files,
and aggregated result files. Spark-native equivalents, one function each —
thin by design: Catalyst pushes predicates/projections into every one of
these scans, which is the whole point of replacing hand-written SQL.

Per-row-file sinks are an artifact of the reference's Node.js runtime, not
a semantic (SURVEY.md §2.1 note); the equivalent durability comes from
atomic per-stage table writes (plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Table scan (`dbQuery` analog): predicates/column pruning arrive via
    the caller's .filter/.select and push down into the scan."""
    return spark.read.format(fmt).load(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSONL reader (`ResultProcessor.ts:300-317`): Spark's native JSON
    format is line-delimited. An explicit schema avoids a sampling pass —
    always pass one in production."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_dir(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Per-key JSON directory reader (`merge_full_data.ts:47-68`): 64k
    single-object files become one DataFrame; the (decision_id, language)
    key is ordinary columns, not a filename convention."""
    return spark.read.schema(schema).option("multiLine", True).json(path)


def read_csv_dim(spark: SparkSession, path: str) -> DataFrame:
    """CSV dimension load (court-mapping.csv analog) — caller should wrap
    in F.broadcast() at join time."""
    return spark.read.option("header", True).csv(path)


def static_rows(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Static in-memory source (`ConcurrentRunner.ts:163-166`)."""
    return spark.createDataFrame(rows, schema)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL writer (`BatchJobGenerator.ts:262-275`)."""
    df.write.mode(mode).json(path)


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None,
                mode: str = "overwrite", fmt: str = "parquet") -> None:
    """Aggregated sink (`ConcurrentProcessor.ts:507-533`): one atomic
    table write per stage output. With an Iceberg catalog configured this
    becomes ``df.writeTo(table).append()`` — same call shape."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
