"""Custom source via the Spark 4 Python DataSource API.

The engine's other sources (parquet/ORC/JSONL/CSV/versioned) ride
built-in readers; this module exercises the NEW extension surface —
``pyspark.sql.datasource`` — that lets a pure-Python source plug into
the scan planner with its own partitioning. The reference's equivalent
surface is its pluggable ingest step (SURVEY.md §2.1); here the
Spark-native shape is:

* ``DataSource.schema()`` declares the scan schema (column pruning
  still applies on top),
* ``DataSourceReader.partitions()`` is the PARALLELISM contract: each
  ``InputPartition`` becomes one Spark task, so a 1000-executor
  cluster scans a source exactly as wide as the partition list this
  method returns — the method where a custom source must encode its
  split strategy (here: contiguous id ranges),
* ``read(partition)`` runs ON the executor, yielding rows (or pyarrow
  RecordBatches for vectorized sources) for just its split.

``RangeHashDataSource`` is the deterministic demonstrator: rows
``(id, h = md5(id), bucket = int(h[:2],16) % n_buckets)`` over
``[0, n)`` — a pure function of the options, so any engine can
reproduce it (the board query's DuckDB oracle rebuilds it from
``range(n)``), and generation is embarrassingly parallel with zero
shuffle/IO. Registration is per-session::

    spark.dataSource.register(RangeHashDataSource)
    spark.read.format("range_hash").option("n", 100000).load()
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_BUCKETS = 16


class RangeHashDataSource(DataSource):
    """``format("range_hash")`` — deterministic (id, md5, bucket) rows.

    Options: ``n`` (row count, default 1000), ``partitions`` (task
    count, default 8 — at scale set ≈ 2-3× executor cores; each
    partition is an independent contiguous id range).
    """

    @classmethod
    def name(cls) -> str:
        return "range_hash"

    def schema(self) -> str:
        return "id bigint, h string, bucket int"

    def reader(self, schema) -> "RangeHashReader":
        return RangeHashReader(self.options)


class RangeHashReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("partitions", 8))
        if self.n < 0:
            raise ValueError("n must be >= 0")
        if self.n_parts < 1:
            raise ValueError("partitions must be >= 1")

    def partitions(self) -> list[InputPartition]:
        # contiguous ranges, remainder spread over the first splits so
        # sizes differ by at most one row (no straggler partition)
        step, rem = divmod(self.n, self.n_parts)
        parts, lo = [], 0
        for i in range(self.n_parts):
            hi = lo + step + (1 if i < rem else 0)
            if hi > lo:
                parts.append(InputPartition((lo, hi)))
            lo = hi
        # Spark requires >=1 partition even for an empty source
        return parts or [InputPartition((0, 0))]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            h = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, h, int(h[:2], 16) % N_BUCKETS)
