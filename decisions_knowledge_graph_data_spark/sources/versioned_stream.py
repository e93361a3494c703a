"""Versioned tables as a Structured-Streaming SOURCE.

``format("versioned_appends")`` turns a versioned table
(``sources/versioned.py``) into a streaming input — the Delta/Iceberg
"streaming from a table" shape, built on the Spark 4 Python DataSource
streaming API (``DataSource.streamReader``):

* **offsets are manifest versions** — O(1) driver state per micro-batch
  (``{"version": N}`` = consumed through commit N), checkpointed by the
  engine like any other source offset;
* **a micro-batch is the net-new files of its version window** —
  ``partitions(start, end)`` diffs the two manifests' file lists on the
  driver (two JSON reads, never a data scan) and emits one
  ``InputPartition`` per new file, so a 1000-executor cluster ingests a
  large append exactly as wide as its file count; ``read()`` runs ON
  the executors via pyarrow;
* **replay is deterministic** — manifests and data files are immutable,
  so re-reading a checkpointed window after a crash yields byte-same
  batches (the property exactly-once sinks need);
* **append-only contract** — a rewrite commit (overwrite / merge /
  delete / compact) inside a window raises instead of silently
  double-delivering rewritten rows (the same refusal as
  ``read_appended``; stream the row-level ``read_changes`` feed when
  you need CDC semantics). The genesis commit is exempt: version 1 is
  the initial data whatever its mode.

Retention caveat: offsets reference manifests, so ``expire_versions``
must keep at least the stream's last-committed version (tag it, or set
``keep_last`` above the consumer lag) — an expired window raises
``FileNotFoundError`` on restart rather than skipping data silently.

Schema: resolved from the CURRENT manifest at planning time; files
written before an additive schema evolution surface the later columns
as NULL (same rule as ``read_snapshot``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .versioned import _read_manifest, current_version, plan_appended_files


class VersionedAppendsDataSource(DataSource):
    """``spark.readStream.format("versioned_appends").option("path",
    root)`` — stream a versioned table's appends. Options: ``path``
    (table root, required), ``starting_version`` (consume commits
    AFTER this version; default 0 = from genesis)."""

    @classmethod
    def name(cls) -> str:
        return "versioned_appends"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("versioned_appends requires option 'path'")
        return root

    def schema(self) -> StructType:
        root = self._root()
        v = current_version(root)
        if v is None:
            raise FileNotFoundError(f"no committed version at {root}")
        return StructType.fromJson(_read_manifest(root, v)["schema"])

    def streamReader(self, schema: StructType) -> "VersionedAppendsStreamReader":
        return VersionedAppendsStreamReader(
            self._root(), schema,
            int(self.options.get("starting_version", 0)),
        )


class VersionedAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: StructType, starting: int) -> None:
        self.root = root
        self.schema_json = schema.json()
        self.planned_fields = set(schema.fieldNames())
        self.starting = starting

    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        v = current_version(self.root)
        return {"version": max(v or 0, self.starting)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return [InputPartition(None)]  # empty batch: one no-op split
        files, m_hi = plan_appended_files(self.root, lo, hi,
                                          genesis_exempt=True)
        # schema drift check: a column added DURING a running query
        # would be silently dropped from delivered rows (the plan is
        # fixed at query start) and never redelivered — fail loudly so
        # the operator restarts the query with the evolved schema (the
        # Delta table-stream contract)
        hi_fields = {f["name"] for f in m_hi["schema"]["fields"]}
        extra = hi_fields - self.planned_fields
        if extra:
            raise ValueError(
                f"table {self.root} gained column(s) {sorted(extra)} "
                f"after this stream was planned — restart the query to "
                "pick up the evolved schema (delivering rows without "
                "them would silently drop data)"
            )
        if not files:
            return [InputPartition(None)]
        return [
            InputPartition((os.path.join(self.root, f), self.schema_json))
            for f in files
        ]

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _St

        path, schema_json = partition.value
        expected = to_arrow_schema(_St.fromJson(json.loads(schema_json)))
        # stream record batches instead of materializing the file: one
        # InputPartition per file means a large appended file would
        # otherwise sit whole (twice, after the cast/pad copy) in one
        # Python worker's memory
        pf = pq.ParquetFile(path)
        present = set(pf.schema_arrow.names)
        read_cols = [f.name for f in expected if f.name in present]
        for rb in pf.iter_batches(columns=read_cols):
            t = pa.Table.from_batches([rb])
            cols = []
            for field in expected:
                if field.name in present:
                    cols.append(t[field.name].cast(field.type))
                else:  # pre-evolution file: added column reads as NULL
                    cols.append(pa.nulls(t.num_rows, type=field.type))
            yield from pa.Table.from_arrays(cols, schema=expected).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are engine-checkpointed; nothing source-side
