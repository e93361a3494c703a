"""Throughput of the versioned-appends STREAMING source vs the native
batch scan — the honest boundary measurement for
``sources/versioned_stream.py``.

The streaming source rides the Python DataSource API: every batch
crosses executor-side Python workers (pyarrow read → Arrow → JVM),
while a native ``spark.read.parquet`` scan stays in the JVM's
vectorized reader. This bench quantifies that tax so the guidance in
the module docstring is a number, not a vibe: use the native snapshot
read for batch work; the streaming source exists for INCREMENTAL
consumption, where its cost is per-batch (churn-sized), not per-table.

One JVM, sequential legs, same rows both paths, output written to
parquet sinks so both legs pay the write.
Usage:  python tools/bench_stream_source.py [N_ROWS] [CPUS]  (20e6, 8)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/kg_bench_stream_source"


def main(n_rows: int, cpus: int) -> None:
    from pyspark.sql import functions as F

    from decisions_knowledge_graph_data_spark.session import get_spark
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        read_snapshot, write_snapshot,
    )
    from decisions_knowledge_graph_data_spark.sources.versioned_stream import (
        VersionedAppendsDataSource,
    )

    spark = get_spark("bench-stream-source", parallelism=cpus,
                      shuffle_partitions=cpus)
    spark.dataSource.register(VersionedAppendsDataSource)
    shutil.rmtree(WORK, ignore_errors=True)
    root = os.path.join(WORK, "src")
    df = spark.range(0, n_rows).select(
        "id",
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1000)).alias("grp"),
    )
    write_snapshot(df.repartitionByRange(4 * cpus, "id"), root)

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # leg A: native snapshot read -> parquet write (JVM vectorized)
    out_a = os.path.join(WORK, "out_native")
    t_native = timed(
        lambda: read_snapshot(spark, root).write.parquet(out_a))

    # leg B: streaming-source drain of the same table -> parquet sink
    out_b, ckpt = os.path.join(WORK, "out_stream"), os.path.join(WORK, "ck")

    def drain():
        q = (
            spark.readStream.format("versioned_appends")
            .option("path", root).load()
            .writeStream.format("parquet").option("path", out_b)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    t_stream = timed(drain)

    n_a = spark.read.parquet(out_a).count()
    n_b = spark.read.parquet(out_b).count()
    assert n_a == n_b == n_rows, (n_a, n_b, n_rows)

    shutil.rmtree(WORK, ignore_errors=True)
    print(json.dumps({
        "metric": "versioned_stream_source_vs_native", "unit": "sec",
        "n_rows": n_rows, "cpus": cpus,
        "t_native_scan_write": round(t_native, 3),
        "t_stream_drain": round(t_stream, 3),
        "python_source_tax": round(t_stream / t_native, 2),
        "rows_per_sec_stream": int(n_rows / t_stream),
        "rows_match": True,
    }))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(n, c)
