"""Bucketed tables: co-located joins without shuffles.

At 100 TB the fact⋈fact equi-join (e.g. mentions ⋈ documents on doc_id)
is the dominant shuffle. Writing both sides bucketed+sorted on the join
key at ingest time moves that cost to write time once; every later join
on the key is exchange-free (bucket pruning + sort-merge within buckets).
This is the Spark-native equivalent of the reference's "preload into a
hash map keyed by composite key" (`DependencyResolver.ts:142-196`) —
except it persists across jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 32,
                   mode: str = "overwrite") -> None:
    """Save as a bucketed+sorted managed table (saveAsTable is required —
    bucket metadata lives in the catalog, not the files)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark, left_table: str, right_table: str, key: str,
                  how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the same key/count: Catalyst plans a
    sort-merge join with NO Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
