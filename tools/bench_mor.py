"""Merge-on-read vs copy-on-write delete cost at scale.

The claim delete_where_mor exists to prove: deleting a handful of
SCATTERED rows (every data file hit — stats cannot prune anything) from
a large table costs a full-table rewrite under copy-on-write, but only
a kilobyte-sized position file under merge-on-read; and the read-side
tax (the anti-join on the touched files) is small and disappears after
compaction absorbs the positions.

One process, strictly sequential legs (measurement hygiene: never two
Spark jobs at once on this box). Usage:

    python tools/bench_mor.py [n_rows] [n_files]   # default 20M, 8

Prints ONE JSON line and a human summary. Numbers are recorded in
BENCH/BASELINE.md.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import decisions_knowledge_graph_data_spark.sources.versioned as V  # noqa: E402


def _dir_bytes(root: str, rel_files) -> int:
    return sum(os.path.getsize(os.path.join(root, f)) for f in rel_files)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("bench_mor")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="bench_mor_")
    cow_root, mor_root = os.path.join(base, "cow"), os.path.join(base, "mor")

    # ~200 scattered doomed rows, one per ~100k — every file is hit, so
    # file stats can never prune the delete (the CoW worst case)
    df = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 97).alias("g"),
        (F.col("id") * 1.0).alias("val"),
        (F.col("id") % 100_003 == 0).cast("int").alias("doomed"),
    ).repartitionByRange(n_files, "id")
    for root in (cow_root, mor_root):
        V.write_snapshot(df, root, stats_cols=["id"])
    table_bytes = _dir_bytes(cow_root, V._read_manifest(cow_root, 1)["files"])

    def agg_count(root):
        return (
            V.read_snapshot(spark, root)
            .groupBy("g").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("val").alias("s"))
            .agg(F.sum("n"), F.sum("s")).collect()[0][0]
        )

    # warm the page cache identically for both tables
    n0_cow, n0_mor = agg_count(cow_root), agg_count(mor_root)
    assert n0_cow == n0_mor == n_rows

    t0 = time.monotonic()
    V.delete_where(spark, cow_root, {"doomed": ("==", 1)})
    t_cow = time.monotonic() - t0
    m_cow = V._read_manifest(cow_root, 2)
    cow_written = _dir_bytes(
        cow_root,
        [f for f in m_cow["files"]
         if f not in set(V._read_manifest(cow_root, 1)["files"])],
    )

    t0 = time.monotonic()
    V.delete_where_mor(spark, mor_root, {"doomed": ("==", 1)})
    t_mor = time.monotonic() - t0
    m_mor = V._read_manifest(mor_root, 2)
    del_rel = sorted({d for dl in V._delete_map(m_mor).values() for d in dl})
    mor_written = _dir_bytes(mor_root, del_rel)
    n_positions = sum(m_mor["delete_counts"].values())

    n_after = n_rows - n_positions

    def timed_read(root):
        # steady-state read: first run pays codegen/JIT warmup, second
        # is the number a repeated scan sees
        assert agg_count(root) == n_after
        t0 = time.monotonic()
        assert agg_count(root) == n_after
        return time.monotonic() - t0

    t_read_cow = timed_read(cow_root)
    t_read_mor = timed_read(mor_root)

    t0 = time.monotonic()
    V.compact_snapshot(spark, mor_root, small_file_bytes=1)
    t_absorb = time.monotonic() - t0
    assert not V._delete_map(V._read_manifest(mor_root, 3))
    t_read_absorbed = timed_read(mor_root)

    out = {
        "metric": "mor_vs_cow_delete",
        "n_rows": n_rows,
        "n_files": n_files,
        "cpus": cpus,
        "table_bytes": table_bytes,
        "n_deleted": n_positions,
        "cow_delete_sec": round(t_cow, 2),
        "cow_bytes_written": cow_written,
        "mor_delete_sec": round(t_mor, 2),
        "mor_bytes_written": mor_written,
        "read_sec_cow": round(t_read_cow, 2),
        "read_sec_mor": round(t_read_mor, 2),
        "absorb_sec": round(t_absorb, 2),
        "read_sec_after_absorb": round(t_read_absorbed, 2),
        "write_amplification_ratio": round(cow_written / max(mor_written, 1)),
    }
    print(json.dumps(out))
    print(
        f"# delete {n_positions} scattered rows from {n_rows:,} "
        f"({table_bytes/1e6:.0f} MB, {n_files} files):\n"
        f"#   CoW  : {t_cow:6.2f}s, wrote {cow_written/1e6:8.1f} MB "
        "(full rewrite — no file prunable)\n"
        f"#   MoR  : {t_mor:6.2f}s, wrote {mor_written/1e3:8.1f} KB "
        f"({out['write_amplification_ratio']}x less)\n"
        f"#   read : CoW {t_read_cow:.2f}s vs MoR {t_read_mor:.2f}s "
        f"(anti-join tax) -> {t_read_absorbed:.2f}s after absorb "
        f"({t_absorb:.2f}s compaction)"
    )
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
