"""IVM churn-proportionality evidence (plans/ivm.py): measure an
incremental MV refresh against a from-scratch rebuild on the same
source, at a source size where the difference is structural, not noise.

The 100-TB claim being evidenced: a count/sum MV refresh reads only the
change feed (appends → just the added files; clustered CoW rewrites →
just the rewritten files), so refresh cost tracks CHURN while a rebuild
tracks TABLE SIZE. Three churn shapes are timed:

  - append: new rows land as new files — the streaming-rollup case;
    the change feed IS the batch, independent of table size.
  - clustered merge: upserts hit a key range the writer's range
    partitioning localizes to few files (the realistic hot-tail); the
    change feed diffs only those files. (Uniformly random churn keys
    would touch every file and erase the win — that is a physical-
    layout fact, not an IVM defect, and the same fact that makes
    Iceberg MERGE cost depend on clustering.)
  - extremal delete: deletes that kill group minima force the min/max
    group-local rescan — a semi-join-filtered pass over the snapshot.
    This leg is the HONEST cost ceiling: without file-level pruning on
    the group key the rescan reads (and row-filters) the full file set,
    so it is rebuild-shaped; count/sum-only MVs never pay it.

One JVM, sequential legs, medians over repeats for the repeatable legs
(JIT is seconds-scale; the first full rebuild is warm-up and discarded).
Usage:  python tools/bench_ivm.py [N_ROWS] [CPUS]   (defaults 20e6, 8)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/kg_bench_ivm"


def main(n_rows: int, cpus: int) -> None:
    from pyspark.sql import functions as F

    from decisions_knowledge_graph_data_spark.plans.ivm import (
        _full_agg, refresh_agg_mv,
    )
    from decisions_knowledge_graph_data_spark.session import get_spark
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        delete_where, merge_snapshot, read_snapshot, write_snapshot,
    )

    spark = get_spark("bench-ivm", parallelism=cpus,
                      shuffle_partitions=cpus)
    shutil.rmtree(WORK, ignore_errors=True)
    src = os.path.join(WORK, "src")
    mv = os.path.join(WORK, "mv")
    keys, sums, mms = ["grp"], ["x"], ["x"]

    def base_df(lo: int, hi: int):
        # hash-derived grp/x: incompressible like real fact columns (a
        # dense id%k pattern RLE-encodes to almost nothing and makes the
        # rebuild scan unrealistically free); x is bounded so ANSI sum
        # can't overflow. Rows with id < 1000 carry the low-x floor, so
        # the extremal-delete leg deterministically kills group minima.
        return spark.range(lo, hi).select(
            "id",
            F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1000)).alias("grp"),
            (F.pmod(F.xxhash64("id"), F.lit(1_000_000))
             + F.when(F.col("id") < 1000, F.lit(0)).otherwise(F.lit(100))
             ).alias("x"),
        )

    # source: range-partitioned on id so key-local churn is file-local
    write_snapshot(base_df(0, n_rows).repartitionByRange(64, "id"), src,
                   stats_cols=["id"])
    churn = max(n_rows // 200, 1)  # 0.5%

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # full rebuilds (first run is JVM warm-up, discarded)
    t_full = []
    for i in range(4):
        out = os.path.join(WORK, f"rebuild{i}")
        t_full.append(timed(lambda out=out: write_snapshot(
            _full_agg(read_snapshot(spark, src), keys, sums, mms), out)))
        shutil.rmtree(out, ignore_errors=True)
    t_full = statistics.median(t_full[1:])

    # two MVs: the count/sum workhorse (exact scan-free fold under any
    # churn) and the min/max variant (pays a conservative group rescan
    # whenever a rewritten file holds a group extremum)
    mv_mm = os.path.join(WORK, "mv_mm")
    refresh_agg_mv(spark, src, mv, keys, sums)          # initial builds
    refresh_agg_mv(spark, src, mv_mm, keys, sums, mms)  # (untimed)

    # leg 1: append churn (the streaming-rollup shape), 3 repeats
    t_append, hi = [], n_rows
    for _ in range(3):
        write_snapshot(base_df(hi, hi + churn).repartitionByRange(2, "id"),
                       src, mode="append")
        hi += churn
        t_append.append(timed(
            lambda: refresh_agg_mv(spark, src, mv, keys, sums)))
        refresh_agg_mv(spark, src, mv_mm, keys, sums, mms)  # keep current
    t_append = statistics.median(t_append)

    # leg 2: clustered merge churn (hot-tail upsert), 2 repeats; timed
    # on BOTH MVs — the sums fold is exact over the rewritten files'
    # net diff, while min/max rescans the groups whose extrema sat in
    # the rewritten file (the honest min/max cost profile)
    t_merge, t_merge_mm = [], []
    for _ in range(2):
        upd = base_df(n_rows - churn, n_rows).withColumn(
            "x", F.col("x") + 1)
        merge_snapshot(spark, src, upd, "id")
        t_merge.append(timed(
            lambda: refresh_agg_mv(spark, src, mv, keys, sums)))
        t_merge_mm.append(timed(
            lambda: refresh_agg_mv(spark, src, mv_mm, keys, sums, mms)))
    t_merge = statistics.median(t_merge)
    t_merge_mm = statistics.median(t_merge_mm)

    # leg 3: extremal delete — ids 0..999 hold the low-x floor, so most
    # groups' minima die and the min/max MV rescans (its worst case);
    # the id-range predicate keeps the CoW rewrite itself file-local
    delete_where(spark, src, {"id": ("<", 1000)})
    t_del = timed(lambda: refresh_agg_mv(spark, src, mv, keys, sums))
    t_rescan = timed(
        lambda: refresh_agg_mv(spark, src, mv_mm, keys, sums, mms))

    # integrity: both maintained MVs equal a fresh full aggregate
    final = {tuple(r) for r in _full_agg(
        read_snapshot(spark, src), keys, sums, mms).collect()}
    got = {tuple(r) for r in read_snapshot(spark, mv_mm).collect()}
    assert got == final, "maintained min/max MV diverged from rebuild"
    final_s = {tuple(r) for r in _full_agg(
        read_snapshot(spark, src), keys, sums, []).collect()}
    got_s = {tuple(r) for r in read_snapshot(spark, mv).collect()}
    assert got_s == final_s, "maintained sum MV diverged from rebuild"

    shutil.rmtree(WORK, ignore_errors=True)
    print(json.dumps({
        "metric": "ivm_refresh_vs_rebuild", "unit": "sec",
        "n_rows": n_rows, "churn_rows": churn, "cpus": cpus,
        "t_full_rebuild": round(t_full, 3),
        "t_refresh_append": round(t_append, 3),
        "t_refresh_clustered_merge": round(t_merge, 3),
        "t_refresh_clustered_merge_minmax": round(t_merge_mm, 3),
        "t_refresh_extremal_delete": round(t_del, 3),
        "t_refresh_extremal_delete_minmax_rescan": round(t_rescan, 3),
        "speedup_append": round(t_full / t_append, 1),
        "speedup_clustered_merge": round(t_full / t_merge, 1),
        "mv_equals_rebuild": True,
    }))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(n, c)
