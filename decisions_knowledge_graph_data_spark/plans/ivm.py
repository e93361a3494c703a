"""Incremental materialized-view maintenance over versioned tables.

At 100 TB an aggregate table is never recomputed from scratch on every
source commit — refresh cost must be proportional to CHURN, not to
table size. :func:`refresh_agg_mv` maintains a grouped count/sum
materialization of a versioned source table by reading only the
row-level change feed since the last applied source version
(``read_changes`` scans just the files each commit touched — appends
read only added files, row-op rewrites diff only rewritten files),
folding inserts as ``+1 / +x`` and deletes as ``-1 / -x``, and
re-aggregating against the CURRENT MV state — which is aggregate-sized,
never source-sized. This is the warehouse-side dual of the streaming
exactly-once publish: batch commits in, self-maintaining aggregate out.

Self-maintainability: ``count`` and ``sum`` form an abelian group under
insert/delete, so the fold is exact; ``avg`` derives as sum/count at
read time. ``min``/``max`` are NOT self-maintainable under deletes
(a deleted current-min needs a rescan) and are deliberately out of
scope — the reference point is Iceberg/Materialize-style IVM of
group-by-sum views, the workhorse shape for metrics rollups.

Bookkeeping: the applied source version rides the MV's NEWEST manifest
under meta key ``mv_src_version`` (same durability contract as the
streaming ``batch_id_hwm`` — inherited across appends, row ops and
compactions, immune to ``expire_versions``). A refresh is therefore
idempotent: re-running at an unchanged source version is a no-op, and
a crash BEFORE the MV commit just re-reads the same change window (the
pointer swap is the sole commit point).

Retention interplay: if the applied source version has been expired
from the source's history, the change window can no longer be
reconstructed — ``refresh_agg_mv`` then falls back to a full rebuild
(documented, tested) rather than guessing a delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.versioned import (
    CHANGE_TYPE_COL,
    _read_manifest,
    current_version,
    read_changes,
    read_snapshot,
    write_snapshot,
)

MV_SRC_VERSION_KEY = "mv_src_version"
N_ROWS_COL = "n_rows"


def _sum_col(c: str) -> str:
    return f"sum_{c}"


def _full_agg(src: DataFrame, keys: list[str], sum_cols: list[str]) -> DataFrame:
    return src.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(N_ROWS_COL),
        *[F.sum(c).alias(_sum_col(c)) for c in sum_cols],
    )


def mv_applied_version(mv_root: str) -> int | None:
    """Source version the MV currently reflects (None: MV not built)."""
    v = current_version(mv_root)
    if v is None:
        return None
    return int(_read_manifest(mv_root, v)["meta"][MV_SRC_VERSION_KEY])


def refresh_agg_mv(
    spark: SparkSession,
    src_root: str,
    mv_root: str,
    keys: list[str],
    sum_cols: list[str],
) -> int:
    """Bring the count/sum MV at ``mv_root`` up to the source's current
    version; returns the source version now applied.

    First call (no MV yet): one full aggregation of the source.
    Later calls: read_changes(applied → current) → signed delta agg →
    union with the current MV rows → one aggregate-sized hash re-agg;
    groups whose maintained count reaches 0 are dropped (a group that
    lost all its rows must disappear, not linger as a zero row).
    No-op (and no commit) when the source hasn't moved.
    """
    src_v = current_version(src_root)
    if src_v is None:
        raise FileNotFoundError(f"no committed version at {src_root}")
    applied = mv_applied_version(mv_root)
    if applied is None:
        mv = _full_agg(read_snapshot(spark, src_root, version=src_v),
                       keys, sum_cols)
        write_snapshot(mv, mv_root, meta={MV_SRC_VERSION_KEY: src_v})
        return src_v
    if applied == src_v:
        return applied
    if applied > src_v:
        raise ValueError(
            f"MV at {mv_root} reflects version {applied}, newer than the "
            f"source's current {src_v} (source rolled back?) — rebuild "
            "explicitly instead of maintaining backwards"
        )
    try:
        ch = read_changes(spark, src_root, since_version=applied,
                          version=src_v)
    except FileNotFoundError:
        # the applied version fell out of retention: the delta window is
        # gone, so rebuild from the current snapshot (correct, just not
        # incremental — and only ever pays when retention lapsed)
        mv = _full_agg(read_snapshot(spark, src_root, version=src_v),
                       keys, sum_cols)
        write_snapshot(mv, mv_root, meta={MV_SRC_VERSION_KEY: src_v})
        return src_v
    sign = F.when(F.col(CHANGE_TYPE_COL) == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = ch.groupBy(*keys).agg(
        F.sum(sign).alias(N_ROWS_COL),
        *[F.sum(sign * F.col(c)).alias(_sum_col(c)) for c in sum_cols],
    )
    cur = read_snapshot(spark, mv_root)
    merged = (
        cur.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum(N_ROWS_COL).alias(N_ROWS_COL),
            *[F.sum(_sum_col(c)).alias(_sum_col(c)) for c in sum_cols],
        )
        .filter(F.col(N_ROWS_COL) > 0)
    )
    write_snapshot(merged, mv_root, meta={MV_SRC_VERSION_KEY: src_v})
    return src_v
