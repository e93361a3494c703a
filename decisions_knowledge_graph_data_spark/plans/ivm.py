"""Incremental materialized-view maintenance over versioned tables.

At 100 TB an aggregate table is never recomputed from scratch on every
source commit — refresh cost must be proportional to CHURN, not to
table size. :func:`refresh_agg_mv` maintains a grouped count/sum
materialization of a versioned source table from the NET FILE DIFF
between the last applied manifest and the current one: rows of
net-added files fold with sign ``+1 / +x``, rows of net-removed files
with ``-1 / -x``, re-aggregated against the CURRENT MV state — which is
aggregate-sized, never source-sized. Because count/sum are distributive
this is exact even though copy-on-write rewrites carry kept rows into
new files (they appear on both sides and cancel in the aggregate), so
the delta needs NO row-level exceptAll diff and the scan prunes to the
key/value columns — appends read only the added files, rewrites read
only the touched files, and a rewrite-everything window (compaction)
falls back to one full-agg scan by an explicit file-count heuristic.
This is the warehouse-side dual of the streaming exactly-once publish:
batch commits in, self-maintaining aggregate out. (The row-level
``read_changes`` CDC feed remains the right tool when the CONSUMER
needs rows; for distributive aggregates the file-diff fold is strictly
cheaper — no full-row scan, no shuffle diff.)

Self-maintainability: ``count`` and ``sum`` form an abelian group under
insert/delete, so the fold is exact; ``avg`` derives as sum/count at
read time. ``min``/``max`` (``minmax_cols``) are self-maintainable
under INSERTS (``min(cur, min(inserted))``) but not under deletes — a
deleted current-min can expose a value only the base rows know. The
standard IVM treatment applies: fold inserts, then rescan ONLY the
groups where a deleted value ties-or-beats the folded extremum (a
semi-join-filtered read of the current snapshot — cost proportional to
the affected groups' data, never the full table; the common case of
deleting non-extremal rows stays scan-free). The affected test runs
against the FOLDED state, not the prior MV, which also covers groups
born and partially deleted inside one refresh window.

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

import os

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..sources.versioned import (
    _delete_map,
    _read_manifest,
    _scan_files,
    current_version,
    read_snapshot,
    write_snapshot,
)

MV_SRC_VERSION_KEY = "mv_src_version"
N_ROWS_COL = "n_rows"
# scratch columns carried through the fold only (never committed)
_DEL_MIN, _DEL_MAX = "_del_min_", "_del_max_"
_SIGN = "_mv_sign_"


def _sum_col(c: str) -> str:
    return f"sum_{c}"


def _min_col(c: str) -> str:
    return f"min_{c}"


def _max_col(c: str) -> str:
    return f"max_{c}"


def _mv_cols(keys: list[str], sum_cols: list[str],
             minmax_cols: list[str]) -> list[str]:
    return (
        list(keys) + [N_ROWS_COL] + [_sum_col(c) for c in sum_cols]
        + [x for c in minmax_cols for x in (_min_col(c), _max_col(c))]
    )


def _full_agg(src: DataFrame, keys: list[str], sum_cols: list[str],
              minmax_cols: list[str]) -> DataFrame:
    return src.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(N_ROWS_COL),
        *[F.sum(c).alias(_sum_col(c)) for c in sum_cols],
        *[a for c in minmax_cols
          for a in (F.min(c).alias(_min_col(c)), F.max(c).alias(_max_col(c)))],
    )


def mv_applied_version(mv_root: str) -> int | None:
    """Source version the MV currently reflects (None: MV not built)."""
    v = current_version(mv_root)
    if v is None:
        return None
    return int(_read_manifest(mv_root, v)["meta"][MV_SRC_VERSION_KEY])


def _net_file_diff(root: str, lo_v: int, hi_v: int):
    """Net data-file diff between two manifests on the same lineage:
    (added, removed, hi_manifest), where added/removed are relative
    paths present in exactly one of the two file lists. Files born AND
    dead inside the window cancel without ever being listed. Raises
    FileNotFoundError when ``lo_v`` fell out of retention and
    ValueError when ``hi_v`` does not descend from ``lo_v`` (rollback).

    Why this beats a row-level change feed for MV deltas: count/sum are
    DISTRIBUTIVE, so aggregating +rows(added files) − rows(removed
    files) is exact even though a copy-on-write rewrite carries kept
    rows into new files — the kept rows appear on both sides with
    opposite signs and cancel IN THE AGGREGATE, no exceptAll shuffle
    diff, and the scan prunes to the key/value columns (a row-level
    feed must read and shuffle full rows). For min/max the kept rows
    make the delete side conservative: a spurious (never missed)
    rescan trigger, with the same soundness argument as the exact feed
    — if an insert beat the dead extremum the folded value is already
    right; otherwise folded == the dead value and the trigger fires.
    """
    m_hi = _read_manifest(root, hi_v)
    v, m = hi_v, m_hi
    while v != lo_v:  # validate lineage (reads only window manifests)
        if m["parent"] is None:
            raise ValueError(
                f"version {lo_v} is not on version {hi_v}'s lineage "
                f"at {root} (rolled back?)"
            )
        v = m["parent"]
        m = _read_manifest(root, v)
    lo_files, hi_files = set(m["files"]), set(m_hi["files"])
    # merge-on-read deletes change a file's VISIBLE rows without
    # changing the file list: common files whose delete-entry lists
    # differ between the two manifests fold on BOTH sides (+hi view,
    # −lo view) — the surviving rows appear with opposite signs and
    # cancel in the distributive aggregate, exactly like CoW kept rows,
    # and this also covers a rollback that resurrects deleted rows
    lo_d, hi_d = _delete_map(m), _delete_map(m_hi)
    dchanged = sorted(
        f for f in lo_files & hi_files
        if sorted(lo_d.get(f, [])) != sorted(hi_d.get(f, []))
    )
    return (
        sorted(hi_files - lo_files), sorted(lo_files - hi_files),
        dchanged, m, m_hi,
    )


def _needs_rescan(minmax_cols: list[str]) -> Column:
    """True for folded groups where some delete in the window ties or
    beats the folded extremum — the insert-fold alone can't prove the
    extremum survived, so the group's base rows must be re-read. NULL
    comparisons (all-NULL column, or no deletes in the window) are
    false, i.e. scan-free."""
    cond = F.lit(False)
    for c in minmax_cols:
        cond = cond | (F.col(_DEL_MIN + c) <= F.col(_min_col(c))) | (
            F.col(_DEL_MAX + c) >= F.col(_max_col(c))
        )
    return cond


def refresh_agg_mv(
    spark: SparkSession,
    src_root: str,
    mv_root: str,
    keys: list[str],
    sum_cols: list[str],
    minmax_cols: list[str] | None = None,
) -> int:
    """Bring the count/sum(/min/max) MV at ``mv_root`` up to the
    source's current version; returns the source version now applied.

    First call (no MV yet): one full aggregation of the source.
    Later calls: net file diff (applied → current) → signed pruned-column
    delta agg → union with the current MV rows → one aggregate-sized re-agg;
    groups whose maintained count reaches 0 are dropped (a group that
    lost all its rows must disappear, not linger as a zero row). With
    ``minmax_cols``, groups whose folded extremum is threatened by a
    delete are recomputed from a semi-join-filtered snapshot read (see
    module docstring); everything else never touches the source.
    No-op (and no commit) when the source hasn't moved.
    """
    minmax_cols = list(minmax_cols or [])
    src_v = current_version(src_root)
    if src_v is None:
        raise FileNotFoundError(f"no committed version at {src_root}")

    def _rebuild() -> int:
        mv = _full_agg(read_snapshot(spark, src_root, version=src_v),
                       keys, sum_cols, minmax_cols)
        write_snapshot(mv, mv_root, meta={MV_SRC_VERSION_KEY: src_v})
        return src_v

    applied = mv_applied_version(mv_root)
    if applied is None:
        return _rebuild()
    if applied == src_v:
        return applied
    if applied > src_v:
        raise ValueError(
            f"MV at {mv_root} reflects version {applied}, newer than the "
            f"source's current {src_v} (source rolled back?) — rebuild "
            "explicitly instead of maintaining backwards"
        )
    cur = read_snapshot(spark, mv_root)
    expect = _mv_cols(keys, sum_cols, minmax_cols)
    if sorted(cur.columns) != sorted(expect):
        raise ValueError(
            f"MV at {mv_root} has columns {sorted(cur.columns)} but the "
            f"requested aggregates need {sorted(expect)} — the MV was "
            "built with a different spec; rebuild it (delete the MV "
            "table) instead of maintaining across specs"
        )
    try:
        added, removed, dchanged, m_lo, m_hi = _net_file_diff(
            src_root, applied, src_v)
    except FileNotFoundError:
        # the applied version fell out of retention: the delta window is
        # gone, so rebuild from the current snapshot (correct, just not
        # incremental — and only ever pays when retention lapsed)
        return _rebuild()
    if not added and not removed and not dchanged:
        # data-identical window (e.g. meta-only commits): re-commit the
        # MV rows as-is so mv_src_version advances (aggregate-sized)
        write_snapshot(cur, mv_root, meta={MV_SRC_VERSION_KEY: src_v})
        return src_v
    if len(added) + len(removed) + 2 * len(dchanged) >= len(m_hi["files"]):
        # the delta scan would touch at least as many files as the
        # current snapshot (compaction / re-clustering in the window):
        # one full-agg scan is strictly cheaper than two delta scans
        return _rebuild()
    need = list(dict.fromkeys(
        keys + sum_cols + minmax_cols))  # pruned-scan column set
    src_schema = StructType.fromJson(m_hi["schema"])

    def _side(files: list[str], sgn: int, dmap_m: dict) -> DataFrame | None:
        if not files:
            return None
        # current schema on both sides: pre-evolution files surface the
        # later-added columns as NULL, matching read_snapshot semantics;
        # the scan applies dmap_m's merge-on-read deletes (added /
        # delete-changed files view through m_hi, removed / the old side
        # of delete-changed files through m_lo) — Catalyst still prunes
        # the parquet scan to the selected columns
        return (
            _scan_files(spark, src_root, dmap_m, files, schema=src_schema)
            .select(*need)
            .withColumn(_SIGN, F.lit(sgn))
        )

    sides = [s for s in (
        _side(added + dchanged, 1, m_hi),
        _side(removed + dchanged, -1, m_lo),
    ) if s is not None]
    ch = sides[0] if len(sides) == 1 else sides[0].unionByName(sides[1])
    is_ins = F.col(_SIGN) == 1
    sign = F.col(_SIGN)
    delta = ch.groupBy(*keys).agg(
        F.sum(sign).alias(N_ROWS_COL),
        *[F.sum(sign * F.col(c)).alias(_sum_col(c)) for c in sum_cols],
        # inserts fold into the running extrema; deleted extrema are
        # carried as scratch columns that only drive the rescan test
        *[a for c in minmax_cols for a in (
            F.min(F.when(is_ins, F.col(c))).alias(_min_col(c)),
            F.max(F.when(is_ins, F.col(c))).alias(_max_col(c)),
            F.min(F.when(~is_ins, F.col(c))).alias(_DEL_MIN + c),
            F.max(F.when(~is_ins, F.col(c))).alias(_DEL_MAX + c),
        )],
    )
    # scratch NULLs on the cur side take each column's REAL type from the
    # delta frame (min/max columns can be long/date/string, and a union
    # across mismatched types would fail analysis)
    delta_types = dict(delta.dtypes)
    cur_padded = cur.select(
        "*", *[F.lit(None).cast(delta_types[n]).alias(n)
               for c in minmax_cols for n in (_DEL_MIN + c, _DEL_MAX + c)]
    )
    folded = (
        cur_padded.unionByName(delta, allowMissingColumns=False)
        .groupBy(*keys)
        .agg(
            F.sum(N_ROWS_COL).alias(N_ROWS_COL),
            *[F.sum(_sum_col(c)).alias(_sum_col(c)) for c in sum_cols],
            *[a for c in minmax_cols for a in (
                F.min(_min_col(c)).alias(_min_col(c)),
                F.max(_max_col(c)).alias(_max_col(c)),
                F.min(_DEL_MIN + c).alias(_DEL_MIN + c),
                F.max(_DEL_MAX + c).alias(_DEL_MAX + c),
            )],
        )
        .filter(F.col(N_ROWS_COL) > 0)
    )
    scratch = [n for c in minmax_cols for n in (_DEL_MIN + c, _DEL_MAX + c)]
    if not minmax_cols:
        write_snapshot(folded, mv_root, meta={MV_SRC_VERSION_KEY: src_v})
        return src_v
    # aggregate-sized and consumed by up to three ops below — persist so
    # the change feed + MV read fold exactly once (DISK_ONLY per the
    # repo's capped-heap policy; the frame is tiny, the policy is cheap)
    folded = folded.persist(StorageLevel.DISK_ONLY)
    try:
        rescan_keys = folded.filter(_needs_rescan(minmax_cols)).select(*keys)
        if rescan_keys.limit(1).count() == 0:
            out = folded.drop(*scratch)
            write_snapshot(out, mv_root, meta={MV_SRC_VERSION_KEY: src_v})
            return src_v
        # extrema repair is adaptive: the affected groups' rows can be
        # read file-locally ONLY when the single group key carries
        # per-file stats (a key-clustered table — the Iceberg runtime-
        # filtering shape); otherwise a semi-join "rescan" would scan
        # every file anyway, and one plain full rebuild is strictly
        # cheaper than delta + filtered scan + anti-join plumbing.
        # A NULL grouping key also falls back: the semijoin drops NULL
        # probe keys and the anti-join below never matches NULL==NULL,
        # so the NULL group would silently keep its stale extremum
        key_stats = (
            len(keys) == 1
            and bool(m_hi["files"])
            and any(keys[0] in m_hi.get("file_stats", {}).get(f, {})
                    for f in m_hi["files"])
            and rescan_keys.filter(
                F.col(keys[0]).isNull()).limit(1).count() == 0
        )
        if not key_stats:
            return _rebuild()
        from ..sources.versioned import read_snapshot_semijoin

        rescanned = _full_agg(
            read_snapshot_semijoin(spark, src_root, rescan_keys, keys[0],
                                   version=src_v),
            keys, sum_cols, minmax_cols,
        )
        out = (
            folded.drop(*scratch)
            .join(rescan_keys, on=keys, how="left_anti")
            .unionByName(rescanned)
        )
        write_snapshot(out, mv_root, meta={MV_SRC_VERSION_KEY: src_v})
    finally:
        folded.unpersist()
    return src_v
