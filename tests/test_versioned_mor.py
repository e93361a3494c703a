"""Merge-on-read position deletes (sources/versioned.py delete_where_mor
— the Iceberg v2 positional-delete analog): a delete commits a tiny
(file, pos) parquet instead of rewriting data files; every read path
anti-joins the positions out, compaction absorbs them, and surfaces
whose semantics live deletes would silently break refuse loudly."""

import os

import pytest
from pyspark.sql import functions as F

import decisions_knowledge_graph_data_spark.sources.versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 2).alias("v")
    )


def _mk(spark, root, n=1000, files=4):
    V.write_snapshot(
        _df(spark, 0, n).repartitionByRange(files, "id"),
        root, stats_cols=["id"],
    )
    return root


def test_mor_delete_read_and_time_travel(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    v2 = V.delete_where_mor(spark, root, {"id": ("between", (100, 149))})
    assert v2 == 2
    out = V.read_snapshot(spark, root)
    assert out.count() == 950
    assert out.filter(F.col("id").between(100, 149)).count() == 0
    # data files untouched: the old version still reads every row
    assert V.read_snapshot(spark, root, version=1).count() == 1000
    m = V._read_manifest(root, 2)
    assert m["files"] == V._read_manifest(root, 1)["files"]
    assert m["rows_deleted"] == 50
    # the delete commit wrote ONE tiny parquet, no data rewrite
    del_rel = {d for dl in V._delete_map(m).values() for d in dl}
    assert len(del_rel) == 1


def test_mor_pruned_read_equals_scan_filter(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"g": ("==", 3)})
    pruned = V.read_snapshot(spark, root, predicates={"id": (">=", 900)})
    full = V.read_snapshot(spark, root).filter(F.col("id") >= 900)
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    # stats pruning still skips files on the delete-bearing table
    _, skipped, _ = V.plan_files(root, predicates={"id": (">=", 900)})
    assert skipped >= 2


def test_mor_generations_append_and_noop(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (100, 149))})
    V.delete_where_mor(spark, root, {"g": ("==", 3)})
    n_g3_rest = 1000 // 7 + (1 if 3 < 1000 % 7 else 0) - 7  # 7 g==3 in [100,150)
    expect = 950 - n_g3_rest
    assert V.read_snapshot(spark, root).count() == expect
    # positions are computed against VISIBLE rows: no double-recording
    m = V._read_manifest(root, V.current_version(root))
    assert sum(m["delete_counts"].values()) == 50 + n_g3_rest
    # a predicate matching nothing commits nothing
    assert V.delete_where_mor(spark, root, {"id": ("==", -5)}) is None
    assert V.current_version(root) == 3
    # appends inherit the delete attachments — no resurrection
    V.write_snapshot(_df(spark, 5000, 5010), root, mode="append")
    assert V.read_snapshot(spark, root).count() == expect + 10


def test_mor_null_semantics_and_bulk_refusal(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id int, v int")
    V.write_snapshot(df, root)
    # SQL DELETE: a NULL predicate result deletes nothing
    V.delete_where_mor(spark, root, {"v": ("<", 20)})
    assert sorted(r["id"] for r in V.read_snapshot(spark, root).collect()) == [2, 3]
    with pytest.raises(ValueError, match="no predicates"):
        V.delete_where_mor(spark, root, {})
    with pytest.raises(ValueError, match="max_positions"):
        V.delete_where_mor(
            spark, root, {"id": (">", 0)}, max_positions=0)
    # the refused delete left no orphan commit
    assert V.read_snapshot(spark, root).count() == 2


def test_mor_reserved_columns_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    V.write_snapshot(
        spark.range(5).select(F.col("id"), F.lit(1).alias("_mor_pos")), root)
    with pytest.raises(ValueError, match="reserve"):
        V.delete_where_mor(spark, root, {"id": ("==", 1)})


def test_cow_rewrite_absorbs_and_keeps_entries(spark, tmp_path):
    """A copy-on-write op on a delete-bearing table must not resurrect
    deleted rows in the files it rewrites, and must keep the delete
    entries of the files it lists unchanged."""
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (0, 9))})       # file 1
    V.delete_where_mor(spark, root, {"id": ("between", (990, 999))})   # file 4
    # CoW delete touches only the low files (stats-pruned)
    V.delete_where(spark, root, {"id": ("<", 200)})
    out = V.read_snapshot(spark, root)
    assert out.filter(F.col("id") < 200).count() == 0
    # the untouched high file still hides its MoR-deleted rows
    assert out.filter(F.col("id") >= 990).count() == 0
    assert out.count() == 1000 - 200 - 10
    m = V._read_manifest(root, V.current_version(root))
    assert sum(m["delete_counts"].values()) == 10  # high-file entries kept


def test_compact_absorbs_deletes(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"g": ("==", 5)})
    before = V.read_snapshot(spark, root).count()
    v = V.compact_snapshot(spark, root, small_file_bytes=1)
    assert v is not None
    m = V._read_manifest(root, v)
    assert not V._delete_map(m)
    assert V.read_snapshot(spark, root).count() == before
    # metadata-only min/max is answerable again after absorption
    agg = V.snapshot_meta_agg(root, cols=["id"])
    assert agg["n_rows"] == before


def test_meta_agg_counts_exact_minmax_refuses(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (0, 24))})
    assert V.snapshot_meta_agg(root)["n_rows"] == 975
    with pytest.raises(ValueError, match="merge-on-read"):
        V.snapshot_meta_agg(root, cols=["id"])


def test_changes_feed_emits_mor_deletes(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (100, 149))})
    V.write_snapshot(_df(spark, 5000, 5003), root, mode="append")
    ch = V.read_changes(spark, root, 1)
    dels = ch.filter(F.col(V.CHANGE_TYPE_COL) == "delete")
    ins = ch.filter(F.col(V.CHANGE_TYPE_COL) == "insert")
    assert dels.count() == 50 and ins.count() == 3
    assert sorted(r["id"] for r in dels.collect()) == list(range(100, 150))
    assert dels.select(V.CHANGE_VERSION_COL).distinct().first()[0] == 2
    # compaction absorbing the positions stays silent in the feed
    V.compact_snapshot(spark, root, small_file_bytes=1)
    ch2 = V.read_changes(spark, root, 3)
    assert ch2.count() == 0


def test_append_lineage_surfaces_refuse(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("==", 7)})
    with pytest.raises(ValueError, match="mor_delete"):
        V.read_appended(spark, root, 1)


def test_gc_and_expiry_keep_referenced_delete_files(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (0, 9))})
    m2 = V._read_manifest(root, 2)
    del_dirs = {d.split("/", 1)[0]
                for dl in V._delete_map(m2).values() for d in dl}
    # an unrelated append triggers orphan GC under its lock
    V.write_snapshot(_df(spark, 5000, 5003), root, mode="append")
    for d in del_dirs:
        assert os.path.isdir(os.path.join(root, d))
    assert V.read_snapshot(spark, root).count() == 993
    # expiring down to the delete-bearing head keeps its delete files
    V.expire_versions(root, keep_last=1)
    for d in del_dirs:
        assert os.path.isdir(os.path.join(root, d))
    assert V.read_snapshot(spark, root).count() == 993
    # dropping the deletes via overwrite then expiring removes the dirs
    V.write_snapshot(_df(spark, 0, 5), root, mode="overwrite")
    V.expire_versions(root, keep_last=1)
    for d in del_dirs:
        assert not os.path.isdir(os.path.join(root, d))


def test_rollback_restores_pre_delete_state(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (0, 99))})
    assert V.read_snapshot(spark, root).count() == 900
    V.rollback_to(root, 1)
    assert V.read_snapshot(spark, root).count() == 1000
    # rolling FORWARD to the deleted state re-applies the entries
    V.rollback_to(root, 2)
    assert V.read_snapshot(spark, root).count() == 900


def test_ivm_folds_mor_deletes(spark, tmp_path):
    """The MV fold must see a merge-on-read delete (rows change, files
    don't): delete-entry-changed files fold on both sides and the
    surviving rows cancel; a deleted extremum triggers the repair."""
    from decisions_knowledge_graph_data_spark.plans.ivm import refresh_agg_mv

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5).alias("g"),
        (F.col("id") * 1.0).alias("val"))
    V.write_snapshot(df.repartitionByRange(4, "id"), src, stats_cols=["id"])
    refresh_agg_mv(spark, src, mv, ["g"], ["val"], minmax_cols=["val"])

    def check():
        got = {r["g"]: (r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
               for r in V.read_snapshot(spark, mv).collect()}
        exp = {r["g"]: (r["n"], r["s"], r["mn"], r["mx"])
               for r in V.read_snapshot(spark, src).groupBy("g").agg(
                   F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"),
                   F.min("val").alias("mn"), F.max("val").alias("mx"),
               ).collect()}
        assert got == exp, (got, exp)

    V.delete_where_mor(spark, src, {"id": ("between", (10, 59))})
    refresh_agg_mv(spark, src, mv, ["g"], ["val"], minmax_cols=["val"])
    check()
    # delete the global max (id=999): the folded extremum is threatened
    # and the group rescans
    V.delete_where_mor(spark, src, {"id": ("==", 999)})
    refresh_agg_mv(spark, src, mv, ["g"], ["val"], minmax_cols=["val"])
    check()


def test_semijoin_read_applies_deletes(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("==", 15)})
    keys = spark.createDataFrame([(5,), (15,), (700,)], "k bigint")
    out = V.read_snapshot_semijoin(spark, root, keys, "id")
    assert sorted(r["id"] for r in out.collect()) == [5, 700]


def test_wap_audit_and_publish_atop_deletes(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("==", 999)})
    V.stage_snapshot(_df(spark, 5000, 5003), root, mode="append", wap_id="w1")
    aud = V.read_snapshot_staged(spark, root, "w1")
    assert aud.filter(F.col("id") == 999).count() == 0
    assert aud.count() == 999 + 3
    V.publish_staged(root, "w1")
    assert V.read_snapshot(spark, root).count() == 999 + 3


def test_changes_feed_sees_rollback_across_mor_delete(spark, tmp_path):
    """Round-5 review: a rollback across a mor_delete changes row
    VISIBILITY with an identical file list — the feed must emit the
    resurrected rows as inserts (and the mirror direction as deletes),
    via the delete-map-changed common-file fold."""
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (100, 149))})
    V.rollback_to(root, 1)  # v3: 50 rows become visible again
    ch = V.read_changes(spark, root, 2)
    ins = ch.filter(F.col(V.CHANGE_TYPE_COL) == "insert")
    assert ch.count() == 50 and ins.count() == 50
    assert sorted(r["id"] for r in ins.collect()) == list(range(100, 150))
    # mirror: roll forward INTO the deleted state -> 50 deletes
    V.rollback_to(root, 2)
    ch2 = V.read_changes(spark, root, 3)
    dels = ch2.filter(F.col(V.CHANGE_TYPE_COL) == "delete")
    assert ch2.count() == 50 and dels.count() == 50
    # end-to-end invariant: replaying the full feed from v1 lands on
    # the current visible multiset
    assert V.read_snapshot(spark, root).count() == 950


def test_position_load_bounded_by_delete_file_rows(spark, tmp_path, monkeypatch):
    """Round-5 review: the driver-side position load must be bounded by
    the delete parquets' ACTUAL footer rows, not just the wanted files'
    counts — a shared delete file can carry far more rows for other
    files. Above the cap the scan falls back to the join path and stays
    correct."""
    import decisions_knowledge_graph_data_spark.sources.versioned as VV

    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"g": ("==", 3)})
    m = V._read_manifest(root, 2)
    dmap, dcounts = V._delete_map(m), m.get("delete_counts", {})
    one = sorted(dmap)[:1]
    wanted = dcounts[one[0]]
    total = sum(dcounts.values())
    assert wanted < total  # the shared parquet holds other files' rows
    # cap below the wanted count: the want-side gate refuses
    monkeypatch.setattr(VV, "MOR_BROADCAST_CAP", wanted - 1)
    assert VV._load_delete_positions(root, dmap, dcounts, one) is None
    # cap between wanted and the parquet's ACTUAL rows: the footer
    # gate (the round-5 fix) must refuse — the want-side gate passes
    monkeypatch.setattr(VV, "MOR_BROADCAST_CAP", wanted)
    assert VV._load_delete_positions(root, dmap, dcounts, one) is None
    # cap at/above the actual rows: loads, restricted to wanted files
    monkeypatch.setattr(VV, "MOR_BROADCAST_CAP", total)
    got = VV._load_delete_positions(root, dmap, dcounts, one)
    assert set(got) == set(one) and len(got[one[0]]) == wanted
    # the join fallback still reads correctly
    monkeypatch.setattr(VV, "MOR_BROADCAST_CAP", 1)
    assert V.read_snapshot(spark, root).filter(F.col("g") == 3).count() == 0


def test_files_df_reports_rows_and_live_deletes(spark, tmp_path):
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (0, 9))})
    rows = {r["file"]: r for r in V.files_df(spark, root).collect()}
    assert sum(r["n_rows"] for r in rows.values()) == 1000
    assert sum(r["n_deletes"] for r in rows.values()) == 10
    assert sum(1 for r in rows.values() if r["n_deletes"] > 0) == 1
    # absorbed deletes disappear from the metadata table
    V.compact_snapshot(spark, root, small_file_bytes=1)
    rows2 = V.files_df(spark, root).collect()
    assert all(r["n_deletes"] == 0 for r in rows2)
    assert sum(r["n_rows"] for r in rows2) == 990


def test_changes_feed_scan_set_is_churn_only(spark, tmp_path):
    """Scale contract (round-5 review): a mor_delete / rollback window's
    feed scans ONLY the delta-affected data files plus the delta
    position parquets — never the untouched files, and never a touched
    file twice per side."""
    root = _mk(spark, str(tmp_path / "t"))
    V.delete_where_mor(spark, root, {"id": ("between", (100, 149))})
    m2 = V._read_manifest(root, 2)
    affected = sorted(V._delete_map(m2))
    assert len(affected) == 1  # range-partitioned: one file holds 100-149
    del_files = {d for dl in V._delete_map(m2).values() for d in dl}
    scanned = {os.path.relpath(f.replace("file://", ""), root)
               for f in V.read_changes(spark, root, 1).inputFiles()}
    assert scanned == set(affected) | del_files, scanned
    # rollback window: same shape in the resurrect direction
    V.rollback_to(root, 1)
    scanned = {os.path.relpath(f.replace("file://", ""), root)
               for f in V.read_changes(spark, root, 2).inputFiles()}
    assert scanned == set(affected) | del_files, scanned
