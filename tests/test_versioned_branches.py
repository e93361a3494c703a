"""Branches on versioned tables (sources/versioned.py — the Iceberg
branch-ref analog): a named mutable line of commits forks from a main
version, accumulates commits invisible to main readers, and
fast-forwards back as pure metadata. Its manifests live in their own
namespace with their own pointer; data dirs share the main root, so
snapshot isolation / crash GC / retention pinning all compose."""

import os

import pytest
from pyspark.sql import functions as F

import decisions_knowledge_graph_data_spark.sources.versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v"))


def test_branch_commits_invisible_then_fast_forward(spark, tmp_path):
    root = str(tmp_path / "t")
    V.write_snapshot(_df(spark, 0, 100), root, stats_cols=["id"])
    assert V.create_branch(root, "exp") == 1
    assert V.list_branches(root) == {"exp": 1}
    # branch v1 is a content-copy of main@1
    assert V.read_snapshot_branch(spark, root, "exp").count() == 100
    # two branch commits: main readers see none of it
    V.write_snapshot_branch(_df(spark, 100, 150), root, "exp")
    V.write_snapshot_branch(_df(spark, 150, 160), root, "exp")
    assert V.read_snapshot(spark, root).count() == 100
    assert V.current_version(root) == 1
    assert V.read_snapshot_branch(spark, root, "exp").count() == 160
    # branch time travel
    assert V.read_snapshot_branch(spark, root, "exp", version=2).count() == 150
    # pruned branch read (stats inherited across branch appends)
    got = V.read_snapshot_branch(
        spark, root, "exp", predicates={"id": (">=", 150)})
    assert got.count() == 10
    # fast-forward: one metadata commit, main flips atomically
    v = V.fast_forward(root, "exp")
    assert v == 2
    assert V.read_snapshot(spark, root).count() == 160
    assert V.read_snapshot(spark, root, version=1).count() == 100
    assert V._read_manifest(root, 2)["mode"] == "fast_forward"


def test_fast_forward_refuses_divergence(spark, tmp_path):
    root = str(tmp_path / "t")
    V.write_snapshot(_df(spark, 0, 10), root)
    V.create_branch(root, "exp")
    V.write_snapshot_branch(_df(spark, 10, 12), root, "exp")
    # main moves while the branch is open
    V.write_snapshot(_df(spark, 500, 503), root, mode="append")
    with pytest.raises(ValueError, match="forked from main version 1"):
        V.fast_forward(root, "exp")
    # the interleaved main commit is intact
    assert V.read_snapshot(spark, root).count() == 13


def test_branch_gc_and_retention_pinning(spark, tmp_path):
    root = str(tmp_path / "t")
    V.write_snapshot(_df(spark, 0, 10), root)
    V.create_branch(root, "exp")
    V.write_snapshot_branch(_df(spark, 10, 20), root, "exp")
    bdirs = {
        f.split("/", 1)[0]
        for f in V._read_manifest(V._branch_meta_root(root, "exp"), 2)["files"]
    }
    # unrelated main commits + a squeeze to keep_last=1: the branch's
    # data dirs (and the fork-shared ones) survive
    V.write_snapshot(_df(spark, 900, 905), root, mode="overwrite")
    V.expire_versions(root, keep_last=1)
    for d in bdirs:
        assert os.path.isdir(os.path.join(root, d)), d
    assert V.read_snapshot_branch(spark, root, "exp").count() == 20
    # deleting the branch releases its unshared dirs to the next GC
    V.delete_branch(root, "exp")
    assert V.list_branches(root) == {}
    V.expire_versions(root, keep_last=1)
    live = {
        f.split("/", 1)[0]
        for f in V._read_manifest(root, V.current_version(root))["files"]
    }
    for d in bdirs - live:
        assert not os.path.isdir(os.path.join(root, d)), d
    with pytest.raises(FileNotFoundError):
        V.read_snapshot_branch(spark, root, "exp")


def test_branch_crash_orphan_cleanup(spark, tmp_path):
    """A crashed branch writer (manifest above the branch pointer) is
    invisible and cleaned by the next writer, exactly like main."""
    root = str(tmp_path / "t")
    V.write_snapshot(_df(spark, 0, 10), root)
    V.create_branch(root, "exp")
    broot = V._branch_meta_root(root, "exp")
    # simulate: branch manifest 2 written, pointer swap never happened
    m = dict(V._read_manifest(broot, 1))
    m["version"] = 2
    import json
    with open(V._manifest_path(broot, 2), "w") as f:
        json.dump(m, f)
    ptr = os.path.join(broot, "VERSION")
    with open(ptr, "w") as f:
        f.write("1")
    assert V.current_version(broot) == 1
    V.write_snapshot(_df(spark, 100, 103), root, mode="append")  # GCs
    assert not os.path.exists(V._manifest_path(broot, 2))
    assert V.read_snapshot_branch(spark, root, "exp").count() == 10


def test_branch_carries_mor_deletes_and_schema(spark, tmp_path):
    root = str(tmp_path / "t")
    V.write_snapshot(_df(spark, 0, 100), root, stats_cols=["id"])
    V.delete_where_mor(spark, root, {"id": ("==", 7)})
    V.create_branch(root, "exp")
    # the fork sees the delete; a branch append inherits the entries
    # and may evolve the schema
    V.write_snapshot_branch(
        _df(spark, 100, 110).withColumn("w", F.lit("x")), root, "exp")
    b = V.read_snapshot_branch(spark, root, "exp")
    assert b.count() == 109
    assert b.filter(F.col("id") == 7).count() == 0
    assert "w" in b.columns
    v = V.fast_forward(root, "exp")
    main = V.read_snapshot(spark, root)
    assert main.count() == 109 and "w" in main.columns
    assert main.filter(F.col("id") == 7).count() == 0


def test_branch_name_and_mode_validation(spark, tmp_path):
    root = str(tmp_path / "t")
    V.write_snapshot(_df(spark, 0, 5), root)
    with pytest.raises(ValueError, match="invalid tag name"):
        V.create_branch(root, "../evil")
    V.create_branch(root, "b1")
    with pytest.raises(ValueError, match="already exists"):
        V.create_branch(root, "b1")
    with pytest.raises(FileNotFoundError, match="no branch"):
        V.write_snapshot_branch(_df(spark, 0, 1), root, "nope")
    with pytest.raises(ValueError, match="unknown mode"):
        V.write_snapshot_branch(_df(spark, 0, 1), root, "b1", mode="merge")
