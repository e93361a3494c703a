"""Versioned parquet tables: atomic commit, snapshot isolation, time
travel, append-without-rewrite (sources/versioned.py — the sandbox
substitution for the Iceberg sink mapping in SURVEY.md §1.1)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.sources.versioned import (
    current_version,
    read_snapshot,
    table_history,
    write_snapshot,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_overwrite_append_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = write_snapshot(_df(spark, 0, 10), root)
    t_after_v1 = time.time()
    v2 = write_snapshot(_df(spark, 10, 15), root, mode="append")
    v3 = write_snapshot(_df(spark, 100, 103), root, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert current_version(root) == 3

    # current = the overwrite
    assert read_snapshot(spark, root).count() == 3
    # append listed parent files without rewriting them
    assert read_snapshot(spark, root, version=2).count() == 15
    # time travel by version and by timestamp
    assert read_snapshot(spark, root, version=1).count() == 10
    assert read_snapshot(spark, root, as_of=t_after_v1).count() == 10

    hist = table_history(root)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["rows_written"] for h in hist] == [10, 5, 3]
    assert hist[1]["mode"] == "append" and hist[1]["parent"] == 1


def test_crashed_writer_is_invisible(spark, tmp_path):
    """A snapshot dir without a manifest (writer died between data write
    and commit) must not be readable — readers resolve through manifests
    only, so the half-commit simply does not exist."""
    root = str(tmp_path / "tbl2")
    write_snapshot(_df(spark, 0, 5), root)
    # simulate a crash: data directory appears, but no manifest/pointer
    _df(spark, 5, 50).write.parquet(os.path.join(root, "v00099"))
    assert current_version(root) == 1
    assert read_snapshot(spark, root).count() == 5
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=99)


def test_single_writer_lock(spark, tmp_path):
    root = str(tmp_path / "tbl3")
    write_snapshot(_df(spark, 0, 3), root)
    os.makedirs(root, exist_ok=True)
    fd = os.open(os.path.join(root, "_commit.lock"),
                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with pytest.raises(RuntimeError, match="another writer"):
            write_snapshot(_df(spark, 3, 6), root)
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, "_commit.lock"))
    # lock released → next commit succeeds and the failed attempt left
    # no version behind
    assert write_snapshot(_df(spark, 3, 6), root, mode="append") == 2
    assert read_snapshot(spark, root).count() == 6


def test_pipeline_publish_and_versioned_input(spark, corpus20, tmp_path):
    """End-to-end versioned integration: the source table committed as a
    versioned snapshot feeds the pipeline; each run's graph publishes as
    a new atomic version; version 1 stays readable (time travel) after
    version 2 commits."""
    from decisions_knowledge_graph_data_spark.plans.pipeline import (
        publish_graph, run_pipeline,
    )
    tables, _, _ = corpus20
    dicts = {k: tables[k] for k in
             ("entity_registry", "popular_entities", "alias_map",
              "known_missing", "family_map")}
    src_root = str(tmp_path / "src_tbl")
    assert write_snapshot(tables["documents"], src_root) == 1
    docs = read_snapshot(spark, src_root)

    wd = str(tmp_path / "wd")
    out = run_pipeline(spark, docs, dicts, wd, resume=True)
    graph_root = str(tmp_path / "graph")
    v1 = publish_graph(out, graph_root)
    assert v1 == {"nodes": 1, "edges": 1}
    n_edges_1 = read_snapshot(spark, graph_root + "/edges").count()
    assert n_edges_1 == out["s6_edges"].count() > 0

    # second publish (e.g. a re-run) → v2; v1 still time-travel readable
    v2 = publish_graph(out, graph_root)
    assert v2 == {"nodes": 2, "edges": 2}
    assert read_snapshot(spark, graph_root + "/edges", version=1).count() == n_edges_1
    assert read_snapshot(spark, graph_root + "/nodes").count() == out["s6_nodes"].count()
