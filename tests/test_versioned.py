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


def test_crashed_commit_never_blocks_table(spark, tmp_path):
    """Round-3 ADVICE (medium): a crash at ANY point of a commit must
    neither block future writes nor leak a half-commit to readers.
    (a) crash after parquet write, before manifest: orphan data dir;
    (b) crash after manifest write, before pointer swap: orphan manifest.
    Both are invisible, and the next commit succeeds and GCs them."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        DATA_PREFIX, _manifest_path,
    )
    import json

    root = str(tmp_path / "tbl_crash")
    write_snapshot(_df(spark, 0, 5), root)

    # (a) orphan data dir — parquet landed, manifest never did
    orphan_dir = os.path.join(root, DATA_PREFIX + "deadbeef0000")
    _df(spark, 90, 99).write.parquet(orphan_dir)
    # (b) orphan manifest — manifest landed, pointer swap never did
    m2 = _manifest_path(root, 2)
    with open(m2, "w") as f:
        json.dump({"version": 2, "parent": 1, "mode": "overwrite",
                   "files": [DATA_PREFIX + "deadbeef0000/zzz.parquet"],
                   "file_stats": {}, "schema": _df(spark, 0, 1).schema.jsonValue(),
                   "rows_written": 9, "committed_at": time.time(),
                   "meta": {}}, f)

    # the orphan manifest is NOT committed: pointer still rules
    assert current_version(root) == 1
    assert read_snapshot(spark, root).count() == 5
    assert [h["version"] for h in table_history(root)] == [1]
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=2)
    # as_of resolution also ignores it
    assert read_snapshot(spark, root, as_of=time.time()).count() == 5

    # next commit takes version 2 (pointer-derived, orphans GC'd) and works
    assert write_snapshot(_df(spark, 0, 7), root) == 2
    assert read_snapshot(spark, root).count() == 7
    assert not os.path.isdir(orphan_dir)


def test_stale_lock_from_dead_writer_is_stolen(spark, tmp_path):
    """A writer killed hard (SIGKILL/OOM) while holding _commit.lock
    must not block the table forever: the lock records the holder pid,
    and a provably-dead holder's lock is stolen on the next commit. A
    pid-less (legacy/corrupt) lock stays conservative and raises."""
    import subprocess
    root = str(tmp_path / "tbl_lock")
    write_snapshot(_df(spark, 0, 3), root)

    # dead holder: a subprocess that has already exited
    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(os.path.join(root, "_commit.lock"), "w") as f:
        f.write(str(proc.pid))
    assert write_snapshot(_df(spark, 3, 6), root, mode="append") == 2
    assert read_snapshot(spark, root).count() == 6

    # pid-less lock: refuse to steal
    with open(os.path.join(root, "_commit.lock"), "w") as f:
        f.write("")
    with pytest.raises(RuntimeError, match="another writer"):
        write_snapshot(_df(spark, 6, 9), root)
    os.unlink(os.path.join(root, "_commit.lock"))


def test_file_skipping_by_manifest_stats(spark, tmp_path):
    """Iceberg-style predicate file pruning: per-file min/max recorded at
    commit (parquet footers, no rescan) let a predicated read skip files
    entirely — with results identical to scan-then-filter."""
    from decisions_knowledge_graph_data_spark.sources.versioned import plan_files

    root = str(tmp_path / "tbl_stats")
    df = (
        spark.range(0, 1000)
        .select(
            F.col("id"),
            F.date_add(F.lit("2020-01-01").cast("date"),
                       F.col("id").cast("int")).alias("d"),
        )
        .repartitionByRange(8, "id")
    )
    write_snapshot(df, root, stats_cols=["id", "d"])

    all_files, skipped0, _ = plan_files(root)
    assert len(all_files) == 8 and skipped0 == 0

    # numeric predicate: only the top range-partitions can match
    files, skipped, _ = plan_files(root, predicates={"id": (">=", 900)})
    assert skipped >= 6 and len(files) + skipped == 8
    got = read_snapshot(spark, root, predicates={"id": (">=", 900)})
    assert got.count() == 100
    assert got.agg(F.min("id")).first()[0] == 900

    # date predicate via ISO string; between on both bounds
    files, skipped, _ = plan_files(
        root, predicates={"d": ("between", ("2020-01-05", "2020-01-20"))})
    assert skipped >= 6
    got = read_snapshot(
        spark, root,
        predicates={"d": ("between", ("2020-01-05", "2020-01-20"))})
    assert got.count() == 16

    # pruning must equal full-scan + filter, not approximate it
    full = read_snapshot(spark, root).filter(F.col("id") < 125)
    pruned = read_snapshot(spark, root, predicates={"id": ("<", 125)})
    assert sorted(r.id for r in pruned.collect()) == sorted(
        r.id for r in full.collect())
    # a predicate matching nothing yields an empty frame, zero files read
    files, skipped, _ = plan_files(root, predicates={"id": ("==", -5)})
    assert files == [] and skipped == 8
    assert read_snapshot(spark, root, predicates={"id": ("==", -5)}).count() == 0


def test_append_stats_carry_forward(spark, tmp_path):
    """Append manifests inherit the parent's per-file stats, so pruning
    keeps working across the whole file list of an appended version."""
    from decisions_knowledge_graph_data_spark.sources.versioned import plan_files

    root = str(tmp_path / "tbl_app_stats")
    write_snapshot(
        spark.range(0, 100).repartitionByRange(4, "id"), root,
        stats_cols=["id"])
    write_snapshot(
        spark.range(100, 200).repartitionByRange(4, "id"), root,
        mode="append", stats_cols=["id"])
    files, skipped, _ = plan_files(root, predicates={"id": ("<", 25)})
    assert len(files) + skipped == 8 and skipped >= 6
    assert read_snapshot(spark, root, predicates={"id": ("<", 25)}).count() == 25


def test_pruning_with_evolved_column_and_mismatched_types(spark, tmp_path):
    """Pruning composes with schema evolution: a predicate on a column
    the parent's files don't have keeps those files (no stats → can't
    prune) and the residual filter still yields exact results (the
    evolved column reads as NULL there, and NULL never matches). A
    type-mismatched predicate value degrades to no-pruning, never to a
    crash or a wrong answer."""
    from decisions_knowledge_graph_data_spark.sources.versioned import plan_files

    root = str(tmp_path / "tbl_evo_prune")
    write_snapshot(
        spark.range(0, 50).select("id"), root, stats_cols=["id"])
    write_snapshot(
        spark.range(50, 100).select(
            "id", (F.col("id") * 10).alias("score")),
        root, mode="append", stats_cols=["id", "score"])

    # predicate on the evolved column: v1 files have no 'score' stats →
    # kept; v2 files prune normally; results == full scan + filter
    files, skipped, _ = plan_files(root, predicates={"score": (">=", 990)})
    got = read_snapshot(spark, root, predicates={"score": (">=", 990)})
    assert got.count() == 1 and got.first()["id"] == 99
    assert len(files) + skipped == len(plan_files(root)[0])

    # type-mismatched predicate: int stats vs string value → keep all
    # files (no crash), residual filter decides
    files2, skipped2, _ = plan_files(root, predicates={"id": (">=", "90")})
    assert skipped2 == 0
    assert read_snapshot(
        spark, root, predicates={"id": (">=", 90)}).count() == 10


def test_schema_evolution_on_append(spark, tmp_path):
    """An append may ADD columns: old versions keep their schema, the new
    version reads the union (old files' new columns are NULL), and a
    type change on an existing column is refused."""
    root = str(tmp_path / "tbl_evo")
    write_snapshot(_df(spark, 0, 10), root)
    evolved = _df(spark, 10, 15).withColumn("extra", F.col("id") + 100)
    write_snapshot(evolved, root, mode="append")

    v1 = read_snapshot(spark, root, version=1)
    assert v1.columns == ["id", "v"] and v1.count() == 10

    v2 = read_snapshot(spark, root, version=2)
    assert v2.columns == ["id", "v", "extra"] and v2.count() == 15
    assert v2.filter(F.col("extra").isNull()).count() == 10
    assert v2.filter(F.col("extra") == 110).count() == 1

    with pytest.raises(ValueError, match="cannot change column"):
        write_snapshot(
            _df(spark, 0, 3).withColumn("extra", F.lit("not-a-long")),
            root, mode="append")


def test_expire_versions(spark, tmp_path):
    """Expiration drops old manifests and removes data dirs unreferenced
    by retained manifests — while append-parent files a retained child
    still lists survive."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        expire_versions,
    )
    root = str(tmp_path / "tbl_exp")
    write_snapshot(_df(spark, 0, 10), root)                    # v1
    write_snapshot(_df(spark, 10, 15), root, mode="append")    # v2 (reuses v1 files)
    write_snapshot(_df(spark, 100, 103), root)                 # v3 (fresh files)

    # keep v2+v3: v1's manifest goes, but its DATA survives (v2 lists it)
    res = expire_versions(root, keep_last=2)
    assert res["expired_versions"] == [1] and res["removed_dirs"] == []
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=1)
    assert read_snapshot(spark, root, version=2).count() == 15
    assert read_snapshot(spark, root).count() == 3

    # keep only v3: v1/v2 data dirs are now orphans and get deleted
    res = expire_versions(root, keep_last=1)
    assert res["expired_versions"] == [2] and len(res["removed_dirs"]) == 2
    assert read_snapshot(spark, root).count() == 3
    assert [h["version"] for h in table_history(root)] == [3]
    # the table keeps committing fine after expiry
    assert write_snapshot(_df(spark, 0, 4), root, mode="append") == 4
    assert read_snapshot(spark, root).count() == 7


def test_bucket_transform_point_lookup_prunes(spark, tmp_path):
    """Iceberg bucket(N, col) transform: a point lookup on an unordered
    key — where min/max stats are useless — skips all but ~1/N of the
    files via the materialized bucket-id column, with results equal to
    a full scan + filter."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        BUCKET_COL, plan_files, read_snapshot_bucket_eq,
        write_snapshot_bucketed,
    )
    root = str(tmp_path / "tbl_bucket")
    df = spark.range(0, 2000).select(
        (F.col("id") * 2654435761 % 1000003).alias("k"),  # unordered key
        F.col("id").alias("payload"),
    )
    write_snapshot_bucketed(df, root, "k", n_buckets=8)

    probe = df.limit(1).first()["k"]
    got = read_snapshot_bucket_eq(spark, root, int(probe))
    exp = sorted(r["payload"] for r in df.filter(F.col("k") == probe).collect())
    assert sorted(r["payload"] for r in got.collect()) == exp and len(exp) >= 1
    assert got.columns == ["k", "payload"]  # transform column stays internal

    # the read touched ~1/8 of the files (the bucket-id prune)
    all_files = len(plan_files(root)[0])
    b = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(int(probe)).cast("long")), F.lit(8))
        .cast("int").alias("b")).first()["b"]
    _, skipped, _ = plan_files(root, predicates={BUCKET_COL: ("==", b)})
    assert all_files == 8 and skipped >= 6

    # a table without the transform refuses the bucketed read
    plain_root = str(tmp_path / "tbl_plain")
    write_snapshot(df, plain_root)
    with pytest.raises(ValueError, match="bucket transform"):
        read_snapshot_bucket_eq(spark, plain_root, 1)

    # review hardening: an append whose transform spec differs from the
    # parent's (different N, or a non-bucketed parent) would make the
    # point lookup prune the parent's rows with wrong bucket ids — raise
    with pytest.raises(ValueError, match="parent's transform to match"):
        write_snapshot_bucketed(df, root, "k", n_buckets=16, mode="append")
    with pytest.raises(ValueError, match="parent's transform to match"):
        write_snapshot_bucketed(df, plain_root, "k", n_buckets=8, mode="append")
    # matching spec appends fine and the lookup spans both snapshots
    write_snapshot_bucketed(
        spark.createDataFrame([(int(probe), 99999)], "k long, payload long"),
        root, "k", n_buckets=8, mode="append")
    got2 = sorted(r["payload"] for r in
                  read_snapshot_bucket_eq(spark, root, int(probe)).collect())
    assert got2 == sorted(exp + [99999])

    # a lossy probe cast (1.5 → bigint 1) must be an error, not extra rows
    with pytest.raises(ValueError, match="not exactly representable"):
        read_snapshot_bucket_eq(spark, root, float(probe) + 0.5)


def test_stream_publish_versioned_exactly_once(spark, tmp_path):
    """Streaming → versioned publish (round-3 VERDICT item 7): each
    micro-batch appends as an atomic snapshot keyed by batchId; a
    restart drains only NEW files (no duplicate appends, monotone
    versions), and a replayed foreachBatch call for an already-committed
    batchId is a no-op."""
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        publish_batch_versioned, stream_publish_versioned,
    )
    input_dir = str(tmp_path / "in")
    root = str(tmp_path / "published")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, v long"

    _df(spark, 0, 10).write.mode("append").parquet(input_dir)
    q = stream_publish_versioned(spark, input_dir, root, schema, ckpt)
    q.awaitTermination(120)
    assert read_snapshot(spark, root).count() == 10
    hist1 = table_history(root)
    assert [h["version"] for h in hist1] == list(range(1, len(hist1) + 1))
    published_batches = {h["meta"]["batch_id"] for h in hist1}

    # crash-replay of an already-committed batch: no-op, no new version
    assert publish_batch_versioned(
        _df(spark, 0, 10), max(published_batches), root) is None
    assert len(table_history(root)) == len(hist1)

    # restart with one NEW input file: only the delta is appended
    _df(spark, 10, 17).write.mode("append").parquet(input_dir)
    q2 = stream_publish_versioned(spark, input_dir, root, schema, ckpt)
    q2.awaitTermination(120)
    got = read_snapshot(spark, root)
    assert got.count() == 17
    # exactly-once: every id exactly once
    assert got.groupBy("id").count().filter(F.col("count") > 1).count() == 0
    hist2 = table_history(root)
    assert len(hist2) == len(hist1) + 1
    assert [h["version"] for h in hist2] == list(range(1, len(hist2) + 1))
    # older published prefixes stay time-travel readable
    assert read_snapshot(spark, root, version=hist1[-1]["version"]).count() == 10


def test_stream_asof_enrich_against_versioned_builds(spark, tmp_path):
    """Streaming as-of enrichment composed with versioned tables: each
    micro-batch resolves the build side through the committed manifest,
    so a build version published between batches is visible to the next
    batch (and only whole versions are ever visible); the temporal
    semantics are exactly batch asof_join's."""
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        stream_asof_enrich,
    )
    input_dir = str(tmp_path / "events_in")
    builds_root = str(tmp_path / "builds")
    out_dir = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt_asof")

    write_snapshot(
        spark.createDataFrame(
            [("u1", 0.0, 1, 100.0)], "user string, bts double, seq long, val double"
        ),
        builds_root,
    )
    spark.createDataFrame(
        [(1, "u1", 5.0), (2, "u2", 5.0)], "eid long, user string, ts double"
    ).write.mode("append").parquet(input_dir)

    kwargs = dict(on="user", probe_ts="ts", build_ts="bts",
                  payload_cols=["val"], build_seq="seq")
    q = stream_asof_enrich(
        spark, input_dir, "eid long, user string, ts double",
        builds_root, out_dir, ckpt, **kwargs)
    q.awaitTermination(120)
    got = {r["eid"]: r["asof_val"] for r in read_snapshot(spark, out_dir).collect()}
    assert got == {1: 100.0, 2: None}  # u2 has no build → unmatched
    n_versions_after_first = len(table_history(out_dir))

    # publish a NEWER build version, then stream a second batch: the
    # restart resolves the new snapshot; the older event stays as-is
    write_snapshot(
        spark.createDataFrame(
            [("u1", 10.0, 2, 200.0)], "user string, bts double, seq long, val double"
        ),
        builds_root, mode="append",
    )
    spark.createDataFrame(
        [(3, "u1", 15.0), (4, "u1", 7.0)], "eid long, user string, ts double"
    ).write.mode("append").parquet(input_dir)
    q2 = stream_asof_enrich(
        spark, input_dir, "eid long, user string, ts double",
        builds_root, out_dir, ckpt, **kwargs)
    q2.awaitTermination(120)
    got = {r["eid"]: r["asof_val"] for r in read_snapshot(spark, out_dir).collect()}
    assert got == {1: 100.0, 2: None, 3: 200.0, 4: 100.0}
    # the output is a versioned table keyed by batchId: a crash-replay
    # of an already-published batch must be a no-op, not a duplicate
    # append (round-4 review: plain parquet append was at-least-once)
    hist = table_history(out_dir)
    assert len(hist) == n_versions_after_first + 1
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        publish_batch_versioned,
    )
    replay_bid = hist[-1]["meta"]["batch_id"]
    assert publish_batch_versioned(
        read_snapshot(spark, out_dir), replay_bid, out_dir) is None
    assert len(table_history(out_dir)) == len(hist)


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


def test_xxhash64_py_matches_jvm(spark):
    """The pure-Python xxhash64 port behind job-free bucket lookups
    (round-4 VERDICT item 6) must be bit-identical to Spark's JVM
    expression for every supported type — a silent divergence would
    prune ALL files and return empty lookups. Sweeps negatives,
    extremes, empty / multi-byte / >32-byte strings (every tail branch
    of the block algorithm)."""
    from decisions_knowledge_graph_data_spark.functions.xxhash import (
        xxhash64_bytes, xxhash64_int, xxhash64_long,
    )

    ints = [0, 1, -1, 371, -371, 2**31 - 1, -(2**31), 123456789]
    longs = [0, 1, -1, 371, 2**63 - 1, -(2**63), 982451653, -982451653]
    strs = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
            "0123456789012345678901234567890",    # 31 = max pre-block
            "01234567890123456789012345678901",   # 32 = one full block
            "x" * 33, "y" * 64, "café déjà vu ☃ über", "DOC:03:0000012"]
    got = [r[0] for r in spark.createDataFrame(
        [(v,) for v in ints], "v int").select(F.xxhash64("v")).collect()]
    assert got == [xxhash64_int(v) for v in ints]
    got = [r[0] for r in spark.createDataFrame(
        [(v,) for v in longs], "v long").select(F.xxhash64("v")).collect()]
    assert got == [xxhash64_long(v) for v in longs]
    got = [r[0] for r in spark.createDataFrame(
        [(v,) for v in strs], "v string").select(F.xxhash64("v")).collect()]
    assert got == [xxhash64_bytes(v.encode("utf-8")) for v in strs]


def test_bucket_lookup_is_job_free(spark, tmp_path):
    """int/long/string point lookups must compute the bucket id on the
    driver — exactly one Spark job (the read) and no ``spark.range``
    probe (round-4 VERDICT item 6). Unsupported probe types still fall
    back to the JVM probe with identical semantics."""
    import pyspark.sql.session as _sess

    from decisions_knowledge_graph_data_spark.sources.versioned import (
        read_snapshot_bucket_eq, write_snapshot_bucketed,
    )

    root_l = str(tmp_path / "bl")
    src = spark.range(0, 500).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("p"))
    write_snapshot_bucketed(src, root_l, "k", n_buckets=8)
    root_s = str(tmp_path / "bs")
    src_s = src.select(F.concat(F.lit("k"), F.col("k")).alias("k"), "p")
    write_snapshot_bucketed(src_s, root_s, "k", n_buckets=8)

    orig = _sess.SparkSession.range

    def _forbidden(*a, **kw):
        raise AssertionError("bucket probe ran a Spark job")

    _sess.SparkSession.range = _forbidden
    try:
        got_l = sorted(r["p"] for r in
                       read_snapshot_bucket_eq(spark, root_l, 17).collect())
        got_s = sorted(r["p"] for r in
                       read_snapshot_bucket_eq(spark, root_s, "k17").collect())
        # lossy float probe rejected without a job either
        import pytest as _pt
        with _pt.raises(ValueError, match="not exactly representable"):
            read_snapshot_bucket_eq(spark, root_l, 17.5)
        # integral float folds to the int fast path (JVM cast semantics)
        got_f = sorted(r["p"] for r in
                       read_snapshot_bucket_eq(spark, root_l, 17.0).collect())
    finally:
        _sess.SparkSession.range = orig
    exp = sorted(r["p"] for r in src.filter(F.col("k") == 17).collect())
    assert got_l == exp == got_f and len(exp) > 0
    assert got_s == exp


def test_timestamp_stats_boundary_equality(spark, tmp_path):
    """Round-4 ADVICE (medium): Spark writes UTC-adjusted timestamps and
    pyarrow returns tz-AWARE footer stats; serialized with a '+00:00'
    suffix they compare lexicographically GREATER than any naive ISO
    predicate value, so a '<=' bound equal to a file's min wrongly
    pruned that file. Stats must serialize as naive UTC: the boundary
    file survives, later files still prune, result equals full scan."""
    from decisions_knowledge_graph_data_spark.sources.versioned import plan_files

    root = str(tmp_path / "ts_tbl")
    df = spark.range(0, 400).select(
        F.col("id"),
        (F.to_timestamp(F.lit("2020-01-01 00:00:00"))
         + F.make_interval(hours=F.col("id"))).alias("ts"),
    )
    # INT96 (Spark's default physical timestamp) carries NO parquet
    # min/max at all — timestamp stats require the annotated type
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        write_snapshot(df.repartitionByRange(8, "ts"), root, stats_cols=["ts"])
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    # pick the min of a middle file as the boundary value, straight from
    # the manifest (what pruning actually compares against): it must be
    # naive-UTC ISO with no timezone suffix
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        _read_manifest,
    )
    stats = _read_manifest(root, 1)["file_stats"]
    mins = sorted(st["ts"]["min"] for st in stats.values())
    assert len(mins) >= 6 and not any("+" in m for m in mins)
    boundary = mins[4]
    files, skipped, _ = plan_files(root, predicates={"ts": ("<=", boundary)})
    assert skipped >= 2, "later files must still prune"
    got = read_snapshot(spark, root, predicates={"ts": ("<=", boundary)})
    exp = df.filter(F.col("ts") <= boundary)
    assert got.count() == exp.count() > 0
    # the boundary row itself (file-min equality) is present
    assert got.filter(F.col("ts") == boundary).count() == 1


def test_month_and_truncate_transform_reads(spark, tmp_path):
    """Iceberg year/month/day/truncate partition transforms (round-4
    VERDICT item 3): layout + stats become a table property; the pruned
    read maps predicate bounds through the monotone transform, skips
    files, equals a full scan + filter, and never leaks the internal
    column. Appends must match the parent's recorded spec."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        PT_COL, plan_files, read_snapshot_transformed,
        write_snapshot_transformed,
    )

    root = str(tmp_path / "tm")
    df = spark.range(0, 1000).select(
        F.col("id"),
        F.date_add(F.lit("2020-01-15"), (F.col("id") % 365).cast("int")).alias("d"),
    )
    write_snapshot_transformed(df, root, ("month", "d"), n_files=8)
    got = read_snapshot_transformed(
        spark, root, {"d": ("between", ("2020-06-10", "2020-07-05"))})
    exp = df.filter(F.col("d").between("2020-06-10", "2020-07-05"))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp.collect()}
    assert got.columns == ["id", "d"]  # internal transform column dropped
    lo = 2020 * 12 + 6 - 1
    _, skipped, _ = plan_files(
        root, predicates={PT_COL: ("between", (lo, lo + 1))})
    assert skipped >= 4, "month pruning must skip most files"
    # plain read: no leak either
    assert PT_COL not in read_snapshot(spark, root).columns

    # append with a different spec is refused; matching spec is fine
    with pytest.raises(ValueError, match="transform to match"):
        write_snapshot_transformed(df, root, ("year", "d"), mode="append")
    write_snapshot_transformed(
        df.limit(5), root, ("month", "d"), mode="append")
    assert read_snapshot(spark, root).count() == 1005

    # truncate over ints and over strings (variant from the column type)
    ri = str(tmp_path / "ti")
    di = spark.range(0, 1000).select((F.col("id") * 7 % 997).alias("k"))
    write_snapshot_transformed(di, ri, ("truncate", 100, "k"), n_files=8)
    gi = read_snapshot_transformed(spark, ri, {"k": (">=", 800)})
    assert gi.count() == di.filter(F.col("k") >= 800).count()
    rs = str(tmp_path / "tsr")
    ds = spark.range(0, 500).select(
        F.concat(F.lit("u"), F.lpad((F.col("id") % 97).cast("string"), 3, "0"),
                 F.lit("-"), F.col("id").cast("string")).alias("u"))
    write_snapshot_transformed(ds, rs, ("truncate", 4, "u"), n_files=8)
    gs = read_snapshot_transformed(spark, rs, {"u": ("==", "u042-42")})
    assert [r["u"] for r in gs.collect()] == ["u042-42"]


def test_hwm_batch_id_survives_expiry(spark, tmp_path):
    """Round-4 VERDICT item 2: the exactly-once publish dedup must be
    O(1) and retention-proof. Publish 3 batches, expire to keep_last=1
    (the old done-SET scan forgot expired batch ids and re-appended a
    replay), then replay every old batch id → all no-ops; the next new
    batch still appends."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        expire_versions,
    )
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        publish_batch_versioned,
    )

    root = str(tmp_path / "hwm")
    for bid in (0, 1, 2):
        assert publish_batch_versioned(
            _df(spark, bid * 10, bid * 10 + 10), bid, root) is not None
    assert read_snapshot(spark, root).count() == 30
    expire_versions(root, keep_last=1)
    assert len(table_history(root)) == 1

    # replays from before the retention horizon: no duplicate appends
    for bid in (0, 1, 2):
        assert publish_batch_versioned(
            _df(spark, bid * 10, bid * 10 + 10), bid, root) is None
    assert read_snapshot(spark, root).count() == 30

    # fresh batch appends and advances the mark
    assert publish_batch_versioned(_df(spark, 30, 35), 3, root) is not None
    assert read_snapshot(spark, root).count() == 35
    assert table_history(root)[-1]["meta"]["batch_id_hwm"] == 3


def test_hwm_rides_plain_appends(spark, tmp_path):
    """Round-5 review: the HWM's expiry-immunity claim requires the mark
    to ride EVERY append — a plain maintenance write_snapshot(mode=
    'append') landing between stream batches must inherit the parent's
    batch_id_hwm, or expire_versions(keep_last=1) would retain only the
    hwm-less maintenance manifest and a replayed batch would re-append."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        expire_versions,
    )
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        publish_batch_versioned,
    )

    root = str(tmp_path / "hwm2")
    for bid in (0, 1):
        publish_batch_versioned(_df(spark, bid * 10, bid * 10 + 10), bid, root)
    # maintenance append with no batch meta — becomes the newest manifest
    write_snapshot(_df(spark, 100, 105), root, mode="append")
    assert table_history(root)[-1]["meta"]["batch_id_hwm"] == 1
    expire_versions(root, keep_last=1)
    # replay from before the retention horizon: still a no-op
    assert publish_batch_versioned(_df(spark, 0, 10), 1, root) is None
    assert read_snapshot(spark, root).count() == 25
    # and a genuinely new batch appends
    assert publish_batch_versioned(_df(spark, 20, 23), 2, root) is not None
    assert read_snapshot(spark, root).count() == 28


def test_merge_snapshot_upsert_minimal_rewrite(spark, tmp_path):
    """Copy-on-write MERGE (round 5): replacements keyed by id, inserts
    for unseen keys, files whose stats refute every update key listed
    UNCHANGED in the new version, old version time-travel intact,
    duplicate update keys rejected."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        _read_manifest, merge_snapshot,
    )

    root = str(tmp_path / "m1")
    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("v"))
    write_snapshot(base.repartitionByRange(8, "id"), root, stats_cols=["id"])
    files_v1 = set(_read_manifest(root, 1)["files"])

    # updates clustered in [100, 120) + two inserts beyond the domain
    updates = spark.range(100, 120).select(
        F.col("id"), F.lit(-1).alias("v")
    ).unionByName(spark.range(5000, 5002).select(
        F.col("id"), F.lit(-2).alias("v")))
    v2 = merge_snapshot(spark, root, updates, "id")
    assert v2 == 2

    got = read_snapshot(spark, root)
    assert got.count() == 1002
    assert got.filter(F.col("v") == -1).count() == 20
    assert got.filter(F.col("v") == -2).count() == 2
    assert got.filter((F.col("id") == 150) & (F.col("v") == 300)).count() == 1
    # minimal rewrite: most v1 files survive verbatim in v2's file list
    files_v2 = set(_read_manifest(root, 2)["files"])
    assert len(files_v1 & files_v2) >= 6, (files_v1, files_v2)
    # snapshot isolation: v1 unchanged
    assert read_snapshot(spark, root, version=1).filter(
        F.col("v") < 0).count() == 0

    with pytest.raises(ValueError, match="unique"):
        merge_snapshot(
            spark, root,
            spark.createDataFrame([(1, 9), (1, 8)], "id long, v long"), "id")
    with pytest.raises(ValueError, match="schema"):
        merge_snapshot(
            spark, root,
            spark.createDataFrame([(1,)], "id long"), "id")


def test_merge_preserves_bucket_transform(spark, tmp_path):
    """Merging a BUCKETED table must recompute the layout column for
    replacement/inserted rows and carry the spec, so point lookups stay
    correct (and job-free) across row-level updates."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        merge_snapshot, read_snapshot_bucket_eq, write_snapshot_bucketed,
    )

    root = str(tmp_path / "m2")
    src = spark.range(0, 500).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("p"))
    write_snapshot_bucketed(src, root, "k", n_buckets=8)
    updates = spark.createDataFrame(
        [(17, -17), (1000, -1)], "k long, p long")
    merge_snapshot(spark, root, updates, "k")
    # all previous k=17 rows replaced by the single update row
    got = read_snapshot_bucket_eq(spark, root, 17)
    assert [r["p"] for r in got.collect()] == [-17]
    # inserted key found through the bucket path too
    assert [r["p"] for r in read_snapshot_bucket_eq(spark, root, 1000).collect()] == [-1]
    # untouched key unaffected
    exp = sorted(r["p"] for r in src.filter(F.col("k") == 5).collect())
    assert sorted(r["p"] for r in
                  read_snapshot_bucket_eq(spark, root, 5).collect()) == exp


def test_delete_where_rows_and_pruning(spark, tmp_path):
    """Row-level DELETE: only predicate-matching rows go, files that
    provably contain none are listed unchanged, NULL-predicate rows
    survive (SQL DELETE semantics), old versions intact."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        _read_manifest, delete_where,
    )

    root = str(tmp_path / "d1")
    base = spark.range(0, 1000).select(
        F.when(F.col("id") == 7, None).otherwise(F.col("id")).alias("id"),
        (F.col("id") * 2).alias("v"),
    )
    write_snapshot(base.repartitionByRange(8, "id"), root, stats_cols=["id"])
    files_v1 = set(_read_manifest(root, 1)["files"])
    delete_where(spark, root, {"id": ("<", 100)})
    got = read_snapshot(spark, root)
    # 0..99 minus the NULL-id row deleted; the NULL row SURVIVES
    assert got.count() == 1000 - 99
    assert got.filter(F.col("id").isNull()).count() == 1
    assert got.filter(F.col("id") < 100).count() == 0
    files_v2 = set(_read_manifest(root, 2)["files"])
    assert len(files_v1 & files_v2) >= 6
    assert read_snapshot(spark, root, version=1).count() == 1000


def test_compact_snapshot(spark, tmp_path):
    """Compaction (round 5): micro-batch appends accrete small files;
    compact coalesces them into few outputs with the row set, schema
    and time-travel history untouched, re-collected stats still prune,
    and big files are listed unchanged."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        _read_manifest, compact_snapshot, plan_files,
    )
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        publish_batch_versioned,
    )

    root = str(tmp_path / "c1")
    for bid in range(5):
        publish_batch_versioned(
            _df(spark, bid * 100, bid * 100 + 100).repartition(2), bid, root)
    n_before = len(plan_files(root)[0])
    assert n_before >= 10  # 5 batches x 2 files
    v = compact_snapshot(spark, root, target_files=1)
    assert v == 6
    files, _, _ = plan_files(root)
    assert len(files) == 1
    got = read_snapshot(spark, root)
    assert got.count() == 500
    assert got.groupBy("id").count().filter(F.col("count") > 1).count() == 0
    # time travel to the pre-compaction version still sees the old files
    assert read_snapshot(spark, root, version=5).count() == 500
    assert len(plan_files(root, version=5)[0]) == n_before
    # durable meta (HWM) rode the compaction: replay still dedups
    assert _read_manifest(root, 6)["meta"]["batch_id_hwm"] == 4
    assert publish_batch_versioned(_df(spark, 0, 100), 4, root) is None

    # stats re-collected for the rewritten file -> pruning still sound
    root2 = str(tmp_path / "c2")
    for bid in range(4):
        publish_batch_versioned(
            _df(spark, bid * 100, bid * 100 + 100), bid, root2)
    compact_snapshot(spark, root2, target_files=4)
    # the table still equals itself under a predicate read
    got = read_snapshot(spark, root2, predicates={"id": (">=", 350)})
    assert got.count() == 50

    # a table with nothing to compact is a no-op
    assert compact_snapshot(spark, root, target_files=1) is None


def test_merge_fallback_pruning_is_sound(spark, tmp_path):
    """Round-5 review: above MERGE_KEY_COLLECT_CAP distinct keys the
    pruning falls back to [min,max] range overlap — the bounds must be
    the TRUE extremes (an aggregation), not a truncated sample's, or
    files holding unsampled keys survive unrewritten and the table ends
    up with duplicate keys."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "mf")
    base = spark.range(0, 20000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    write_snapshot(base.repartitionByRange(8, "id"), root, stats_cols=["id"])

    old_cap = V.MERGE_KEY_COLLECT_CAP
    V.MERGE_KEY_COLLECT_CAP = 100  # force the fallback path cheaply
    try:
        # >100 distinct keys spanning the whole domain, including both
        # extremes — under the buggy sample-bounds, edge files could be
        # wrongly kept
        updates = spark.range(0, 20000, 37).select(
            F.col("id"), F.lit(-5).alias("v"))
        V.merge_snapshot(spark, root, updates, "id")
    finally:
        V.MERGE_KEY_COLLECT_CAP = old_cap
    got = read_snapshot(spark, root)
    assert got.groupBy("id").count().filter(F.col("count") > 1).count() == 0
    n_up = got.filter(F.col("v") == -5).count()
    assert n_up == len(range(0, 20000, 37))


def test_delete_empty_predicates_refused(spark, tmp_path):
    """Round-5 review: delete_where({}) has a vacuous TRUE residual and
    would silently truncate the table — it must raise instead."""
    from decisions_knowledge_graph_data_spark.sources.versioned import delete_where

    root = str(tmp_path / "de")
    write_snapshot(_df(spark, 0, 10), root)
    with pytest.raises(ValueError, match="no predicates"):
        delete_where(spark, root, {})
    assert read_snapshot(spark, root).count() == 10


def test_hwm_rides_overwrite(spark, tmp_path):
    """Round-5 review: a maintenance OVERWRITE (e.g. re-clustering the
    same logical rows) must inherit the batch-id high-water mark too —
    otherwise expire_versions after the overwrite strands it and a
    replayed batch re-appends."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        expire_versions,
    )
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        publish_batch_versioned,
    )

    root = str(tmp_path / "ho")
    for bid in (0, 1):
        publish_batch_versioned(_df(spark, bid * 10, bid * 10 + 10), bid, root)
    # re-cluster: overwrite with the same rows, no batch meta
    write_snapshot(
        read_snapshot(spark, root).repartitionByRange(2, "id"), root)
    expire_versions(root, keep_last=1)
    assert publish_batch_versioned(_df(spark, 0, 10), 1, root) is None
    assert read_snapshot(spark, root).count() == 20


def test_rollback_to(spark, tmp_path):
    """Rollback commits a NEW version with the target's exact file
    list — no data copy, atomic flip, bad versions still readable, and
    the streaming HWM keeps its max so replays stay deduped."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        _read_manifest, rollback_to,
    )
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        publish_batch_versioned,
    )

    root = str(tmp_path / "rb")
    for bid in (0, 1, 2):
        publish_batch_versioned(_df(spark, bid * 10, bid * 10 + 10), bid, root)
    assert read_snapshot(spark, root).count() == 30
    v = rollback_to(root, 2)  # undo batch 2's publish
    assert v == 4
    assert read_snapshot(spark, root).count() == 20
    assert _read_manifest(root, 4)["files"] == _read_manifest(root, 2)["files"]
    # the "bad" version stays time-travel readable until expiry
    assert read_snapshot(spark, root, version=3).count() == 30
    # HWM kept its max across the rollback: batch 2 replay is a no-op
    assert publish_batch_versioned(_df(spark, 20, 30), 2, root) is None
    # but a genuinely new batch appends on top of the rolled-back state
    assert publish_batch_versioned(_df(spark, 50, 55), 3, root) is not None
    assert read_snapshot(spark, root).count() == 25
    # rolling back to the current pointer is a no-op
    assert rollback_to(root, 5) == 5
    with pytest.raises(FileNotFoundError):
        rollback_to(root, 99)


def test_read_appended_incremental(spark, tmp_path):
    """Incremental append scan: exactly the rows added after
    since_version; refuses ranges crossing a rewrite commit (file diff
    != row delta there)."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        delete_where, read_appended,
    )

    root = str(tmp_path / "inc")
    write_snapshot(_df(spark, 0, 10), root)
    write_snapshot(_df(spark, 10, 25), root, mode="append")
    write_snapshot(_df(spark, 25, 30), root, mode="append")

    inc = read_appended(spark, root, since_version=1)
    assert sorted(r["id"] for r in inc.collect()) == list(range(10, 30))
    inc2 = read_appended(spark, root, since_version=2, version=3)
    assert sorted(r["id"] for r in inc2.collect()) == list(range(25, 30))
    assert read_appended(spark, root, since_version=3).count() == 0

    delete_where(spark, root, {"id": ("<", 5)})
    write_snapshot(_df(spark, 30, 33), root, mode="append")
    # range crossing the delete commit is refused...
    with pytest.raises(ValueError, match="not pure append lineage"):
        read_appended(spark, root, since_version=2)
    # ...but the post-delete append-only range works
    inc3 = read_appended(spark, root, since_version=4)
    assert sorted(r["id"] for r in inc3.collect()) == [30, 31, 32]


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Z-order layout (round 5): after a Morton-interleaved write, a
    range predicate on EITHER column prunes files (a 1-d range layout
    answers the other column with a full scan), and every read equals
    the full scan + filter."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        plan_files, write_snapshot_zordered,
    )

    root = str(tmp_path / "z1")
    # 64x64 grid: x and y independent
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
    write_snapshot_zordered(df, root, ("x", "y"), n_files=16)
    n_files = len(plan_files(root)[0])
    assert n_files >= 8
    _, skip_x, _ = plan_files(root, predicates={"x": ("<", 8)})
    _, skip_y, _ = plan_files(root, predicates={"y": ("<", 8)})
    assert skip_x > 0 and skip_y > 0, (skip_x, skip_y, n_files)
    got = read_snapshot(
        spark, root, predicates={"x": ("<", 8), "y": ("<", 8)})
    exp = df.filter((F.col("x") < 8) & (F.col("y") < 8))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp.collect()}
    # the scratch z column never lands in the table
    assert sorted(read_snapshot(spark, root).columns) == ["x", "y"]


def test_zvalue_expr_no_int32_sign_wrap(spark):
    """Lane bit 15 shifts to position 31: with int32 lanes that is the
    sign bit, so every upper-half-of-a row went NEGATIVE and
    range-partitioned BEFORE the lower half (anti-Morton clustering;
    round-5 review). Bigint lanes keep the 32-bit z value positive and
    monotone across the old wrap boundary."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        _zvalue_expr,
    )

    df = spark.createDataFrame(
        [(32767, 0), (32768, 0), (65535, 65535)], "a: long, b: long"
    ).withColumn("z", _zvalue_expr(F.col("a"), F.col("b")))
    z = {r["a"]: r["z"] for r in df.collect()}
    assert z[32768] == 2**31  # was Integer.MIN_VALUE pre-fix
    assert z[65535] == 2**32 - 1  # all 32 bits set, still positive
    assert z[32767] < z[32768]  # order is monotone across the boundary


def _changes(spark, root, since, version=None):
    from decisions_knowledge_graph_data_spark.sources.versioned import read_changes

    return sorted(
        (r["_change_version"], r["_change_type"], r["id"], r["v"])
        for r in read_changes(spark, root, since, version).collect()
    )


def test_read_changes_row_level_cdc(spark, tmp_path):
    """Change feed across append + merge + delete: updates surface as
    delete(old)+insert(new); untouched rows carried by the CoW rewrite
    cancel; compaction is silent; the feed equals the snapshot diff."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        compact_snapshot, delete_where, merge_snapshot, read_changes,
    )

    root = str(tmp_path / "cdc")
    write_snapshot(
        _df(spark, 0, 20).repartitionByRange(4, "id"), root, stats_cols=["id"]
    )
    write_snapshot(_df(spark, 20, 26), root, mode="append")  # v2: +6 rows
    # v3: update ids 3,4 (v -> id*2+1), insert id 100
    src = spark.createDataFrame(
        [(3, 7), (4, 9), (100, 200)], "id: long, v: long"
    )
    merge_snapshot(spark, root, src, "id")
    delete_where(spark, root, {"id": ("<", 2)})  # v4: -2 rows
    compact_snapshot(spark, root, small_file_bytes=10**9)  # v5: silent

    got = _changes(spark, root, since=1)
    want = sorted(
        [(2, "insert", i, 2 * i) for i in range(20, 26)]
        + [(3, "delete", 3, 6), (3, "delete", 4, 8)]
        + [(3, "insert", 3, 7), (3, "insert", 4, 9), (3, "insert", 100, 200)]
        + [(4, "delete", 0, 0), (4, "delete", 1, 2)]
    )
    assert got == want

    # sub-ranges compose: (1,3] then (3,5] partition the feed
    assert _changes(spark, root, 1, 3) == [c for c in want if c[0] <= 3]
    assert _changes(spark, root, 3) == [c for c in want if c[0] > 3]
    # empty range -> empty feed with the contract columns
    empty = read_changes(spark, root, 5)
    assert empty.count() == 0
    assert {"_change_type", "_change_version"} <= set(empty.columns)

    # the feed REPLAYS to the end state: apply inserts minus deletes
    # over the since-snapshot and compare to the current snapshot
    base = {(r["id"], r["v"]) for r in read_snapshot(spark, root, version=1).collect()}
    for ver, typ, i, v in got:
        if typ == "insert":
            base.add((i, v))
        else:
            base.discard((i, v))
    now = {(r["id"], r["v"]) for r in read_snapshot(spark, root).collect()}
    assert base == now


def test_read_changes_rollback_emits_reverse_delta(spark, tmp_path):
    """A rollback commit's changes are the reverse of what it undoes."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        delete_where, read_changes, rollback_to,
    )

    root = str(tmp_path / "cdc_rb")
    write_snapshot(_df(spark, 0, 10).repartition(2), root, stats_cols=["id"])
    delete_where(spark, root, {"id": ("<", 3)})  # v2
    rollback_to(root, 1)  # v3: restores ids 0..2

    got = _changes(spark, root, since=2)
    assert got == [(3, "insert", i, 2 * i) for i in range(3)]
    # full range nets out: delete@2 then insert@3 for the same rows
    full = _changes(spark, root, since=1)
    assert full == sorted(
        [(2, "delete", i, 2 * i) for i in range(3)]
        + [(3, "insert", i, 2 * i) for i in range(3)]
    )


def test_read_changes_evolved_schema(spark, tmp_path):
    """Inserts after a schema-evolving append carry the new column;
    earlier commits' change rows read it as NULL."""
    from decisions_knowledge_graph_data_spark.sources.versioned import read_changes

    root = str(tmp_path / "cdc_evo")
    write_snapshot(_df(spark, 0, 5), root)
    write_snapshot(_df(spark, 5, 8), root, mode="append")  # v2: no extra col
    evolved = _df(spark, 8, 11).withColumn("tag", F.concat(F.lit("t"), "id"))
    write_snapshot(evolved, root, mode="append")  # v3: + tag column

    rows = {
        (r["_change_version"], r["id"]): r["tag"]
        for r in read_changes(spark, root, 1).collect()
    }
    assert rows[(2, 5)] is None and rows[(3, 8)] == "t8"


def test_read_changes_validation(spark, tmp_path):
    from decisions_knowledge_graph_data_spark.sources.versioned import read_changes

    root = str(tmp_path / "cdc_val")
    write_snapshot(_df(spark, 0, 5), root)
    with pytest.raises(FileNotFoundError, match="no committed version 9"):
        read_changes(spark, root, 9)
    write_snapshot(_df(spark, 5, 6), root, mode="append")
    with pytest.raises(ValueError, match="newer than"):
        read_changes(spark, root, 2, version=1)


def test_metadata_tables(spark, tmp_path):
    """snapshots/files metadata tables reflect history and carry the
    manifest's per-file stats."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        delete_where, files_df, snapshots_df,
    )

    root = str(tmp_path / "meta")
    write_snapshot(
        _df(spark, 0, 20).repartitionByRange(4, "id"), root, stats_cols=["id"]
    )
    write_snapshot(_df(spark, 20, 25), root, mode="append")
    delete_where(spark, root, {"id": ("<", 2)})

    snaps = {r["version"]: r for r in snapshots_df(spark, root).collect()}
    assert set(snaps) == {1, 2, 3}
    assert snaps[1]["parent"] is None and snaps[1]["mode"] == "overwrite"
    assert snaps[2]["mode"] == "append" and snaps[2]["parent"] == 1
    assert snaps[3]["mode"] == "delete"
    assert snaps[2]["n_files"] > snaps[1]["n_files"]

    files = files_df(spark, root).collect()
    assert len(files) == snaps[3]["n_files"]
    # stats round-trip: global min id over per-file stats == table min
    # (a 0-row rewrite output legitimately carries a nulls-only entry —
    # its min surfaces as SQL NULL and is skipped here)
    mins = [
        int(r["col_min"]["id"]) for r in files
        if r["col_min"].get("id") is not None
    ]
    assert min(mins) == 2  # ids < 2 were deleted
    assert all(r["size_bytes"] > 0 for r in files)
    # time travel: the v1 file listing is intact
    assert len(files_df(spark, root, version=1).collect()) == snaps[1]["n_files"]

    # an all-NULL stats column gets NO min/max (round-5: it DOES get a
    # null count, which is what lets value predicates prune the file
    # and metadata count(col) stay exact) — the absent bound must
    # surface as SQL NULL, never the string 'None'
    root2 = str(tmp_path / "meta_null")
    write_snapshot(
        _df(spark, 0, 5).coalesce(1).withColumn("w", F.lit(None).cast("long")),
        root2, stats_cols=["w", "id"],
    )
    for r in files_df(spark, root2).collect():
        assert r["col_min"].get("w") is None and r["col_max"].get("w") is None
        assert r["col_min"]["id"] != "None"
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        snapshot_meta_agg,
    )
    assert snapshot_meta_agg(root2, count_cols=["w"])["count_w"] == 0


def test_model_based_random_op_walk(spark, tmp_path):
    """Model-based check of the whole row-op surface: a seeded random
    walk of append/merge/delete/mor-delete/update/compact/rollback
    commits, mirrored on an independent Python dict model. After the walk, the
    current read, EVERY retained version's time-travel read, and the
    full + a mid-range CDC feed must all equal the model exactly."""
    import random

    from decisions_knowledge_graph_data_spark.sources.versioned import (
        compact_snapshot, delete_where, delete_where_mor, merge_snapshot,
        read_changes, rollback_to, update_where, write_snapshot,
    )

    for seed in (11, 23, 47):
        rng = random.Random(seed)
        root = str(tmp_path / f"model_{seed}")

        def mk(rows):
            data = [(i, v) for i, v in sorted(rows.items())]
            return spark.createDataFrame(data, "id: long, v: long")

        state = {i: i * 10 for i in range(12)}
        next_id = 12
        assert write_snapshot(
            mk(state).repartition(2), root, stats_cols=["id"]) == 1
        states = {1: dict(state)}
        cur = 1

        for _ in range(12):
            op = rng.choice([
                "append", "merge", "delete", "mor_delete", "update",
                "compact", "rollback",
            ])
            ver = None
            if op == "append":
                n = rng.randint(1, 5)
                new = {next_id + j: (next_id + j) * 10 + 1 for j in range(n)}
                next_id += n
                ver = write_snapshot(mk(new), root, mode="append")
                state.update(new)
            elif op == "merge":
                upd = {i: state[i] + 1
                       for i in rng.sample(sorted(state), k=min(3, len(state)))}
                n_ins = rng.randint(0, 2)
                ins = {next_id + j: (next_id + j) * 10 + 2 for j in range(n_ins)}
                next_id += n_ins
                src = {**upd, **ins}
                if src:
                    ver = merge_snapshot(spark, root, mk(src), "id")
                    state.update(src)
            elif op in ("delete", "mor_delete"):
                if rng.random() < 0.5:
                    cut = rng.randint(0, next_id)
                    pred = {"id": ("<", cut)}
                    survivors = {i: v for i, v in state.items() if not i < cut}
                else:
                    lo = rng.randint(0, next_id)
                    hi = lo + rng.randint(0, 6)
                    pred = {"id": ("between", (lo, hi))}
                    survivors = {i: v for i, v in state.items()
                                 if not (lo <= i <= hi)}
                if op == "delete":
                    ver = delete_where(spark, root, pred)
                else:
                    ver = delete_where_mor(spark, root, pred)
                if ver is not None:
                    # stats may overmatch: a commit can change no rows
                    state = survivors
                else:
                    # ...but never undermatch: no commit => no row matched
                    assert survivors == state, f"matching {op} must commit"
            elif op == "update":
                lo = rng.randint(0, next_id)
                hi = lo + rng.randint(0, 8)
                pred = {"id": ("between", (lo, hi))}
                ver = update_where(
                    spark, root, pred, {"v": F.col("v") + 7})
                after = {i: (v + 7 if lo <= i <= hi else v)
                         for i, v in state.items()}
                if ver is not None:
                    state = after
                else:
                    assert after == state, "matching update must commit"
            elif op == "compact":
                ver = compact_snapshot(spark, root, small_file_bytes=10**9)
                # row-preserving: state unchanged either way
            elif op == "rollback":
                target = rng.choice(sorted(states))
                ver = rollback_to(root, target)
                if target == cur:
                    ver = None  # no-op rollback returns the pointer
                else:
                    state = dict(states[target])
            if ver is not None:
                assert ver == cur + 1, f"{op} committed {ver}, expected {cur + 1}"
                cur = ver
                states[ver] = dict(state)

        # 1) current state and 2) every version's time-travel read
        for v, want in states.items():
            got = {r["id"]: r["v"]
                   for r in read_snapshot(spark, root, version=v).collect()}
            assert got == want, f"seed {seed}: version {v} mismatch"

        # 3) the CDC feed over the whole walk == the model's state diffs
        def model_feed(lo, hi):
            feed = []
            vs = sorted(v for v in states if lo <= v <= hi)
            for prev, nxt in zip(vs, vs[1:]):
                old, new = states[prev], states[nxt]
                o_items, n_items = set(old.items()), set(new.items())
                feed += [(nxt, "insert", i, v) for i, v in n_items - o_items]
                feed += [(nxt, "delete", i, v) for i, v in o_items - n_items]
            return sorted(feed)

        got_feed = sorted(
            (r["_change_version"], r["_change_type"], r["id"], r["v"])
            for r in read_changes(spark, root, 1).collect())
        assert got_feed == model_feed(1, cur), f"seed {seed}: full feed"

        if cur >= 3:
            mid_lo = sorted(states)[len(states) // 3]
            mid_hi = sorted(states)[2 * len(states) // 3]
            got_mid = sorted(
                (r["_change_version"], r["_change_type"], r["id"], r["v"])
                for r in read_changes(
                    spark, root, mid_lo, version=mid_hi).collect())
            assert got_mid == model_feed(mid_lo, mid_hi), f"seed {seed}: mid feed"


def test_read_changes_scans_only_churned_files(spark, tmp_path):
    """Scale contract: the change feed's scan set is exactly the files
    the commits in range added or removed — never the whole table
    (cost proportional to churn)."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        merge_snapshot, read_changes, _read_manifest,
    )

    root = str(tmp_path / "cdc_scan")
    write_snapshot(
        spark.range(0, 800).select(F.col("id"), (F.col("id") * 3).alias("v"))
        .repartitionByRange(8, "id"),
        root, stats_cols=["id"],
    )
    # touch only the file(s) holding ids 5 and 7
    merge_snapshot(
        spark, root,
        spark.createDataFrame([(5, 0), (7, 0)], "id: long, v: long"), "id")

    m1, m2 = _read_manifest(root, 1), _read_manifest(root, 2)
    churn = (set(m1["files"]) - set(m2["files"])) | (
        set(m2["files"]) - set(m1["files"]))
    assert 0 < len(churn) < len(m2["files"])  # minimal rewrite happened

    feed = read_changes(spark, root, 1)
    scanned = {f.split("file:")[-1].replace(root + "/", "").lstrip("/")
               for f in feed.inputFiles()}
    assert scanned == churn, (scanned, churn)
    # and the feed itself is the two-row update, carried rows cancelled
    rows = sorted((r["_change_type"], r["id"], r["v"]) for r in feed.collect())
    assert rows == [("delete", 5, 15), ("delete", 7, 21),
                    ("insert", 5, 0), ("insert", 7, 0)]


def test_semijoin_read_prunes_and_matches(spark, tmp_path, monkeypatch):
    """Join-driven file pruning: the semi-join read equals the full-scan
    semi-join, the EXACT key ladder skips range-overlapped files that
    contain no key (where a [min,max] ladder keeps everything between
    the extremes), the above-cap fallback degrades to range overlap,
    and empty/NULL key sets behave as SQL semi-join."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "sj")
    write_snapshot(
        _df(spark, 0, 200).repartitionByRange(10, "id"), root,
        stats_cols=["id"],
    )
    n_files = len(V.plan_files(root)[0])
    assert n_files >= 8

    # two far-apart keys + a NULL: the exact ladder keeps only the
    # files whose range CONTAINS a key, not everything in between
    keys = spark.createDataFrame([(5,), (183,), (None,)], "k: long")
    got = V.read_snapshot_semijoin(spark, root, keys, "id")
    assert sorted(r["id"] for r in got.collect()) == [5, 183]
    kept, skipped = V.plan_files_semijoin(root, "id", [5, 183])
    assert len(kept) <= 2 and skipped >= n_files - 2, (len(kept), skipped)

    # row-exact within a kept file: sibling ids in the same file as 5
    # are filtered by the semi-join, not returned
    exp = (
        read_snapshot(spark, root)
        .join(keys.distinct(), F.col("id") == F.col("k"), "left_semi")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))

    # above-cap fallback: [min,max] overlap still prunes the tails
    monkeypatch.setattr(V, "MERGE_KEY_COLLECT_CAP", 1)
    got_fb = V.read_snapshot_semijoin(spark, root, keys, "id")
    assert sorted(r["id"] for r in got_fb.collect()) == [5, 183]

    # empty key set: empty result, user schema, no layout leak
    empty = V.read_snapshot_semijoin(
        spark, root, spark.createDataFrame([], "k: long"), "id")
    assert empty.count() == 0 and empty.columns == ["id", "v"]
    assert V.plan_files_semijoin(root, "id", []) == ([], n_files)

    # reserved-name guard
    monkeypatch.undo()
    root2 = str(tmp_path / "sj2")
    write_snapshot(
        _df(spark, 0, 5).withColumnRenamed("v", "_sjk"), root2)
    with pytest.raises(ValueError, match="_sjk"):
        V.read_snapshot_semijoin(
            spark, root2, spark.createDataFrame([(1,)], "k: long"), "id")

    # multi-column key frame is refused
    with pytest.raises(ValueError, match="single-column"):
        V.read_snapshot_semijoin(spark, root, _df(spark, 0, 3), "id")


def test_incremental_mv_maintenance(spark, tmp_path):
    """plans/ivm.py: the MV folds multi-commit change feeds (merge +
    delete) without rescanning the source, drops groups whose count
    reaches 0, no-ops on an unchanged source, and falls back to a full
    rebuild when the applied version fell out of retention."""
    from decisions_knowledge_graph_data_spark.plans.ivm import (
        mv_applied_version, refresh_agg_mv,
    )
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        delete_where, expire_versions, merge_snapshot,
    )

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    rows = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40),
            (5, "c", 50), (6, "c", 60)]
    write_snapshot(
        spark.createDataFrame(rows, "id long, grp string, x long"), src)
    assert refresh_agg_mv(spark, src, mv, ["grp"], ["x"]) == 1
    assert mv_applied_version(mv) == 1

    # v2: merge (update id=1's x, insert id=7 into c); v3: delete grp a
    merge_snapshot(
        spark, src,
        spark.createDataFrame([(1, "a", 100), (7, "c", 70)],
                              "id long, grp string, x long"),
        "id",
    )
    delete_where(spark, src, {"grp": ("==", "a")})
    assert refresh_agg_mv(spark, src, mv, ["grp"], ["x"]) == 3

    def mv_rows():
        return {
            (r["grp"], r["n_rows"], r["sum_x"])
            for r in read_snapshot(spark, mv).collect()
        }

    # grp a disappeared (count hit 0); b unchanged; c gained id=7
    assert mv_rows() == {("b", 2, 70), ("c", 3, 180)}

    # no-op refresh: no new MV commit
    v_mv = current_version(mv)
    assert refresh_agg_mv(spark, src, mv, ["grp"], ["x"]) == 3
    assert current_version(mv) == v_mv

    # retention lapse: commit v4 then expire everything below it — the
    # change window from applied=3 is gone, so the refresh rebuilds
    write_snapshot(
        spark.createDataFrame([(8, "d", 80)], "id long, grp string, x long"),
        src, mode="append",
    )
    expire_versions(src, keep_last=1)
    assert refresh_agg_mv(spark, src, mv, ["grp"], ["x"]) == 4
    assert mv_rows() == {("b", 2, 70), ("c", 3, 180), ("d", 1, 80)}
    assert mv_applied_version(mv) == 4


def test_incremental_mv_minmax(spark, tmp_path, monkeypatch):
    """plans/ivm.py minmax_cols: min/max fold scan-free under inserts
    and non-extremal deletes; a delete that ties the folded extremum
    triggers a rescan of ONLY the affected groups; the affected test
    runs against the FOLDED state so a group born and partially deleted
    inside one refresh window repairs correctly; a spec change is
    refused instead of silently mis-maintained."""
    import decisions_knowledge_graph_data_spark.plans.ivm as ivm
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        delete_where,
    )

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30),
            (4, "b", 5), (5, "b", 50)]
    # one row per file + id stats: point deletes prune to exactly the
    # file holding the row, so the net file diff carries no bystander
    # rows (a shared file would put a KEPT extremum on the delete side
    # and — conservatively, correctly — force a repair; an unclustered
    # write would trip the rewrite-everything heuristic and rebuild).
    # grp stats make extrema repair take the file-local semijoin read.
    write_snapshot(
        spark.createDataFrame(
            rows, "id long, grp string, x long"
        ).repartitionByRange(8, "id"),
        src, stats_cols=["id", "grp"],
    )

    def mv_rows():
        return {
            (r["grp"], r["n_rows"], r["sum_x"], r["min_x"], r["max_x"])
            for r in read_snapshot(spark, mv).collect()
        }

    args = (spark, src, mv, ["grp"], ["x"])
    assert ivm.refresh_agg_mv(*args, minmax_cols=["x"]) == 1
    assert mv_rows() == {("a", 3, 60, 10, 30), ("b", 2, 55, 5, 50)}

    # spy on ivm's full snapshot reads AND the semijoin repair read to
    # prove which refreshes touch the source, and how
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    src_reads, sj_reads = [], []
    real_read, real_sj = ivm.read_snapshot, V.read_snapshot_semijoin

    def spy(s, root, **kw):
        if root == src:
            src_reads.append(kw)
        return real_read(s, root, **kw)

    def spy_sj(s, root, *a, **kw):
        sj_reads.append(root)
        return real_sj(s, root, *a, **kw)

    monkeypatch.setattr(ivm, "read_snapshot", spy)
    monkeypatch.setattr(V, "read_snapshot_semijoin", spy_sj)

    # non-extremal delete (a's x=20): fold-only, the source is not read
    delete_where(spark, src, {"id": ("==", 2)})
    assert ivm.refresh_agg_mv(*args, minmax_cols=["x"]) == 2
    assert src_reads == [] and sj_reads == []
    assert mv_rows() == {("a", 2, 40, 10, 30), ("b", 2, 55, 5, 50)}

    # extremal delete (a's min x=10): the single grp key has file stats,
    # so repair is the file-local semijoin read — never a full snapshot
    delete_where(spark, src, {"id": ("==", 1)})
    assert ivm.refresh_agg_mv(*args, minmax_cols=["x"]) == 3
    assert src_reads == [] and len(sj_reads) == 1
    assert mv_rows() == {("a", 1, 30, 30, 30), ("b", 2, 55, 5, 50)}

    # a group born AND partially deleted inside one refresh window: the
    # NET file diff cancels the born-and-died file, so the delete of
    # the would-be group min (7) never even reaches the fold — correct
    # result with NO rescan (src_reads stays at 1)
    write_snapshot(
        spark.createDataFrame([(6, "d", 7), (7, "d", 70)],
                              "id long, grp string, x long"),
        src, mode="append",
    )
    delete_where(spark, src, {"id": ("==", 6)})
    assert ivm.refresh_agg_mv(*args, minmax_cols=["x"]) == 5
    assert src_reads == [] and len(sj_reads) == 1
    assert mv_rows() == {("a", 1, 30, 30, 30), ("b", 2, 55, 5, 50),
                         ("d", 1, 70, 70, 70)}

    # refusing to maintain across a spec change (sum-only vs minmax MV)
    delete_where(spark, src, {"id": ("==", 7)})
    with pytest.raises(ValueError, match="different spec"):
        ivm.refresh_agg_mv(*args)


def test_stream_publish_with_mv(spark, tmp_path):
    """streaming/incremental.stream_publish_with_mv: a multi-batch
    drain publishes each micro-batch exactly-once AND folds it into the
    MV, leaving the MV at the table head and equal to the full
    aggregate; a checkpoint re-run with no new input changes nothing."""
    from decisions_knowledge_graph_data_spark.plans.ivm import (
        mv_applied_version,
    )
    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        stream_publish_with_mv,
    )

    in_dir = str(tmp_path / "in")
    root, mv = str(tmp_path / "tbl"), str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(0, 100).select(
        "id",
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 3).alias("x"),
    )
    df.repartitionByRange(2, "id").write.parquet(in_dir)

    args = (spark, in_dir, root, df.schema, ckpt, mv, ["grp"], ["x"])
    q = stream_publish_with_mv(*args, minmax_cols=["x"],
                               max_files_per_trigger=1)
    q.awaitTermination()
    assert current_version(root) >= 2, "drain must split into batches"
    assert mv_applied_version(mv) == current_version(root)

    expect = {
        (str(g), 20, sum(3 * i for i in range(100) if i % 5 == g),
         3 * g, 3 * (95 + g))
        for g in range(5)
    }
    got = {
        (r["grp"], r["n_rows"], r["sum_x"], r["min_x"], r["max_x"])
        for r in read_snapshot(spark, mv).collect()
    }
    assert got == expect

    # re-run off the same checkpoint with no new files: pure no-op
    v_t, v_m = current_version(root), current_version(mv)
    q2 = stream_publish_with_mv(*args, minmax_cols=["x"],
                                max_files_per_trigger=1)
    q2.awaitTermination()
    assert (current_version(root), current_version(mv)) == (v_t, v_m)


def test_write_audit_publish(spark, tmp_path):
    """WAP staging: invisible until published, survives interleaved
    commits and their GC, appends rebase onto a moved parent, stale
    overwrites refuse, aborts clean up, durable meta is inherited."""
    import os

    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10), root, meta={"batch_id_hwm": 7})

    # stage an append: committed readers see nothing, the audit view
    # sees base + staged
    wid = V.stage_snapshot(_df(spark, 10, 15), root, mode="append",
                           wap_id="w1")
    assert wid == "w1"
    assert read_snapshot(spark, root).count() == 10
    assert V.read_snapshot_staged(spark, root, "w1").count() == 15
    assert [e["wap_id"] for e in V.list_staged(root)] == ["w1"]
    with pytest.raises(ValueError, match="already exists"):
        V.stage_snapshot(_df(spark, 0, 1), root, wap_id="w1")

    # an unrelated commit lands mid-audit; its GC must NOT vaporize the
    # staged data, and publish rebases the append onto the moved parent
    write_snapshot(_df(spark, 100, 103), root, mode="append")
    staged_dirs = {f.split("/", 1)[0]
                   for f in V._load_staged(root, "w1")["new_files"]}
    assert all(os.path.isdir(os.path.join(root, d)) for d in staged_dirs)
    v = V.publish_staged(root, "w1")
    assert v == 3 and current_version(root) == 3
    assert read_snapshot(spark, root).count() == 18
    assert V.list_staged(root) == []
    # durable meta inherited through the publish
    assert V._read_manifest(root, 3)["meta"]["batch_id_hwm"] == 7
    with pytest.raises(FileNotFoundError, match="published or aborted"):
        V.publish_staged(root, "w1")

    # abort drops the entry AND its data dir
    w2 = V.stage_snapshot(_df(spark, 20, 25), root, mode="append")
    d2 = {f.split("/", 1)[0] for f in V._load_staged(root, w2)["new_files"]}
    V.abort_staged(root, w2)
    assert V.list_staged(root) == []
    assert not any(os.path.isdir(os.path.join(root, d)) for d in d2)
    assert read_snapshot(spark, root).count() == 18

    # a staged OVERWRITE refuses to publish over interleaved commits
    w3 = V.stage_snapshot(_df(spark, 0, 4), root, mode="overwrite")
    write_snapshot(_df(spark, 200, 201), root, mode="append")
    with pytest.raises(ValueError, match="re-stage"):
        V.publish_staged(root, w3)
    V.abort_staged(root, w3)

    # ...and publishes cleanly when the table did not move
    w4 = V.stage_snapshot(_df(spark, 0, 4), root, mode="overwrite")
    V.publish_staged(root, w4)
    assert read_snapshot(spark, root).count() == 4

    # staged appends refuse transformed parents (layout-column hazard)
    broot = str(tmp_path / "bucketed")
    V.write_snapshot_bucketed(_df(spark, 0, 20), broot, "id", 4)
    with pytest.raises(ValueError, match="layout column"):
        V.stage_snapshot(_df(spark, 20, 25), broot, mode="append")

    # crash window: publish swapped the pointer but died before the
    # entry unlink — the stale entry sits over COMMITTED files. A retry
    # publish must no-op (no duplicate file paths), and abort must not
    # rmtree live data.
    import shutil as _sh

    w5 = V.stage_snapshot(_df(spark, 50, 55), root, mode="append")
    saved = str(tmp_path / "saved_entry.json")
    _sh.copy(V._staged_path(root, w5), saved)
    v5 = V.publish_staged(root, w5)
    n_after = read_snapshot(spark, root).count()
    _sh.copy(saved, V._staged_path(root, w5))  # resurrect = simulated crash
    assert V.publish_staged(root, w5) == v5  # tier-2 replay: file subset
    assert current_version(root) == v5
    # tier-1 replay: the entry carries its publishing_version marker and
    # the committed manifest carries the wap_id
    import json as _json

    with open(saved) as f:
        e = _json.load(f)
    assert V._read_manifest(root, v5)["meta"]["wap_id"] == w5
    e["publishing_version"] = v5
    with open(V._staged_path(root, w5), "w") as f:
        _json.dump(e, f)
    assert V.publish_staged(root, w5) == v5
    assert current_version(root) == v5
    _sh.copy(saved, V._staged_path(root, w5))
    V.abort_staged(root, w5)  # janitor pass must not destroy live data
    assert read_snapshot(spark, root).count() == n_after


def test_tags_pin_versions_through_retention(spark, tmp_path):
    """Tags: named immutable refs; expire_versions keeps tagged versions
    (manifest + data) alive regardless of keep_last; delete_tag makes
    them expirable again; reads resolve by tag name."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10), root)
    assert V.create_tag(root, "baseline") == 1
    write_snapshot(_df(spark, 100, 105), root, mode="overwrite")
    write_snapshot(_df(spark, 200, 202), root, mode="overwrite")

    assert V.list_tags(root) == {"baseline": 1}
    assert read_snapshot(spark, root, tag="baseline").count() == 10
    with pytest.raises(ValueError, match="exactly one"):
        read_snapshot(spark, root, tag="baseline", version=1)

    # retention: keep_last=1 would normally drop v1 and v2 — the tag
    # pins v1 (manifest AND data dir), v2 goes
    res = V.expire_versions(root, keep_last=1)
    assert res["expired_versions"] == [2]
    assert read_snapshot(spark, root, tag="baseline").count() == 10
    assert read_snapshot(spark, root).count() == 2
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=2)

    # immutability + validation
    with pytest.raises(ValueError, match="immutable"):
        V.create_tag(root, "baseline")
    with pytest.raises(ValueError, match="invalid tag name"):
        V.create_tag(root, "../escape")
    with pytest.raises(FileNotFoundError):
        V.resolve_tag(root, "nope")

    # delete_tag → the pinned version becomes expirable
    V.delete_tag(root, "baseline")
    res = V.expire_versions(root, keep_last=1)
    assert res["expired_versions"] == [1]
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, tag="baseline")


def test_versioned_appends_stream_source(spark, tmp_path):
    """sources/versioned_stream.py: a versioned table is a streaming
    SOURCE with manifest-version offsets — a drain delivers exactly the
    committed rows, a checkpointed re-drain consumes only the delta,
    pre-evolution files surface added columns as NULL, and a rewrite
    commit in the window refuses (append-only contract)."""
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        delete_where,
    )
    from decisions_knowledge_graph_data_spark.sources.versioned_stream import (
        VersionedAppendsDataSource,
    )

    root = str(tmp_path / "tbl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    write_snapshot(_df(spark, 0, 50), root)
    write_snapshot(_df(spark, 50, 80), root, mode="append")
    spark.dataSource.register(VersionedAppendsDataSource)

    def drain():
        q = (
            spark.readStream.format("versioned_appends")
            .option("path", root).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        # mergeSchema: the plain parquet SINK dir accrues files of both
        # pre- and post-evolution schemas across drains
        return spark.read.option("mergeSchema", "true").parquet(out)

    got = drain()
    assert got.count() == 80 and got.select("id").distinct().count() == 80

    # schema evolution mid-stream: the appended frame adds a column;
    # the source schema is fixed per QUERY START, so the re-drain plans
    # with the evolved schema and the new batch carries the new column
    evolved = _df(spark, 80, 90).withColumn("tagcol", F.lit("new"))
    write_snapshot(evolved, root, mode="append")
    got = drain()
    assert got.count() == 90
    assert got.filter(F.col("tagcol") == "new").count() == 10

    # exactly-once across restarts: nothing new → no new rows
    assert drain().count() == 90

    # a rewrite commit breaks the append-only contract loudly
    delete_where(spark, root, {"id": ("==", 1)})
    write_snapshot(_df(spark, 90, 92), root, mode="append")

    with pytest.raises(Exception, match="delete|append"):
        q = (
            spark.readStream.format("versioned_appends")
            .option("path", root).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()


def test_evolution_nonnullable_added_column(spark, tmp_path):
    """Regression: a column added by an append with a NON-nullable type
    (e.g. F.lit(...)) must be recorded nullable in the merged schema —
    pre-evolution files read it as NULL, and a non-nullable recorded
    field makes the vectorized parquet reader refuse those files
    ('Required column is missing in data file')."""
    root = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 5), root)
    write_snapshot(
        _df(spark, 5, 8).withColumn("tagcol", F.lit("new")),
        root, mode="append",
    )
    got = read_snapshot(spark, root)
    assert got.schema["tagcol"].nullable
    assert got.count() == 8
    assert got.filter(F.col("tagcol").isNull()).count() == 5
    assert got.filter(F.col("tagcol") == "new").count() == 3


def test_snapshot_meta_agg(spark, tmp_path):
    """snapshot_meta_agg answers count/min/max from the manifest alone,
    stays exact across append / merge / delete / staged-publish
    commits, and refuses rather than guesses when counts or stats are
    missing."""
    import json as _json
    import os

    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "tbl")
    write_snapshot(
        _df(spark, 0, 100).repartitionByRange(4, "id"),
        root, stats_cols=["id", "v"],
    )
    assert V.snapshot_meta_agg(root, ["id", "v"]) == {
        "n_rows": 100, "min_id": 0, "max_id": 99, "min_v": 0, "max_v": 198}

    # append, merge, delete, staged publish — counts stay exact
    write_snapshot(_df(spark, 100, 120), root, mode="append")
    V.merge_snapshot(
        spark, root,
        spark.createDataFrame([(5, 999), (200, 400)], "id long, v long"),
        "id",
    )
    V.delete_where(spark, root, {"id": ("<", 10)})
    wid = V.stage_snapshot(_df(spark, 300, 310), root, mode="append")
    V.publish_staged(root, wid)

    expect = read_snapshot(spark, root).count()
    got = V.snapshot_meta_agg(root, ["id"])
    assert got["n_rows"] == expect
    assert got["min_id"] == 10 and got["max_id"] == 309
    # time travel: the agg is per-version
    assert V.snapshot_meta_agg(root, version=1)["n_rows"] == 100

    # a column without recorded stats refuses
    with pytest.raises(ValueError, match="lacks min/max stats"):
        V.snapshot_meta_agg(root, ["nope"])

    # a manifest stripped of row counts (pre-feature table) refuses
    v = current_version(root)
    mp = V._manifest_path(root, v)
    with open(mp) as f:
        m = _json.load(f)
    del m["file_rows"]
    with open(mp, "w") as f:
        _json.dump(m, f)
    with pytest.raises(ValueError, match="no recorded row count"):
        V.snapshot_meta_agg(root)


def test_null_count_stats_prune_and_meta_count(spark, tmp_path):
    """Round-5: per-file null counts ride the footer read — isnull /
    notnull predicates prune files, an all-NULL file refutes any value
    predicate, and SQL count(col) is answerable from metadata alone."""
    import pytest
    from pyspark.sql import functions as F

    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "t")
    # 4 range files: ids 0-249 never NULL, 250-499 all NULL, rest mixed
    df = spark.range(1000).select(
        F.col("id"),
        F.when(
            (F.col("id") < 250)
            | ((F.col("id") >= 500) & (F.col("id") % 3 == 0)),
            F.col("id") * 2.0,
        ).alias("v"),
    ).repartitionByRange(4, "id")
    V.write_snapshot(df, root, stats_cols=["id", "v"])

    full = V.read_snapshot(spark, root)
    # isnull: the no-NULL file (ids 0-249) is pruned
    _, skipped, _ = V.plan_files(root, predicates={"v": ("isnull", None)})
    assert skipped >= 1
    got = V.read_snapshot(spark, root, predicates={"v": ("isnull", None)})
    assert got.count() == full.filter(F.col("v").isNull()).count()
    # notnull: the all-NULL file (ids 250-499) is pruned
    _, skipped, _ = V.plan_files(root, predicates={"v": ("notnull", None)})
    assert skipped >= 1
    got = V.read_snapshot(spark, root, predicates={"v": ("notnull", None)})
    assert got.count() == full.filter(F.col("v").isNotNull()).count()
    # a value predicate also refutes the all-NULL file (its only stats
    # entry is the null count — NULL never satisfies a comparison)
    _, skipped_val, _ = V.plan_files(root, predicates={"v": (">=", 0.0)})
    assert skipped_val >= 1
    got = V.read_snapshot(spark, root, predicates={"v": (">=", 0.0)})
    assert got.count() == full.filter(F.col("v") >= 0.0).count()

    # metadata-only count(col) == SQL count (NULLs excluded), count(*)
    agg = V.snapshot_meta_agg(root, count_cols=["v"])
    assert agg["n_rows"] == 1000
    assert agg["count_v"] == full.filter(F.col("v").isNotNull()).count()
    # appends inherit the stats columns, counts stay exact
    V.write_snapshot(
        spark.range(2000, 2010).select(
            F.col("id"), F.lit(None).cast("double").alias("v")),
        root, mode="append",
    )
    assert V.snapshot_meta_agg(root, count_cols=["v"])["count_v"] == agg["count_v"]
    # refusals: un-statted column; merge-on-read deletes in place
    with pytest.raises(ValueError, match="null count"):
        V.snapshot_meta_agg(root, count_cols=["id2_missing"])
    V.delete_where_mor(spark, root, {"id": ("==", 0)})
    with pytest.raises(ValueError, match="merge-on-read"):
        V.snapshot_meta_agg(root, count_cols=["v"])


def test_update_where_semantics_pruning_and_layout(spark, tmp_path):
    """Round-5 UPDATE: predicate-gated assignments with SQL NULL
    semantics, stats-pruned minimal rewrite, type-stable schema,
    layout recompute when the bucket source column is assigned, and
    merge-on-read absorption on touched files."""
    import pytest
    from pyspark.sql import functions as F

    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "t")
    V.write_snapshot(
        spark.range(1000).select(
            F.col("id"), (F.col("id") % 7).alias("g"),
            F.when(F.col("id") % 11 != 0, F.col("id") * 2.0).alias("v"),
        ).repartitionByRange(4, "id"),
        root, stats_cols=["id"],
    )
    v2 = V.update_where(
        spark, root, {"id": ("between", (100, 199))},
        {"v": F.col("v") + 1000.0, "g": -1},
    )
    assert v2 == 2
    m = V._read_manifest(root, 2)
    m1 = V._read_manifest(root, 1)
    # minimal rewrite: only the file covering [100,199] was touched
    assert len(set(m["files"]) & set(m1["files"])) == 3
    out = V.read_snapshot(spark, root)
    hit = out.filter(F.col("id").between(100, 199))
    # NULL-predicate rows are a non-issue here, but NULL v rows in the
    # hit range must still update g while v stays NULL + 1000 = NULL
    assert hit.filter(F.col("g") != -1).count() == 0
    assert hit.filter(F.col("id") % 11 == 0).filter(
        F.col("v").isNotNull()).count() == 0
    assert out.filter(
        ~F.col("id").between(100, 199)).filter(F.col("g") == -1).count() == 0
    # assigned ints were cast to the column's manifest types
    assert dict(out.dtypes)["g"] == "bigint" and dict(out.dtypes)["v"] == "double"
    # no-op update commits nothing
    assert V.update_where(
        spark, root, {"id": ("==", -5)}, {"g": 0}) is None
    # refusals
    with pytest.raises(ValueError, match="no predicates"):
        V.update_where(spark, root, {}, {"g": 0})
    with pytest.raises(ValueError, match="assignment"):
        V.update_where(spark, root, {"id": ("==", 1)}, {})
    with pytest.raises(ValueError, match="not a table column"):
        V.update_where(spark, root, {"id": ("==", 1)}, {"nope": 0})

    # MoR absorption: a delete-bearing touched file must not resurrect
    V.delete_where_mor(spark, root, {"id": ("==", 150)})
    V.update_where(spark, root, {"id": ("between", (100, 199))}, {"g": -2})
    out = V.read_snapshot(spark, root)
    assert out.filter(F.col("id") == 150).count() == 0
    assert out.count() == 999

    # bucketed table: assigning the bucket source column recomputes the
    # layout so the point lookup finds the moved row
    broot = str(tmp_path / "b")
    V.write_snapshot_bucketed(
        spark.range(500).select(F.col("id"), (F.col("id") * 3).alias("k")),
        broot, "k", n_buckets=8)
    V.update_where(spark, broot, {"id": ("==", 7)}, {"k": 999_999})
    hit = V.read_snapshot_bucket_eq(spark, broot, 999_999)
    assert [r["id"] for r in hit.collect()] == [7]
    assert V.read_snapshot_bucket_eq(spark, broot, 21).count() == 0
    with pytest.raises(ValueError, match="internal"):
        V.update_where(spark, broot, {"id": ("==", 1)}, {V.BUCKET_COL: 0})


def test_concurrent_append_rebases_and_survives_interleaved_gc(
    spark, tmp_path, monkeypatch
):
    """Optimistic append (lock-free data write): a full pessimistic
    commit landing BETWEEN the data write and the commit (running its
    orphan GC) must neither vaporize the pinned half-written dir nor be
    clobbered — the optimistic commit rebases onto it as parent."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "occ")
    V.write_snapshot(_df(spark, 0, 10), root, stats_cols=["id"])

    real_wait = V._acquire_lock_wait
    hits = {"n": 0}

    def interleave(r, timeout):
        # fires after the optimistic data write, before its commit:
        # another writer lands a whole append (lock + GC + publish)
        if hits["n"] == 0:
            hits["n"] += 1
            V.write_snapshot(_df(spark, 100, 105), root, mode="append")
        return real_wait(r, timeout)

    monkeypatch.setattr(V, "_acquire_lock_wait", interleave)
    v = V.write_snapshot_concurrent(_df(spark, 200, 203), root)
    assert v == 3  # rebased onto the interloper's v2
    m = V._read_manifest(root, v)
    assert m["parent"] == 2 and m["mode"] == "append"
    got = sorted(
        r["id"] for r in read_snapshot(spark, root).select("id").collect()
    )
    assert got == list(range(0, 10)) + list(range(100, 105)) + [200, 201, 202]
    # stats inherited from the commit-time parent: the new files carry
    # id min/max so predicate pruning keeps working
    new_files = [f for f in m["files"] if f not in
                 V._read_manifest(root, 2)["files"]]
    assert new_files and all(
        "id" in m["file_stats"].get(f, {}) for f in new_files
    )
    # pin removed after commit; no stray data dirs beyond the manifest
    sdir = os.path.join(root, V.STAGED_DIR)
    assert not [n for n in os.listdir(sdir) if n.startswith("pin-")]
    live = {f.split("/", 1)[0] for f in m["files"]}
    on_disk = {n for n in os.listdir(root) if n.startswith(V.DATA_PREFIX)}
    assert on_disk == live


def test_concurrent_append_dead_pin_collected(spark, tmp_path):
    """A pin whose writer pid is dead is dropped by the next GC and its
    half-written dir reclaimed; a live pin keeps its dir."""
    import json as _json
    import subprocess

    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "occ2")
    V.write_snapshot(_df(spark, 0, 5), root)
    sdir = os.path.join(root, V.STAGED_DIR)
    os.makedirs(sdir, exist_ok=True)
    # dead writer: a real pid that has exited (and been reaped)
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead_dir = os.path.join(root, f"{V.DATA_PREFIX}deadpin")
    os.makedirs(dead_dir)
    with open(os.path.join(sdir, "pin-dead.json"), "w") as f:
        _json.dump({"pin_dir": os.path.basename(dead_dir),
                    "pid": proc.pid, "created_at": 0}, f)
    # live writer (this process)
    live_dir = os.path.join(root, f"{V.DATA_PREFIX}livepin")
    os.makedirs(live_dir)
    with open(os.path.join(sdir, "pin-live.json"), "w") as f:
        _json.dump({"pin_dir": os.path.basename(live_dir),
                    "pid": os.getpid(), "created_at": 0}, f)

    V.write_snapshot(_df(spark, 5, 8), root, mode="append")  # runs GC
    assert not os.path.exists(dead_dir)
    assert not os.path.exists(os.path.join(sdir, "pin-dead.json"))
    assert os.path.isdir(live_dir)
    assert os.path.exists(os.path.join(sdir, "pin-live.json"))
    # pins are not WAP entries
    assert V.list_staged(root) == []
    os.unlink(os.path.join(sdir, "pin-live.json"))


def test_concurrent_append_lock_wait_and_timeout(spark, tmp_path):
    """The commit tail waits for a briefly-held lock instead of failing,
    and raises a clear timeout when the holder never leaves."""
    import threading

    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "occ3")
    V.write_snapshot(_df(spark, 0, 4), root)
    lock_path = os.path.join(root, V.LOCK)

    # hold the lock from a live pid for ~0.4 s, then release
    fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.write(fd, str(os.getpid()).encode())
    released = threading.Timer(0.4, lambda: (os.close(fd), os.unlink(lock_path)))
    released.start()
    try:
        v = V.write_snapshot_concurrent(
            _df(spark, 10, 12), root, lock_timeout=10.0)
        assert v == 2
        assert read_snapshot(spark, root).count() == 6
    finally:
        released.cancel()

    # a holder that never leaves → timeout error, pin cleaned up
    fd2 = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.write(fd2, str(os.getpid()).encode())
    try:
        with pytest.raises(RuntimeError, match="timed out"):
            V.write_snapshot_concurrent(
                _df(spark, 20, 22), root, lock_timeout=0.3)
        sdir = os.path.join(root, V.STAGED_DIR)
        assert not [n for n in os.listdir(sdir) if n.startswith("pin-")]
    finally:
        os.close(fd2)
        os.unlink(lock_path)
    # table unchanged by the failed attempt
    assert current_version(root) == 2


def test_concurrent_append_refuses_transformed_parent(spark, tmp_path):
    """If a bucket/partition-transformed overwrite lands while the
    optimistic data write is in flight, the commit must refuse (its
    files lack the layout column) rather than corrupt point lookups."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "occ4")
    V.write_snapshot_bucketed(
        _df(spark, 0, 20), root, "id", n_buckets=4)
    with pytest.raises(ValueError, match="concurrent append"):
        V.write_snapshot_concurrent(_df(spark, 20, 25), root)
    assert current_version(root) == 1


def test_lock_free_data_writes(spark, tmp_path, monkeypatch):
    """The optimistic appender AND the WAP stager run their Spark data
    writes with NO commit lock held — the property that lets N writers'
    cluster jobs overlap."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "lockfree")
    V.write_snapshot(_df(spark, 0, 4), root)
    real = V._write_data_dir
    lock_seen = []

    def spy(df, r, stats, data_name=None):
        lock_seen.append(os.path.exists(os.path.join(r, V.LOCK)))
        return real(df, r, stats, data_name=data_name)

    monkeypatch.setattr(V, "_write_data_dir", spy)
    V.write_snapshot_concurrent(_df(spark, 4, 6), root)
    V.stage_snapshot(_df(spark, 6, 8), root, wap_id="lf1")
    assert lock_seen == [False, False]
    # and the pessimistic writer still writes under the lock
    V.write_snapshot(_df(spark, 8, 9), root, mode="append")
    assert lock_seen == [False, False, True]
    V.publish_staged(root, "lf1")
    assert read_snapshot(spark, root).count() == 9


def _dates_df(spark, lo, hi, id_off=0):
    return spark.range(lo, hi).select(
        (F.col("id") + id_off).alias("id"),
        F.date_add(F.lit("2020-01-01").cast("date"),
                   F.col("id").cast("int")).alias("d"),
    )


def test_partition_evolution_month_to_day(spark, tmp_path):
    """Iceberg partition evolution: a table written month(d) evolves to
    day(d) for new data; old files keep their layout and every read
    prunes each file with the spec that produced it."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "evo")
    V.write_snapshot_transformed(
        _dates_df(spark, 0, 180), root, ("month", "d"), n_files=6)
    with pytest.raises(ValueError, match="evolve=True"):
        V.write_snapshot_transformed(
            _dates_df(spark, 180, 360), root, ("day", "d"), mode="append")
    V.write_snapshot_transformed(
        _dates_df(spark, 180, 360), root, ("day", "d"), mode="append",
        evolve=True, n_files=6)

    m = V._read_manifest(root, V.current_version(root))
    assert m["meta"]["partition_transform"] == {
        "kind": "day", "col": "d", "w": None}
    assert [s["kind"] for s in m["meta"]["partition_specs"]] == [
        "month", "day"]
    # every data dir is mapped to a spec
    dirs = {f.split("/", 1)[0] for f in m["files"]}
    assert set(m["meta"]["partition_dir_specs"]) >= dirs

    # a bound inside the old-spec range prunes files in BOTH groups and
    # the result is exactly the WHERE scan (boundary: 2020-03-15 is
    # mid-month — the month transform must KEEP the whole March file)
    kept, skipped = V.plan_files_transformed(root, {"d": (">=", "2020-03-15")})
    assert skipped > 0 and kept
    got = sorted(
        r["id"] for r in V.read_snapshot_transformed(
            spark, root, {"d": (">=", "2020-03-15")}).collect()
    )
    assert got == list(range(74, 360))  # 2020-03-15 == day 74

    # same-spec append onto the evolved table keeps the bookkeeping
    V.write_snapshot_transformed(
        _dates_df(spark, 360, 400), root, ("day", "d"), mode="append")
    m2 = V._read_manifest(root, V.current_version(root))
    assert [s["kind"] for s in m2["meta"]["partition_specs"]] == [
        "month", "day"]
    dirs2 = {f.split("/", 1)[0] for f in m2["files"]}
    assert set(m2["meta"]["partition_dir_specs"]) >= dirs2
    got2 = V.read_snapshot_transformed(
        spark, root, {"d": (">=", "2020-12-30")}).count()
    assert got2 == 400 - 364

    # evolving BACK to an already-known spec reuses its id
    V.write_snapshot_transformed(
        _dates_df(spark, 400, 410), root, ("month", "d"), mode="append",
        evolve=True)
    m3 = V._read_manifest(root, V.current_version(root))
    assert len(m3["meta"]["partition_specs"]) == 2


def test_partition_evolution_cross_column(spark, tmp_path):
    """Evolution to a spec on a DIFFERENT column: files whose spec does
    not involve the predicate column are never transform-pruned (kept,
    residual-filtered) — exact results, pruning where the layout
    allows."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "evoc")
    V.write_snapshot_transformed(
        _dates_df(spark, 0, 180), root, ("month", "d"), n_files=6)
    V.write_snapshot_transformed(
        _dates_df(spark, 0, 1000, id_off=10000), root,
        ("truncate", 100, "id"), mode="append", evolve=True, n_files=10)

    # date predicate: prunes old-month files, keeps all new files
    kept_d, skipped_d = V.plan_files_transformed(
        root, {"d": (">=", "2020-05-01")})
    assert skipped_d > 0
    got = V.read_snapshot_transformed(
        spark, root, {"d": (">=", "2020-05-01")}).count()
    # old rows with d >= 2020-05-01: days 121..179 (59 rows); new rows
    # carry d = 2020-01-01 + (0..999) days, of which days 121..999 pass
    assert got == (180 - 121) + (1000 - 121)

    # id predicate: prunes new truncate files, keeps old files
    kept_i, skipped_i = V.plan_files_transformed(
        root, {"id": ("between", (10350, 10449))})
    assert skipped_i > 0
    got_i = sorted(
        r["id"] for r in V.read_snapshot_transformed(
            spark, root, {"id": ("between", (10350, 10449))}).collect()
    )
    assert got_i == list(range(10350, 10450))

    # cross-type evolution refuses (long lane vs string lane)
    sdf = spark.range(0, 10).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("s"))
    with pytest.raises(ValueError, match="cross layout-column types"):
        V.write_snapshot_transformed(
            sdf, root, ("truncate", 2, "s"), mode="append", evolve=True)


def test_partition_evolution_survives_row_ops(spark, tmp_path):
    """A CoW update on an evolved table must keep the evolution
    bookkeeping (else old-spec files would be pruned with the new spec
    and rows would vanish); the rewrite dir itself is simply never
    transform-pruned."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "evou")
    V.write_snapshot_transformed(
        _dates_df(spark, 0, 180), root, ("month", "d"), n_files=6)
    V.write_snapshot_transformed(
        _dates_df(spark, 180, 360), root, ("day", "d"), mode="append",
        evolve=True, n_files=6)
    V.update_where(
        spark, root, {"id": ("==", 10)}, {"id": F.lit(100010)})
    m = V._read_manifest(root, V.current_version(root))
    assert [s["kind"] for s in m["meta"]["partition_specs"]] == [
        "month", "day"]
    got = sorted(
        r["id"] for r in V.read_snapshot_transformed(
            spark, root, {"d": (">=", "2020-01-05")}).collect()
    )
    assert got == list(range(4, 10)) + list(range(11, 360)) + [100010]


def test_concurrent_append_refuses_evolved_parent(spark, tmp_path):
    """The optimistic appender's transformed-parent refusal covers
    EVOLVED tables too — its files would carry no layout column and no
    spec-map entry would mark them, silently breaking transform
    pruning."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "occevo")
    V.write_snapshot_transformed(
        _dates_df(spark, 0, 60), root, ("month", "d"), n_files=2)
    V.write_snapshot_transformed(
        _dates_df(spark, 60, 120), root, ("day", "d"), mode="append",
        evolve=True, n_files=2)
    with pytest.raises(ValueError, match="layout column"):
        V.write_snapshot_concurrent(_dates_df(spark, 120, 130), root)
    assert V.current_version(root) == 2


def test_partition_evolution_with_mor_delete(spark, tmp_path):
    """A merge-on-read position delete on an evolved table: the delete
    attachment rides the untouched data files (dir spec map intact), so
    the transform-pruned read stays row-exact minus the deleted rows."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "evomor")
    V.write_snapshot_transformed(
        _dates_df(spark, 0, 120), root, ("month", "d"), n_files=4)
    V.write_snapshot_transformed(
        _dates_df(spark, 120, 240), root, ("day", "d"), mode="append",
        evolve=True, n_files=4)
    V.delete_where_mor(spark, root, {"id": ("between", (50, 59))})
    m = V._read_manifest(root, V.current_version(root))
    assert [s["kind"] for s in m["meta"]["partition_specs"]] == [
        "month", "day"]
    got = sorted(
        r["id"] for r in V.read_snapshot_transformed(
            spark, root, {"d": (">=", "2020-02-10")}).collect()
    )
    # day 40 == 2020-02-10; ids 50-59 deleted
    assert got == list(range(40, 50)) + list(range(60, 240))
    kept, skipped = V.plan_files_transformed(root, {"d": (">=", "2020-06-01")})
    assert skipped > 0


def test_evolve_requires_transformed_parent(spark, tmp_path):
    """evolve=True must not bypass the transformed-append guard onto a
    plain (or bucketed) parent: parent files have no _pt column, so a
    transform spec over them would silently drop every parent row from
    predicated transformed reads (round-5 review finding)."""
    import decisions_knowledge_graph_data_spark.sources.versioned as V

    plain = str(tmp_path / "plain")
    V.write_snapshot(_df(spark, 0, 10), plain)
    with pytest.raises(ValueError, match="requires a transformed parent"):
        V.write_snapshot_transformed(
            _dates_df(spark, 0, 10), plain, ("month", "d"),
            mode="append", evolve=True)
    assert V.current_version(plain) == 1

    bucketed = str(tmp_path / "bkt")
    V.write_snapshot_bucketed(_df(spark, 0, 20), bucketed, "id", 4)
    with pytest.raises(ValueError, match="requires a transformed parent"):
        V.write_snapshot_transformed(
            _dates_df(spark, 0, 10), bucketed, ("month", "d"),
            mode="append", evolve=True)
    assert V.current_version(bucketed) == 1


def test_lock_steal_is_serialized(spark, tmp_path):
    """Stealing a dead writer's lock goes through the steal mutex: a
    concurrent stealer reports contention instead of unlinking (which
    could destroy a FRESH lock), and a dead stealer's mutex is cleared."""
    import subprocess

    import decisions_knowledge_graph_data_spark.sources.versioned as V

    root = str(tmp_path / "steal")
    V.write_snapshot(_df(spark, 0, 4), root)
    lock = os.path.join(root, V.LOCK)
    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(lock, "w") as f:
        f.write(str(proc.pid))  # dead holder

    # a live concurrent stealer holds the mutex → contention, lock kept
    with open(lock + ".steal", "w") as f:
        f.write(str(os.getpid()))
    with pytest.raises(RuntimeError, match="stealing"):
        V._acquire_lock(root)
    assert os.path.exists(lock)
    os.unlink(lock + ".steal")

    # a DEAD stealer's mutex is cleared; the caller retries and wins
    with open(lock + ".steal", "w") as f:
        f.write(str(proc.pid))
    with pytest.raises(RuntimeError, match="stealing"):
        V._acquire_lock(root)
    assert not os.path.exists(lock + ".steal")
    fd = V._acquire_lock(root)  # dead holder stolen under the mutex
    os.close(fd)
    os.unlink(lock)
    assert V.write_snapshot(_df(spark, 4, 6), root, mode="append") == 2
