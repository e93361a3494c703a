"""Cross-restart stateful dedup: state survives via the streaming checkpoint."""

import pytest
from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.streaming.stateful import (
    run_dedup_stream,
)

SCHEMA = "user_id long, event_id long, event_type string, value double"


def test_stateful_dedup_across_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [(1, 10, "click", 1.0), (1, 11, "view", 2.0), (2, 20, "click", 3.0),
         (1, 10, "click", 1.0)],  # in-batch duplicate
        SCHEMA,
    )
    batch1.write.mode("append").parquet(in_dir)
    q = run_dedup_stream(spark, in_dir, out_dir, ckpt, SCHEMA)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 3  # in-batch duplicate dropped

    # second delivery: re-sends 10 and 20, adds 12 and 21
    batch2 = spark.createDataFrame(
        [(1, 10, "click", 1.0), (2, 20, "click", 3.0),
         (1, 12, "purchase", 4.0), (2, 21, "view", 5.0)],
        SCHEMA,
    )
    batch2.write.mode("append").parquet(in_dir)
    q2 = run_dedup_stream(spark, in_dir, out_dir, ckpt, SCHEMA)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out_dir)
    ids = sorted(r["event_id"] for r in got2.collect())
    assert ids == [10, 11, 12, 20, 21]  # re-deliveries suppressed by state


def test_stateful_dedup_state_is_bounded(spark, tmp_path):
    """Per-group seen-set cap: with max_seen=3, only the max-id suffix is
    retained — a re-delivery of a retained id is suppressed, one older
    than everything retained re-emits (the documented TTL/cap tradeoff)."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [(1, i, "click", float(i)) for i in range(10, 16)], SCHEMA
    )
    batch1.write.mode("append").parquet(in_dir)
    q = run_dedup_stream(spark, in_dir, out_dir, ckpt, SCHEMA, max_seen=3)
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 6

    # state kept only {13,14,15}: 14 is suppressed, 10 re-emits
    batch2 = spark.createDataFrame(
        [(1, 14, "click", 14.0), (1, 10, "click", 10.0)], SCHEMA
    )
    batch2.write.mode("append").parquet(in_dir)
    q2 = run_dedup_stream(spark, in_dir, out_dir, ckpt, SCHEMA, max_seen=3)
    q2.awaitTermination(120)
    ids = sorted(r["event_id"] for r in spark.read.parquet(out_dir).collect())
    assert ids == [10, 10, 11, 12, 13, 14, 15]


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Engine-native session windows (F.session_window) over a
    micro-batched stream: sessions MERGE across batch boundaries (the
    stateful behavior the lag-window `sessionize` twin cannot give a
    stream), an event at EXACTLY the gap extends the session (the
    strict-`>` new-session convention the oracle relies on), and the
    drained streaming result equals the batch run on the same data."""
    import datetime as dt

    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        session_events,
    )

    in_dir = str(tmp_path / "in")
    schema = "user_id long, event_id long, value double, ts timestamp"
    t0 = dt.datetime(2024, 1, 1)

    def write_file(rows):
        spark.createDataFrame(
            [(u, e, v, t0 + dt.timedelta(seconds=s)) for u, e, v, s in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(in_dir)

    write_file([(1, 1, 1.0, 0), (1, 2, 1.0, 600), (2, 10, 5.0, 0)])
    # user 1 extends the SAME session across the batch boundary
    # (gap 1200s), then again at EXACTLY the 1800s gap
    write_file([(1, 3, 1.0, 1800), (1, 4, 1.0, 3600)])
    # gap 1801s > threshold: new session; user 2 far later: new session
    write_file([(1, 5, 1.0, 5401), (2, 11, 5.0, 7200)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        session_events(stream).writeStream.outputMode("complete")
        .format("memory").queryName("sess_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    got = sorted(tuple(r) for r in spark.table("sess_stream").collect())
    exp = sorted(
        tuple(r) for r in session_events(spark.read.parquet(in_dir)).collect()
    )
    assert got == exp
    by_user = {}
    for u, start, end, n, _ in got:
        by_user.setdefault(u, []).append((start, end, n))
    # user 1: one 4-event session spanning two files + exact-gap extend,
    # then a 1-event session opened by the 1801s gap
    assert [n for _, _, n in by_user[1]] == [4, 1]
    assert by_user[1][0][1] == t0 + dt.timedelta(seconds=3600 + 1800)
    assert [n for _, _, n in by_user[2]] == [1, 1]


def test_stream_interval_join_drain_equals_static(spark, tmp_path):
    """A fully-drained watermarked stream-stream interval join emits
    exactly the static interval join, exactly once — even with both
    sides split across micro-batches so matches straddle batch
    boundaries (the later row's batch emits the pair)."""
    import datetime as dt

    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        stream_interval_join,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left_rows = [(i, i % 3, ts(i * 10)) for i in range(12)]
    right_rows = [(100 + i, i % 3, ts(i * 10 + 15)) for i in range(12)]
    schema = "id long, k long, ts timestamp"
    left = spark.createDataFrame(left_rows, schema)
    right = spark.createDataFrame(right_rows, schema)

    # static twin: same function on batch frames (withWatermark no-op)
    static = {
        (r.id, r.r_id)
        for r in stream_interval_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            upper="25 seconds", watermark="1 hour",
        ).collect()
    }
    assert static  # non-trivial case

    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    left.repartitionByRange(3, "id").write.parquet(l_dir)
    right.repartitionByRange(3, "id").write.parquet(r_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def src(d):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )

    joined = stream_interval_join(
        src(l_dir), src(r_dir), on="k", left_ts="ts", right_ts="ts",
        upper="25 seconds", watermark="1 hour",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the stateful operator really ran as a symmetric hash join
    assert any(
        op.get("operatorName") == "symmetricHashJoin"
        for op in (q.lastProgress or {}).get("stateOperators", [])
    )
    got_rows = spark.read.parquet(out_dir).collect()
    got = {(r.id, r.r_id) for r in got_rows}
    assert len(got_rows) == len(got)  # exactly-once: no duplicate pairs
    assert got == static


def test_stream_interval_join_bounds_and_validation(spark):
    """Lower bound excludes too-close matches; inclusive boundaries on
    both ends; prefixed-name collisions are refused."""
    import datetime as dt

    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        stream_interval_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "id long, k long, ts timestamp"
    left = spark.createDataFrame([(1, 1, t0)], schema)
    right = spark.createDataFrame(
        [(10, 1, t0 + dt.timedelta(seconds=s)) for s in (0, 5, 10, 20)],
        schema,
    )
    got = sorted(
        r.r_ts.second
        for r in stream_interval_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            lower="5 seconds", upper="10 seconds", watermark="1 hour",
        ).collect()
    )
    assert got == [5, 10]  # 0 below lower, 20 above upper; bounds inclusive

    import pytest

    with pytest.raises(ValueError, match="collide"):
        stream_interval_join(
            left.withColumn("r_id", F.lit(1)), right,
            on="k", left_ts="ts", right_ts="ts",
            upper="10 seconds", watermark="1 hour",
        )


def test_stream_interval_join_outer_sentinel_drain(spark, tmp_path):
    """Left-outer drain: unmatched rows emit NULL-padded only at
    EVICTION (watermark proof of no future partner). A bounded drain's
    watermark stalls at max_event - delay, so the books are closed with
    two watermark-sentinel generations; after the sentinel-flushed
    drain the output (sans sentinels) equals the static left join."""
    import datetime as dt

    from decisions_knowledge_graph_data_spark.streaming.incremental import (
        append_watermark_sentinels, stream_interval_join,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    schema = "id long, k long, ts timestamp"
    left = spark.createDataFrame([(i, i % 3, ts(i * 10)) for i in range(12)], schema)
    # only k=0 left rows can match → 8 unmatched rows must flush
    right = spark.createDataFrame(
        [(100 + i, 0, ts(i * 30 + 15)) for i in range(4)], schema
    )
    kwargs = dict(on="k", left_ts="ts", right_ts="ts",
                  upper="25 seconds", watermark="10 minutes")
    static = {
        (r.id, r.r_id)
        for r in stream_interval_join(
            left, right, how="left_outer", **kwargs
        ).collect()
    }
    assert any(rid is None for _, rid in static)  # non-trivial outer case

    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    left.repartitionByRange(3, "ts").write.parquet(l_dir)
    right.repartitionByRange(3, "ts").write.parquet(r_dir)
    append_watermark_sentinels(
        spark, [l_dir, r_dir], schema, lambda t: [(-1, -1, t)],
        [t0 + dt.timedelta(days=1), t0 + dt.timedelta(days=2)],
    )

    def src(d):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )

    joined = stream_interval_join(
        src(l_dir), src(r_dir), how="left_outer", **kwargs
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out_dir).filter(F.col("id") >= 0).collect()
    got = {(r.id, r.r_id) for r in rows}
    assert len(rows) == len(got)  # exactly-once
    assert got == static

    with pytest.raises(ValueError, match="unsupported join type"):
        stream_interval_join(left, right, how="full_outer", **kwargs)


class _FakeListState:
    """Stand-in for the TWS ListState handle (protobuf runtime absent
    in this container): same get/exists/appendList surface."""

    def __init__(self):
        self._rows: list[tuple] = []

    def exists(self):
        return bool(self._rows)

    def get(self):
        return iter(self._rows)

    def appendList(self, rows):
        self._rows.extend(rows)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getListState(self, name, schema, ttlDurationMs=None):
        self.ttl_ms = ttlDurationMs
        return self.states.setdefault(name, _FakeListState())


def test_tws_dedup_processor_logic():
    """transformWithStateInPandas twin: the processor's dedup logic
    (in-batch first-occurrence, cross-batch via ListState) matches the
    applyInPandasWithState contract. The end-to-end streaming run is
    gated on the protobuf TWS runtime, absent in this container —
    logic is exercised directly against a fake state handle."""
    import pandas as pd

    from decisions_knowledge_graph_data_spark.streaming.stateful import (
        _DedupProcessor, dedup_events_stream_tws, tws_runtime_available,
    )

    assert _DedupProcessor is not None  # pyspark 4 class import works
    proc = _DedupProcessor(ttl_ms=1234)
    handle = _FakeHandle()
    proc.init(handle)
    assert handle.ttl_ms == 1234  # native TTL wired to the state var

    def batch(rows):
        return pd.DataFrame(
            rows, columns=["user_id", "event_id", "event_type", "value"]
        )

    # batch 1: in-batch duplicate of event 10 emitted once
    out1 = pd.concat(list(proc.handleInputRows(
        (1,), iter([batch([(1, 10, "click", 1.0), (1, 11, "view", 2.0),
                           (1, 10, "click", 1.0)])]), None)))
    assert sorted(out1["event_id"]) == [10, 11]

    # batch 2 (same processor state): re-deliveries dropped, new id kept
    out2 = pd.concat(list(proc.handleInputRows(
        (1,), iter([batch([(1, 10, "click", 1.0), (1, 12, "buy", 4.0)])]),
        None)))
    assert sorted(out2["event_id"]) == [12]
    assert sorted(t[0] for t in handle.states["seen"].get()) == [10, 11, 12]

    # all-duplicate batch: no output frames at all
    assert list(proc.handleInputRows(
        (1,), iter([batch([(1, 12, "buy", 4.0)])]), None)) == []

    if not tws_runtime_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            dedup_events_stream_tws(None)


@pytest.mark.skipif(
    not __import__(
        "decisions_knowledge_graph_data_spark.streaming.stateful",
        fromlist=["tws_runtime_available"],
    ).tws_runtime_available(),
    reason="TWS runtime needs google.protobuf (absent in container)",
)
def test_tws_dedup_across_restarts(spark, tmp_path):
    """transformWithStateInPandas twin end-to-end: same cross-restart
    exactly-once contract as the applyInPandasWithState version."""
    from decisions_knowledge_graph_data_spark.streaming.stateful import (
        run_dedup_stream_tws,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [(1, 10, "click", 1.0), (1, 11, "view", 2.0), (2, 20, "click", 3.0),
         (1, 10, "click", 1.0)],  # in-batch duplicate
        SCHEMA,
    )
    batch1.write.mode("append").parquet(in_dir)
    q = run_dedup_stream_tws(spark, in_dir, out_dir, ckpt, SCHEMA)
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 3

    batch2 = spark.createDataFrame(
        [(1, 10, "click", 1.0), (2, 20, "click", 3.0),
         (1, 12, "purchase", 4.0), (2, 21, "view", 5.0)],
        SCHEMA,
    )
    batch2.write.mode("append").parquet(in_dir)
    q2 = run_dedup_stream_tws(spark, in_dir, out_dir, ckpt, SCHEMA)
    q2.awaitTermination(120)
    ids = sorted(r["event_id"] for r in spark.read.parquet(out_dir).collect())
    assert ids == [10, 11, 12, 20, 21]


def test_drop_duplicates_within_watermark_cross_batch(spark, tmp_path):
    """Built-in dropDuplicatesWithinWatermark (the JVM-native
    complement to the custom stateful processors): exact-duplicate
    rows replayed in a LATER micro-batch are dropped via cross-batch
    state-store state; with the delay beyond the data's event-time
    span the availableNow drain equals global first-occurrence dedup."""
    import datetime as dt

    sch = ("event_id long, user_id long, event_type string, "
           "value double, ts timestamp")
    t0 = dt.datetime(2024, 1, 1)

    def ev(i):
        return (i, i % 3, "click", float(i), t0 + dt.timedelta(minutes=i))

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([ev(i) for i in range(6)], sch).coalesce(
        1).write.mode("append").parquet(in_dir)
    # later file: exact replays of 0 and 3 plus one genuinely new id
    spark.createDataFrame([ev(0), ev(3), ev(6)], sch).coalesce(
        1).write.mode("append").parquet(in_dir)

    src = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        src.withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert sorted(r["event_id"] for r in out.collect()) == list(range(7))
    assert out.count() == 7  # each id exactly once despite the replay
