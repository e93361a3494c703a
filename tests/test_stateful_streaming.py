"""Cross-restart stateful dedup: state survives via the streaming checkpoint."""

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
