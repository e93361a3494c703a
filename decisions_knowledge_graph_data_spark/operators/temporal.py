"""Temporal joins Spark lacks natively: as-of join and range join.

The reference's temporal-cutoff candidate selection (latest registry
entry with ``valid_from < doc_date`` per mention, mapping/steps.ts:
452-454) is an as-of join specialized to linking; this module provides
the generic operators, Spark-first:

``asof_join``
    pandas ``merge_asof`` semantics (backward, inclusive) as ONE
    shuffle: union the tagged probe and build rows, sort within each
    key by (ts, side, seq), and carry the last build payload forward
    with ``last(ignorenulls)`` over a running window. No range
    explosion, no per-key driver loop; skewed keys cost what a
    sort-merge join on the same key would. A naive theta-join
    (``b.ts <= p.ts`` + top-1) shuffles |P|×|B| candidate pairs per
    key; this shuffles |P|+|B| rows total.

``range_join_buckets``
    point-in-interval join as a bucketed equi-join (the classic range-
    join optimization): intervals explode to the buckets they cover,
    points map to their single bucket, the equi-join on bucket bounds
    the candidate set, and the exact predicate filters afterwards.
    Output is exact (each point lives in exactly one bucket, so no
    dedup is needed). ``bucket_width`` trades fanout (interval copies
    ≈ interval_len/width + 1) against candidate precision — set it
    near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    probes: DataFrame,
    builds: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    payload_cols: list[str],
    build_seq: str,
    tolerance: float | None = None,
    time_bucket: float | None = None,
) -> DataFrame:
    """For each probe row, attach the latest build row of the same ``on``
    key with ``build_ts <= probe_ts`` (ties on build_ts broken by the
    largest ``build_seq`` — determinism is a contract, not an accident).
    Returns all probe columns plus ``asof_<payload>`` columns and
    ``asof_ts`` (NULL when no eligible build exists). ``tolerance``
    (seconds) optionally voids matches older than ``probe_ts - tol``.

    ``time_bucket`` is the skew escape hatch for mega-keys (the north
    rule's hub entities): the default plan sorts each key's full history
    in ONE window partition, which AQE cannot split (skew-join splitting
    applies to joins, not windows) — a key carrying 50% of rows serializes
    on one task. With ``time_bucket=w`` the sort partitions on
    ``(key, floor(ts/w))`` so a hot key spreads across its time span,
    and cross-bucket matches are restored EXACTLY by a carry-in pass at
    bucket granularity: per (key, bucket) the last build is a map-side-
    combinable aggregation, the carry across buckets is a window whose
    per-key row count is the bucket count (tiny), and probes that found
    no in-bucket build coalesce to the carry-in. An in-bucket match
    always outranks any earlier bucket's build, so results are identical
    to the unbucketed plan (equality is test-locked, planted hot key)."""
    def _qc(name: str) -> Column:
        # top-level column by exact name — backticks keep dots/spaces in
        # caller-supplied names from being parsed as nested-field paths
        return F.col(f"`{name}`")

    # internal scratch names must not collide with user columns — a
    # probes._b, say, would be silently overwritten by the null-cast
    # build struct and produce wrong output (round-3 ADVICE, low)
    reserved = {"_k", "_ts", "_side", "_b", "_p", "_m"}
    if time_bucket is not None:
        reserved |= {"_tb", "_bb", "_ci"}  # bucket-path scratch names only
    clash = reserved & (set(probes.columns) | set(builds.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; rename "
            f"input columns {sorted(clash)} before joining"
        )
    payload_clash = {"_bts", "_bseq"} & set(payload_cols)
    if payload_clash:
        raise ValueError(
            f"asof_join reserves payload names ['_bseq', '_bts']; rename "
            f"{sorted(payload_clash)} before joining"
        )

    b_struct = F.struct(
        _qc(build_ts).cast("double").alias("_bts"),
        _qc(build_seq).alias("_bseq"),
        *[_qc(c).alias(c) for c in payload_cols],
    )
    # SQL join semantics: a NULL key or NULL ts on the build side can
    # never satisfy `b.key = p.key AND b.ts <= p.ts` — drop those rows
    # up front (otherwise a NULL-ts build would sort NULLS FIRST and be
    # carried forward as a phantom match). NULL-key/ts probes need no
    # filter: they sort before every build in their partition (or group
    # with no surviving builds) and come out unmatched.
    b_rows = builds.filter(
        _qc(on).isNotNull() & _qc(build_ts).isNotNull()
    ).select(
        _qc(on).alias("_k"),
        _qc(build_ts).cast("double").alias("_ts"),
        F.lit(0).alias("_side"),
        b_struct.alias("_b"),
        F.lit(None).cast(StructType(probes.schema.fields)).alias("_p"),
    )
    p_rows = probes.select(
        _qc(on).alias("_k"),
        _qc(probe_ts).cast("double").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(b_rows.schema["_b"].dataType).alias("_b"),
        F.struct(*[_qc(c).alias(c) for c in probes.columns]).alias("_p"),
    )
    union = b_rows.unionByName(p_rows)
    part_cols = ["_k"]
    if time_bucket is not None:
        union = union.withColumn(
            "_tb", F.floor(F.col("_ts") / F.lit(float(time_bucket))).cast("long")
        )
        part_cols = ["_k", "_tb"]
    # builds (side 0) sort before probes (side 1) at equal ts → inclusive
    # <=; among same-ts builds ascending _bseq puts the largest last, and
    # last(ignorenulls) carries exactly that one forward.
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(
            F.col("_ts"), F.col("_side"),
            F.col("_b").getField("_bseq").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        union.withColumn("_m", F.last("_b", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if time_bucket is not None:
        # restore cross-bucket matches: last build per (key, bucket) is a
        # partial-aggregable groupBy (no skew); the carry across buckets
        # runs at bucket granularity (rows per key == bucket count); a
        # NULL-ts probe has a NULL bucket, joins nothing, stays unmatched
        # — same as the unbucketed plan.
        # ONE aggregation over the union yields both the occupied-bucket
        # set (groupBy keys — probe-only buckets included, which the old
        # separate `distinct` pass existed for) and the last build per
        # bucket (max_by whose ordering key is NULL for probe rows, so
        # they are skipped like max skips nulls) — round-4 ADVICE: the
        # previous bb-aggregation + buckets-distinct + left-join shape
        # referenced the union three times (two extra full source
        # re-scans on exactly the mega-key corpora this path exists
        # for) where one pass suffices. The union is now scanned twice
        # total (window input + this agg); the scan count is locked by
        # test_plan_quality.py.
        buckets = union.groupBy("_k", "_tb").agg(
            F.max_by(
                "_b",
                F.when(
                    F.col("_side") == 0,
                    F.struct(
                        F.col("_b").getField("_bts"),
                        F.col("_b").getField("_bseq"),
                    ),
                ),
            ).alias("_bb")
        )
        wb = (
            Window.partitionBy("_k")
            .orderBy("_tb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = buckets.select(
            "_k", "_tb",
            F.last("_bb", ignorenulls=True).over(wb).alias("_ci"),
        )
        matched = (
            matched.join(carry, ["_k", "_tb"], "left")
            .withColumn("_m", F.coalesce("_m", "_ci"))
        )
    if tolerance is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_ts") - F.col("_m").getField("_bts")
                <= F.lit(float(tolerance)),
                F.col("_m"),
            ),
        )
    p_col, m_col = F.col("_p"), F.col("_m")
    out = [p_col.getField(c).alias(c) for c in probes.columns]
    out.append(m_col.getField("_bts").alias("asof_ts"))
    out.extend(m_col.getField(c).alias(f"asof_{c}") for c in payload_cols)
    return matched.select(*out)


def overlap_join_buckets(
    left: DataFrame,
    l_start: str,
    l_end: str,
    right: DataFrame,
    r_start: str,
    r_end: str,
    bucket_width: float,
) -> DataFrame:
    """All (left, right) interval pairs that OVERLAP
    (``l_start <= r_end AND r_start <= l_end``), as a bucketed
    equi-join. Both sides explode to the buckets they cover; a pair
    sharing several buckets would surface once per shared bucket, so
    instead of a dedup shuffle each pair is emitted ONLY from the
    bucket that contains the overlap's start (``max(l_start,
    r_start)``) — exact and duplicate-free with zero extra exchanges.
    Column-name collisions are the caller's to resolve."""
    w = float(bucket_width)

    def _explode(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / w).cast("long"),
                    F.floor(F.col(e) / w).cast("long"),
                )
            ),
        )

    return (
        _explode(left, l_start, l_end)
        .join(_explode(right, r_start, r_end), "_bkt")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            # emit from the overlap-start bucket only (dedup-free)
            & (
                F.floor(F.greatest(F.col(l_start), F.col(r_start)) / w).cast("long")
                == F.col("_bkt")
            )
        )
        .drop("_bkt")
    )


def range_join_buckets(
    probes: DataFrame,
    point_col: str,
    builds: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """All (probe, build) pairs with ``start <= point <= end`` — as a
    bucketed equi-join instead of a cartesian/theta join. Numeric (or
    pre-cast-to-double) columns; exact and duplicate-free by
    construction. Column-name collisions between the two sides must be
    resolved by the caller (standard join hygiene)."""
    w = float(bucket_width)
    b = builds.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    p = probes.withColumn("_bkt", F.floor(F.col(point_col) / w).cast("long"))
    return (
        p.join(b, "_bkt")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bkt")
    )
