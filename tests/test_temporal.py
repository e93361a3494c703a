"""As-of join and bucketed range join vs brute-force references."""

import pytest
from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.operators.temporal import (
    asof_join,
    range_join_buckets,
)

# (event_id, user, ts) probes; (event_id, user, ts, value) builds.
PROBES = [
    (101, "u1", 10.0), (102, "u1", 20.0), (103, "u1", 5.0),
    (104, "u2", 15.0),            # u2 has no build at all
    (105, "u3", 30.0),            # probe ts == build ts (inclusive)
    (106, "u3", 29.0),            # just before the tied builds
]
BUILDS = [
    (1, "u1", 8.0, 1.5), (2, "u1", 10.0, 2.5),   # build at probe ts: matches
    (3, "u1", 12.0, 3.5),
    (4, "u3", 30.0, 4.5), (5, "u3", 30.0, 5.5),  # tie on ts → max event_id
]


def _expected(tolerance=None):
    out = {}
    for pid, pu, pts in PROBES:
        best = None
        for bid, bu, bts, bv in BUILDS:
            if bu != pu or bts > pts:
                continue
            if tolerance is not None and pts - bts > tolerance:
                continue
            if best is None or (bts, bid) > (best[1], best[0]):
                best = (bid, bts, bv)
        out[pid] = best
    return out


def _frames(spark):
    p = spark.createDataFrame(PROBES, "event_id int, user_id string, ts double")
    b = spark.createDataFrame(
        BUILDS, "event_id int, user_id string, ts double, value double"
    )
    return p, b


def _run(spark, **kw):
    p, b = _frames(spark)
    got = asof_join(
        p, b, on="user_id", probe_ts="ts", build_ts="ts",
        payload_cols=["event_id", "value"], build_seq="event_id", **kw
    ).collect()
    return {
        r["event_id"]: (
            None if r["asof_ts"] is None
            else (r["asof_event_id"], r["asof_ts"], r["asof_value"])
        )
        for r in got
    }


def test_asof_join_backward_inclusive_with_ties(spark):
    assert _run(spark) == _expected()


def test_asof_join_tolerance(spark):
    """tolerance voids matches older than probe_ts - tol: probe 102
    (ts 20) keeps build 2 (ts 10) only when tol >= 10."""
    assert _run(spark, tolerance=10.0) == _expected(tolerance=10.0)
    tight = _run(spark, tolerance=1.0)
    assert tight == _expected(tolerance=1.0)
    assert tight[102] is None and tight[101] is not None


def test_asof_join_single_shuffle_no_theta_join(spark):
    """The whole point: one union-sort, not a per-key theta join."""
    p, b = _frames(spark)
    plan = asof_join(
        p, b, on="user_id", probe_ts="ts", build_ts="ts",
        payload_cols=["value"], build_seq="event_id",
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange") == 1, plan


INTERVALS = [  # (okey, start, end)
    (1, 0.0, 10.0), (2, 5.0, 5.0),      # degenerate single-point interval
    (3, 9.0, 30.0),                     # spans multiple 10-wide buckets
    (4, 100.0, 110.0),                  # matches nothing
]
POINTS = [  # (pkey, pt)
    (10, 0.0), (11, 5.0), (12, 10.0), (13, 9.5), (14, 30.0), (15, 31.0),
]


def test_range_join_buckets_exact_vs_bruteforce(spark):
    b = spark.createDataFrame(INTERVALS, "okey int, s double, e double")
    p = spark.createDataFrame(POINTS, "pkey int, pt double")
    got = {
        (r["pkey"], r["okey"])
        for r in range_join_buckets(p, "pt", b, "s", "e", 10.0).collect()
    }
    exp = {
        (pk, ok)
        for pk, pt in POINTS
        for ok, s, e in INTERVALS
        if s <= pt <= e
    }
    assert got == exp
    assert (10, 1) in exp and (11, 2) in exp and (14, 3) in exp
    assert all(ok != 4 for _, ok in exp)


def test_range_join_plan_is_equi_join(spark):
    b = spark.createDataFrame(INTERVALS, "okey int, s double, e double")
    p = spark.createDataFrame(POINTS, "pkey int, pt double")
    plan = range_join_buckets(
        p, "pt", b, "s", "e", 10.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_join_null_build_ts_is_not_a_match(spark):
    """SQL semantics: b.ts <= p.ts is NULL for a NULL build ts, so a
    timestampless build must never be carried forward as a phantom
    match; NULL-key builds likewise; NULL-ts probes come out unmatched."""
    p = spark.createDataFrame(
        [(1, "u1", 10.0), (2, "u1", None)],
        "event_id int, user_id string, ts double",
    )
    b = spark.createDataFrame(
        [(91, "u1", None, 9.9), (92, None, 5.0, 8.8)],
        "event_id int, user_id string, ts double, value double",
    )
    got = {r["event_id"]: (r["asof_ts"], r["asof_value"])
           for r in asof_join(
               p, b, on="user_id", probe_ts="ts", build_ts="ts",
               payload_cols=["value"], build_seq="event_id").collect()}
    assert got == {1: (None, None), 2: (None, None)}


def test_asof_join_awkward_column_names(spark):
    """Probe/payload columns with dots must survive the struct round-trip
    (getField, not string paths)."""
    p = spark.createDataFrame([(1, "u1", 10.0)], ["evt.id", "user_id", "ts"])
    b = spark.createDataFrame(
        [(7, "u1", 8.0, 1.5)], ["evt.id", "user_id", "ts", "the.value"]
    )
    got = asof_join(
        p, b, on="user_id", probe_ts="ts", build_ts="ts",
        payload_cols=["the.value"], build_seq="evt.id",
    ).collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert r["evt.id"] == 1 and r["asof_the.value"] == 1.5 and r["asof_ts"] == 8.0


from decisions_knowledge_graph_data_spark.operators.temporal import (
    overlap_join_buckets,
)

OVL_LEFT = [  # (akey, start, end) — spans chosen to share multiple buckets
    (1, 0.0, 35.0), (2, 12.0, 14.0), (3, 90.0, 95.0), (4, 5.0, 5.0),
]
OVL_RIGHT = [  # (bkey, start, end)
    (11, 30.0, 60.0), (12, 0.0, 100.0), (13, 36.0, 40.0), (14, 5.0, 5.0),
]


def test_asof_join_rejects_reserved_column_names(spark):
    """Round-3 ADVICE (low): user columns named like the internal
    scratch columns would be silently overwritten (probes._b eaten by
    the null-cast build struct) — they must raise instead."""
    from decisions_knowledge_graph_data_spark.operators.temporal import asof_join
    probes = spark.createDataFrame([(1, 1.0, "x")], "k long, ts double, _b string")
    builds = spark.createDataFrame([(1, 0.5, 7, "p")],
                                   "k long, ts double, seq long, pay string")
    with pytest.raises(ValueError, match="reserves column names"):
        asof_join(probes, builds, "k", "ts", "ts", ["pay"], "seq")
    ok_probes = probes.withColumnRenamed("_b", "b_ok")
    bad_builds = builds.withColumnRenamed("pay", "_bts")
    with pytest.raises(ValueError, match="reserves payload names"):
        asof_join(ok_probes, bad_builds, "k", "ts", "ts", ["_bts"], "seq")
    # clean names still work
    got = asof_join(ok_probes, builds, "k", "ts", "ts", ["pay"], "seq").collect()
    assert len(got) == 1 and got[0]["asof_pay"] == "p"


def _hot_key_frames(spark, n_hot=1000, n_tail=1000):
    """Planted skew: key 'hub' carries half of all probe AND build rows,
    spread over ts 0..n; 20 tail keys share the rest. Deterministic."""
    probes, builds = [], []
    for i in range(n_hot):
        probes.append((10_000 + i, "hub", float(i)))
        builds.append((i, "hub", float(i) - 0.5, float(i)))
    for i in range(n_tail):
        k = f"t{i % 20}"
        probes.append((20_000 + i, k, float(i)))
        if i % 3 != 0:  # some tail keys probe ahead of any build
            builds.append((5_000 + i, k, float(i) - 2.0, float(100 + i)))
    p = spark.createDataFrame(probes, "event_id long, user string, ts double")
    b = spark.createDataFrame(builds, "event_id long, user string, ts double, value double")
    return p, b


def test_asof_time_bucket_equals_default_on_planted_hot_key(spark):
    """Round-3 VERDICT item 6: the time_bucket skew path must be
    semantics-free — on a corpus where one key holds 50% of both sides,
    its output is row-identical to the default single-partition-per-key
    plan (including ties, unmatched probes, and tolerance voiding)."""
    p, b = _hot_key_frames(spark)
    args = (p, b, "user", "ts", "ts", ["value"], "event_id")
    base = sorted(map(tuple, asof_join(*args).collect()))
    for width in (50.0, 173.0):   # aligned and deliberately misaligned
        bucketed = sorted(map(tuple, asof_join(*args, time_bucket=width).collect()))
        assert bucketed == base, f"width={width}"
    # tolerance interacts with carry-in (match may come from a far-away
    # earlier bucket and must still be voided)
    base_tol = sorted(map(tuple, asof_join(*args, tolerance=1.0).collect()))
    buck_tol = sorted(map(tuple,
                          asof_join(*args, tolerance=1.0, time_bucket=50.0).collect()))
    assert buck_tol == base_tol


def test_asof_time_bucket_bounds_sort_group_size(spark):
    """The point of the bucketed plan: the largest sort group shrinks
    from |hot key| to |hot key| / n_buckets — the property that keeps a
    mega-key off a single task at 100 TB."""
    p, b = _hot_key_frames(spark)
    union = p.select("user", "ts").unionByName(b.select("user", "ts"))
    per_key = union.groupBy("user").count().agg(F.max("count")).first()[0]
    per_group = (
        union.withColumn("_tb", F.floor(F.col("ts") / 50.0))
        .groupBy("user", "_tb").count().agg(F.max("count")).first()[0]
    )
    assert per_key == 2000          # the hub: half of all rows
    assert per_group <= 110         # ~2 sides x 50 rows per bucket


def test_range_join_planted_hot_interval_stays_exact(spark):
    """Skew hardening for the bucketed range join: one build interval
    spanning the whole domain (every probe's bucket joins it) plus a hot
    probe point repeated 500x. The candidate join is a plain equi-join —
    AQE's skew-join splitting applies to it at scale — and results must
    stay exact and duplicate-free vs brute force."""
    probes = [(i, float(i % 40)) for i in range(500)]       # hot values
    probes += [(1000 + i, float(i)) for i in range(100)]
    builds = [(9_000, 0.0, 1_000.0)]                        # whole-domain hub
    builds += [(9_100 + i, float(i), float(i + 3)) for i in range(100)]
    p = spark.createDataFrame(probes, "pid long, x double")
    b = spark.createDataFrame(builds, "bid long, lo double, hi double")
    got = range_join_buckets(p, "x", b, "lo", "hi", bucket_width=10.0)
    brute = p.crossJoin(b).filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
    assert got.count() == brute.count()
    assert sorted(map(tuple, got.select("pid", "bid").collect())) == sorted(
        map(tuple, brute.select("pid", "bid").collect()))


def test_overlap_join_exact_and_duplicate_free(spark):
    """Brute-force equivalence AND no duplicate pairs: a pair sharing
    many buckets (e.g. 1×12 share buckets 0-3) must surface exactly
    once (the first-shared-bucket emission rule)."""
    a = spark.createDataFrame(OVL_LEFT, "akey int, a_s double, a_e double")
    b = spark.createDataFrame(OVL_RIGHT, "bkey int, b_s double, b_e double")
    rows = overlap_join_buckets(a, "a_s", "a_e", b, "b_s", "b_e", 10.0).collect()
    got = [(r["akey"], r["bkey"]) for r in rows]
    exp = {
        (ak, bk)
        for ak, as_, ae in OVL_LEFT
        for bk, bs, be in OVL_RIGHT
        if as_ <= be and bs <= ae
    }
    assert len(got) == len(set(got)), "duplicate pair emitted"
    assert set(got) == exp
    # sanity on the fixture: multi-bucket-sharing and point-interval cases
    assert (1, 12) in exp and (4, 14) in exp and (3, 13) not in exp


def test_overlap_join_plan_is_equi_join(spark):
    a = spark.createDataFrame(OVL_LEFT, "akey int, a_s double, a_e double")
    b = spark.createDataFrame(OVL_RIGHT, "bkey int, b_s double, b_e double")
    plan = overlap_join_buckets(
        a, "a_s", "a_e", b, "b_s", "b_e", 10.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
