"""Training-data assembly operators (operators/trainprep.py).

The load-bearing property for every operator here is DETERMINISM UNDER
RESHARDING: assignments are pure functions of (seed, key), so a
repartition — the thing that silently changes between runs at 100 TB —
must never move a row between splits/samples/bins or change a rank.
Each test recomputes the expected answer with an independent Python/
pandas model of the md5 hash.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.operators.trainprep import (
    HASH_DOMAIN,
    chunk_text,
    deterministic_shuffle,
    fraction_threshold,
    group_cap,
    pack_contiguous,
    portable_hash60,
    sample_deterministic,
    split_assign,
    split_thresholds,
    stratified_sample,
)


def h60(key, seed: int) -> int:
    """Independent Python model of the portable 60-bit hash."""
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [Row(k=i, lang=["en", "fr", "zh"][i % 3], tok=(i * 7) % 90 + 1) for i in range(600)]
    return spark.createDataFrame(rows)


def test_portable_hash_matches_python_model(spark):
    df = spark.range(50).select(
        "id", portable_hash60(F.col("id"), 9).alias("h")
    )
    for r in df.collect():
        assert r.h == h60(r.id, 9)


def test_split_assign_partition_invariant_and_complete(keyed):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.k: r.split for r in split_assign(keyed, "k", splits, seed=5).collect()}
    b = {
        r.k: r.split
        for r in split_assign(keyed.repartition(7), "k", splits, seed=5).collect()
    }
    assert a == b  # resharding never moves a key between splits
    assert set(a) == set(range(600)) and None not in a.values()
    # matches the independent model exactly
    thr = split_thresholds(splits)
    for k, s in a.items():
        expected = next(name for name, t in thr if h60(k, 5) < t)
        assert s == expected
    # fractions land near targets (hash uniformity sanity)
    n_train = sum(1 for s in a.values() if s == "train")
    assert 0.7 < n_train / 600 < 0.9


def test_split_fractions_validation():
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.7, "b": 0.4})
    with pytest.raises(ValueError):
        split_thresholds({"a": -0.1, "b": 0.5})
    # fractions summing to <1 leave the remainder unassigned (NULL)
    names = [t[0] for t in split_thresholds({"a": 0.25, "b": 0.25})]
    assert names == ["a", "b"]


def test_split_subsample_semantics(keyed):
    out = split_assign(keyed, "k", {"a": 0.2, "b": 0.2}, seed=1).collect()
    thr = fraction_threshold(0.4)
    for r in out:
        assert (r.split is None) == (h60(r.k, 1) >= thr)


def test_sample_deterministic_nested(keyed):
    """h < t is monotone in the fraction → samples are NESTED: the 20%
    sample is a strict subset of the 50% sample at the same seed — the
    property that makes scaling-law subsample ladders consistent."""
    s20 = {r.k for r in sample_deterministic(keyed, "k", 0.2, seed=3).collect()}
    s50 = {r.k for r in sample_deterministic(keyed, "k", 0.5, seed=3).collect()}
    assert s20 < s50
    assert s20 == {k for k in range(600) if h60(k, 3) < fraction_threshold(0.2)}


def test_stratified_sample_model_exact(keyed):
    fr = {"en": 0.3, "zh": 0.6}
    got = {r.k for r in
           stratified_sample(keyed, "k", "lang", fr, seed=7, default_fraction=1.0).collect()}
    want = set()
    for i in range(600):
        lang = ["en", "fr", "zh"][i % 3]
        thr = fraction_threshold(fr.get(lang, 1.0))
        if h60(i, 7) < thr:
            want.add(i)
    assert got == want
    # default_fraction=1.0 keeps every row of an unlisted stratum
    assert {k for k in got if k % 3 == 1} == {k for k in range(600) if k % 3 == 1}


def test_chunk_text_reconstruction(spark):
    texts = ["", "a", "x" * 7, "abcdefghij" * 13 + "tail", "short doc here"]
    df = spark.createDataFrame([Row(doc=i, text=t) for i, t in enumerate(texts)])
    size, overlap = 10, 3
    stride = size - overlap
    out = chunk_text(df, "text", size, overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc, []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_seq)
        if not t:
            assert chunks == []  # empty text → no chunks
            continue
        assert len(chunks) == math.ceil(len(t) / stride)
        for j, r in enumerate(chunks):
            assert r.chunk_seq == j and r.chunk_start == 1 + j * stride
            assert r.chunk_text == t[j * stride : j * stride + size]
            assert 1 <= len(r.chunk_text) <= size
        # stride-prefixes concatenate back to the original text
        assert "".join(c.chunk_text[:stride] for c in chunks) == t


def test_chunk_text_plan_is_narrow(spark):
    df = spark.createDataFrame([Row(doc=1, text="abc" * 40)])
    plan = chunk_text(df, "text", 16, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan → generate → project, no shuffle


def test_chunk_text_validation(spark):
    df = spark.createDataFrame([Row(text="abc")])
    with pytest.raises(ValueError):
        chunk_text(df, "text", 0)
    with pytest.raises(ValueError):
        chunk_text(df, "text", 5, 5)


def test_deterministic_shuffle_rank(keyed):
    out = {r.k: r.shuffle_rank for r in
           deterministic_shuffle(keyed, "k", seed=2, num_partitions=5).collect()}
    assert sorted(out.values()) == list(range(1, 601))  # a permutation
    want_order = sorted(range(600), key=lambda k: (h60(k, 2), k))
    assert [k for k, _ in sorted(out.items(), key=lambda kv: kv[1])] == want_order
    # a different seed is a different epoch order
    out2 = {r.k: r.shuffle_rank for r in
            deterministic_shuffle(keyed, "k", seed=3, num_partitions=5).collect()}
    assert out2 != out
    # resharding the input does not change the order
    out3 = {r.k: r.shuffle_rank for r in
            deterministic_shuffle(keyed.repartition(11), "k", seed=2).collect()}
    assert out3 == out


def test_pack_contiguous_model_exact(keyed):
    budget = 400
    got = {r.k: (r.tok, r.bin_id) for r in
           pack_contiguous(keyed, "k", "tok", budget, seed=4, num_partitions=6).collect()}
    order = sorted(range(600), key=lambda k: (h60(k, 4), k))
    toks = {k: (k * 7) % 90 + 1 for k in range(600)}
    cum = 0
    want = {}
    for k in order:
        want[k] = (toks[k], cum // budget)
        cum += toks[k]
    assert got == want
    # bins are contiguous in stream order and budget-bounded at the seam:
    # a new bin starts exactly when the running sum crosses a multiple of
    # the budget (verified by the model equality above); every key kept
    assert len(got) == 600
    # partition-count invariance
    got2 = {r.k: (r.tok, r.bin_id) for r in
            pack_contiguous(keyed.repartition(13), "k", "tok", budget, seed=4).collect()}
    assert got2 == got


def test_pack_contiguous_validation(keyed):
    with pytest.raises(ValueError):
        pack_contiguous(keyed, "k", "tok", 0)


def test_reserved_scratch_names_rejected(keyed):
    from decisions_knowledge_graph_data_spark.functions.ids import global_seq

    for bad in ("_pid", "_local", "_offset"):
        with pytest.raises(ValueError, match="reserves column names"):
            global_seq(keyed.withColumn(bad, F.lit(1)), "k")
    for bad in ("_h60", "_cum0"):
        with pytest.raises(ValueError, match="reserves column names"):
            deterministic_shuffle(keyed.withColumn(bad, F.lit(1)), "k", seed=1)
        with pytest.raises(ValueError, match="reserves column names"):
            pack_contiguous(keyed.withColumn(bad, F.lit(1)), "k", "tok", 10)


def _cap_model(keys_by_group: dict, k: int, seed: int) -> set:
    """Independent model: k smallest (h, key) per group."""
    want = set()
    for g, ks in keys_by_group.items():
        for key in sorted(ks, key=lambda x: (h60(x, seed), x))[:k]:
            want.add((g, key))
    return want


def test_group_cap_model_exact_and_salt_invariant(keyed):
    """Two-stage salted top-k == naive single window == the Python
    model, for several salt_buckets — the lossless-salting property
    (any global top-k row is top-k within its own salt bucket)."""
    groups: dict = {}
    for i in range(600):
        groups.setdefault(["en", "fr", "zh"][i % 3], []).append(i)
    want = _cap_model(groups, 17, 5)
    results = []
    for buckets in (1, 5, 32):  # 1 == the naive single-window plan
        got = {
            (r.lang, r.k)
            for r in group_cap(
                keyed, "lang", "k", 17, seed=5, salt_buckets=buckets
            ).collect()
        }
        results.append(got)
    assert results[0] == results[1] == results[2] == want
    # under-quota groups pass through whole
    small = group_cap(keyed, "lang", "k", 10_000, seed=5).count()
    assert small == 600
    # payload columns survive the semi-join untouched
    cols = group_cap(keyed, "lang", "k", 3, seed=5).columns
    assert cols == keyed.columns


def test_group_cap_null_group_and_key(spark):
    """NULL group is its own quota bucket (both engines' PARTITION BY
    semantics); NULL keys hash NULL, sort LAST, and survive only in
    under-quota groups — and the null-safe semi-join keeps them."""
    rows = [Row(g=g, k=k, payload=f"p{g}-{k}") for g in ("a", None) for k in
            ["x1", "x2", "x3", None]]
    df = spark.createDataFrame(rows)
    out = {(r.g, r.k) for r in group_cap(df, "g", "k", 4, seed=2).collect()}
    assert out == {(g, k) for g in ("a", None) for k in ("x1", "x2", "x3", None)}
    capped = {(r.g, r.k) for r in group_cap(df, "g", "k", 3, seed=2).collect()}
    # k=3 of 4: the NULL key (sorts last) is evicted from BOTH groups
    assert capped == {(g, k) for g in ("a", None) for k in ("x1", "x2", "x3")}


def test_group_cap_validation(keyed):
    with pytest.raises(ValueError):
        group_cap(keyed, "lang", "k", 0)
    with pytest.raises(ValueError):
        group_cap(keyed, "lang", "k", 5, salt_buckets=0)
    with pytest.raises(ValueError, match="reserves column names"):
        group_cap(keyed.withColumn("_gc_h", F.lit(1)), "lang", "k", 5)


def test_group_cap_payload_never_shuffles(keyed):
    """Scale contract: only (group, key, hash) flow through the window
    exchanges; the payload column appears in no Window or Sort operator
    (it rides the final semi-join only)."""
    out = group_cap(keyed.withColumnRenamed("tok", "payload_tok"),
                    "lang", "k", 17, seed=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line or "Sort " in line:
            assert "payload_tok" not in line, line
    assert "LeftSemi" in plan
