"""Hypothesis property tests for the pure-Python kernels (fast, no Spark)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from decisions_knowledge_graph_data_spark.operators.validate import salvage_json
from decisions_knowledge_graph_data_spark.sources.corpus import (
    CLUSTER_DISTANCE,
    assign_clusters,
    build_document,
    gen_registry,
)

REG = gen_registry()


@st.composite
def mention_lists(draw):
    n = draw(st.integers(0, 30))
    out = []
    pos = 0
    for i in range(n):
        pos += draw(st.integers(1, 1500))
        length = draw(st.integers(1, 40))
        kind = draw(st.sampled_from(["IDENT", "NAME_DATE", "RULE", "REF"]))
        out.append({"mention_kind": kind, "surface": "x",
                    "char_start": pos, "char_end": pos + length})
        pos += length
    return out


@given(mention_lists())
@settings(max_examples=200, deadline=None)
def test_cluster_invariants(ms):
    assign_clusters(ms)
    clustered = sorted(
        (m for m in ms if m["cluster_id"] >= 0), key=lambda m: m["char_start"]
    )
    # cluster ids are dense, non-decreasing in position order
    ids = [m["cluster_id"] for m in clustered]
    assert ids == sorted(ids)
    if ids:
        assert set(ids) == set(range(max(ids) + 1))
    # consecutive mentions in the same cluster obey the gap rule; a new
    # cluster only starts when the gap exceeds CLUSTER_DISTANCE
    for a, b in zip(clustered, clustered[1:]):
        gap = b["char_start"] - a["char_end"]
        if b["cluster_id"] == a["cluster_id"]:
            assert gap <= CLUSTER_DISTANCE
        else:
            assert gap > CLUSTER_DISTANCE
    # non-clustered kinds untouched
    for m in ms:
        if m["mention_kind"] not in ("IDENT", "NAME_DATE", "CASE_NUM", "COURT_DATE"):
            assert m["cluster_id"] == -1


@given(st.integers(0, 5000), st.integers(1, 3))
@settings(max_examples=30, deadline=None)
def test_build_document_deterministic_and_golden_offsets(i, scale):
    n_docs = 10_000 * scale
    row1, m1, t1, _, c1 = build_document(i, n_docs, REG)
    row2, m2, t2, _, c2 = build_document(i, n_docs, REG)
    assert row1["content_sha256"] == row2["content_sha256"]
    assert m1 == m2 and t1 == t2 and c1 == c2
    # every golden mention's offsets must slice exactly its surface
    for m in m1:
        assert row1["content"][m["char_start"]:m["char_end"]] == m["surface"]


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_salvage_json_never_raises(s):
    salvage_json(s)  # must never throw, whatever the input


@given(st.dictionaries(st.text(min_size=1, max_size=8),
                       st.integers() | st.text(max_size=10), max_size=5))
@settings(max_examples=100, deadline=None)
def test_salvage_json_roundtrip(d):
    import json
    assert salvage_json(json.dumps(d)) == d
    assert salvage_json("junk ```json\n" + json.dumps(d) + "\n``` tail") == d
