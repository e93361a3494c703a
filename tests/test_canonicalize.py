"""Connected components + registry canonicalization vs goldens."""

from decisions_knowledge_graph_data_spark.operators.canonicalize import (
    canonical_map,
    connected_components,
)


def _uf_oracle(edges):
    """Plain union-find oracle for CC correctness."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


import pytest


@pytest.mark.parametrize("strategy", ["local", "distributed"])
def test_cc_chain(spark, strategy):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "src string, dst string"), strategy=strategy
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_auto_single_probe_matches_both_paths(spark, monkeypatch):
    """The auto strategy's one-job decide-and-fetch (round 6): below the
    threshold the collected head IS the full edge set (local result);
    when the probe overflows, the distributed path must produce the same
    components."""
    import decisions_knowledge_graph_data_spark.operators.canonicalize as cz

    edges_df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    exp = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    got = {r["node"]: r["component"]
           for r in cz.connected_components(edges_df, strategy="auto").collect()}
    assert got == exp
    # shrink the threshold so the auto probe overflows -> distributed
    monkeypatch.setattr(cz, "LOCAL_CC_THRESHOLD", 2)
    got2 = {r["node"]: r["component"]
            for r in cz.connected_components(edges_df, strategy="auto").collect()}
    assert got2 == exp


def test_cc_random_graph_matches_union_find(spark):
    import hashlib

    def h(i):
        return int(hashlib.sha256(str(i).encode()).hexdigest(), 16)

    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    for i in range(150):
        a = nodes[h(i) % len(nodes)]
        b = nodes[h(i * 7 + 1) % len(nodes)]
        if a != b:
            edges.append((a, b))
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "src string, dst string"),
            strategy="distributed",
        ).collect()
    }
    exp = _uf_oracle(edges)
    assert got == exp


def test_registry_canonical_map_matches_goldens(corpus20):
    tables, _, reg = corpus20
    got = {r["entity_ref"]: r["canonical_id"]
           for r in canonical_map(tables["entity_registry"]).collect()}
    exp = dict(zip(reg.expected_components["entity_ref"],
                   reg.expected_components["canonical_id"]))
    # every planted dup chain must collapse to its chain head
    for ref, canon in exp.items():
        assert got.get(ref) == canon, (ref, got.get(ref), canon)
    # canonical-only entities map to themselves
    non_dup = set(got) - set(exp)
    assert all(got[e] == e for e in non_dup)
