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


@st.composite
def shingle_corpora(draw):
    """Random doc → shingle-set maps over a small shingle universe (small
    universe forces overlap, so high-jaccard pairs actually occur)."""
    n_docs = draw(st.integers(2, 12))
    universe = [f"s{i}" for i in range(draw(st.integers(3, 15)))]
    docs = {}
    for d in range(n_docs):
        size = draw(st.integers(1, len(universe)))
        docs[d] = frozenset(draw(st.permutations(universe))[:size])
    return docs


@given(shingle_corpora(), st.sampled_from([0.3, 0.5, 0.7, 0.9]))
@settings(max_examples=200, deadline=None)
def test_prefix_filter_principle(docs, t):
    """The lossless-prefix-filter math used by ngram_jaccard_pairs
    (prefix length = |A| - ceil(t*|A|) + 1 under a rarest-first global
    order): EVERY pair with jaccard >= t must share a prefix shingle.
    Mirrors the exact formulas in operators/dedup.py."""
    import math

    df = {}
    for s in {x for sh in docs.values() for x in sh}:
        df[s] = sum(1 for sh in docs.values() if s in sh)
    order = lambda s: (df[s], s)  # noqa: E731

    def prefix(sh):
        ranked = sorted(sh, key=order)
        plen = len(sh) - math.ceil(t * len(sh)) + 1
        return set(ranked[:plen])

    ids = sorted(docs)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            a, b = docs[i], docs[j]
            jac = len(a & b) / len(a | b)
            if jac >= t:
                assert prefix(a) & prefix(b), (
                    f"pair ({i},{j}) j={jac:.3f} missed by prefixes")


@given(st.integers(0, 2 ** 64 - 1), st.integers(1, 8),
       st.data())
@settings(max_examples=300, deadline=None)
def test_combination_table_pigeonhole(sig_a, h, data):
    """Manku combination-table math used by _hamming_combination_pairs:
    flipping <= h bits of a 64-bit signature always leaves some
    (n_blocks - h)-block subset identical (recall-exact blocking).
    Mirrors the block layout (w = bits // b, last block takes the
    remainder) and the default n_blocks = h + min(h, 3)."""
    from itertools import combinations

    bits = 64
    b = h + min(h, 3)
    flips = data.draw(st.lists(st.integers(0, bits - 1), min_size=0,
                               max_size=h, unique=True))
    sig_b = sig_a
    for f in flips:
        sig_b ^= 1 << f

    w = bits // b
    def block(sig, t):
        start = t * w
        width = w if t < b - 1 else bits - w * (b - 1)
        return (sig >> start) & ((1 << width) - 1)

    match = any(
        all(block(sig_a, i) == block(sig_b, i) for i in combo)
        for combo in combinations(range(b), b - h)
    )
    assert match


_MATCHER_TOKENS = [
    "DOC:12:3456789", "DOC:12:345678", "C.12.3456.N", "D.12.3456.D",
    "C 12 3456 F", "S 11 2222 D", "C-1/23", "C-9999/99", "¶", "¶ ",
    "1234567890", "12345678901", "123456789", "٣٤٥٦٧٨٩٠١٢", "١٢٣",
    "Rev. Proto. 2019, 12", "Bull. Arb. 1999, 1", "J. Com. 2001, 9",
    "Ann. Leg. 2000, 1234", "Rev. Proto.", "o. 2",
    "per X dated 2020-01-01", "per ", " dated ", "dated 2020-01-01",
    "Reviewed by someone on 3 mars 2021", "rule 12 of family-02",
    "rule 3 of unified charter 123", "rule 99 of E0042",
    "PARTIES: Alpha Corp vs Beta NV", "CELEX:32019L0001",
    "https://lex.example.eu/a-b", "é", "û", " ", ".", "-", "/", ",",
    "x", "N", "F", "D", "C", "2020", "..", "C.", ".N", "per",
]


@given(st.lists(st.sampled_from(_MATCHER_TOKENS), min_size=0, max_size=40))
@settings(max_examples=400, deadline=None)
def test_fast_matchers_equal_raw_patterns_property(tokens):
    """Property form of the matcher-equivalence contract: on text composed
    of adversarial fragments (trigger prefixes, ¶ filters, Unicode digits,
    overlap-inducing case-number tails), every fast matcher yields exactly
    the raw _FAMILIES finditer match set — with and without the shared
    per-doc cache."""
    import re as _re
    from decisions_knowledge_graph_data_spark.operators.extract import (
        _FAMILIES, _build_matchers,
    )

    text = "".join(tokens)
    compiled = [(k, _re.compile(p)) for k, p in _FAMILIES]
    matchers = _build_matchers()
    ref = sorted((k, m.start(), m.end())
                 for k, rx in compiled for m in rx.finditer(text))
    bare = sorted((k, s, e) for k, scan in matchers for s, e in scan(text))
    cache = {}
    shared = sorted((k, s, e)
                    for k, scan in matchers for s, e in scan(text, cache))
    assert ref == bare == shared, text[:120]
