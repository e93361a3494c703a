"""Measurement-only scale-up generator (round 6).

The driver's round-5 MEASUREMENT ran at a driver-generated sf1.0 that no
longer exists on disk. This tool extrapolates an sf-dir of the same
*shape* from /root/testdata/sf0.1 so optimization work can keep being
measured at that scale locally:

* ``documents`` — regenerated from the observed generator model (31-word
  vocabulary, uniform 10-100 words/doc, observed lang weights,
  ``src{i%%20}`` sources, exact-dup planting at the observed rate) with a
  fixed numpy seed;
* relational/event/embedding tables — K copies of the sf0.1 rows with
  join-preserving key shifts (every foreign key moves by the same
  per-copy offset as its parent), so join/group cardinalities scale
  linearly like a real sf increase;
* files are written like the driver's: one file per table, default row
  groups (documents land in a single row group — the unsplittable-scan
  shape the round-6 spread fix targets).

This generates INPUT DATA for timing only — correctness gates keep
running against the checked-in sf0.001/0.01/0.1 fixtures and DuckDB.

Usage: python tools/gen_scale_dir.py [out_dir] [scale_factor_int]
       (defaults: /root/testdata/sf1.0  10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    vocab = np.array(VOCAB)
    n_words = rng.integers(10, 101, size=n)
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), size=n_words[i])]
        texts.append(" ".join(words.tolist()))
    # exact-dup planting at the sf0.1 observed rate (8 / 5000)
    n_dups = max(1, round(n * 8 / 5000))
    dup_targets = rng.integers(0, n, size=n_dups)
    dup_sources = rng.integers(0, n, size=n_dups)
    for t, s in zip(dup_targets, dup_sources):
        if t != s:
            texts[t] = texts[s]
    langs = rng.choice(LANGS, size=n, p=LANG_W)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def replicate(name: str, k: int, shift_cols: dict[str, int]) -> pa.Table:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    copies = []
    for c in range(k):
        cols = {}
        for f in t.schema:
            col = t[f.name]
            if f.name in shift_cols and c > 0:
                cols[f.name] = pa.compute.add(col, shift_cols[f.name] * c)
            else:
                cols[f.name] = col
        copies.append(pa.table(cols))
    return pa.concat_tables(copies)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260822)

    docs = gen_documents(5000 * k, rng)
    pq.write_table(docs, os.path.join(out, "documents.parquet"))

    # join-preserving key shifts: child FK offsets == parent PK offsets
    C, O, P, S, E, U, V = 10**7, 10**8, 10**6, 10**5, 10**9, 10**6, 10**6
    plans = {
        "customer": {"c_custkey": C},
        "orders": {"o_orderkey": O, "o_custkey": C},
        "lineitem": {"l_orderkey": O, "l_partkey": P, "l_suppkey": S},
        "part": {"p_partkey": P},
        "supplier": {"s_suppkey": S},
        "events": {"event_id": E, "user_id": U},
        "embeddings": {"vec_id": V},
    }
    for name, shifts in plans.items():
        pq.write_table(replicate(name, k, shifts),
                       os.path.join(out, f"{name}.parquet"))
    for name in ("nation", "region"):  # dimensions: constant at any sf
        pq.write_table(pq.read_table(os.path.join(SRC, f"{name}.parquet")),
                       os.path.join(out, f"{name}.parquet"))
    for f in sorted(os.listdir(out)):
        p = os.path.join(out, f)
        m = pq.ParquetFile(p)
        print(f, m.metadata.num_rows, "rows,", m.metadata.num_row_groups,
              "row groups,", round(os.path.getsize(p) / 1e6, 1), "MB")


if __name__ == "__main__":
    main()
