"""Scale evidence for the incremental signature-store dedup loop
(operators/dedup.py: build_signature_store / incremental_dedup).

The claim to price: once the kept corpus's LSH signature store is built,
deduping a NEW batch costs a batch-side pass + an index join + a pruned
verify read — NOT a full-corpus recompute. Legs (each a fresh JVM,
never concurrent — measurement hygiene per CLAUDE.md):

  full   — minhash_dup_pairs over corpus+batch (what you pay per batch
           with no store)
  build  — one-time build_signature_store over the kept corpus
  inc    — incremental_dedup of the 5% batch against the store
  inc@lo — same at the low parallelism level (scaling pair)

Corpus: deterministic, column-native (no external data): ~60 words/doc
seeded by xxhash64(doc_id); batch = doc_ids with id % 20 == 19 (5%);
every id % 40 == 39 doc copies store doc id-19 plus a mutation, so half
the batch are planted cross-half near-dups and pair counts are O(n),
not O(n^2) (a dup-saturated corpus would measure pair materialization,
not the loop).

Usage: python tools/bench_incremental_dedup.py [n_docs] [n_low] [n_high]
       (defaults 2_000_000 2 8)
Prints one JSON line per leg plus a summary block for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETUP_SNIPPET = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from decisions_knowledge_graph_data_spark.session import get_spark

spark = get_spark("incdedup-setup", parallelism=8, shuffle_partitions=8)
n = {n_docs}
ids = spark.range(n).select(F.col("id").alias("doc_id"))
is_dup = F.col("doc_id") % 40 == 39
seed = F.when(is_dup, F.col("doc_id") - 19).otherwise(F.col("doc_id"))
words = F.transform(
    F.sequence(F.lit(0), F.lit(59)),
    lambda j: F.concat(
        F.lit("w"),
        F.pmod(F.xxhash64(seed * F.lit(64) + j), F.lit(50000)).cast("string"),
    ),
)
txt = F.concat_ws(" ", words)
txt = F.when(
    is_dup,
    F.concat(txt, F.lit(" mutated"), (F.col("doc_id") % 997).cast("string")),
).otherwise(txt)
docs = ids.select("doc_id", txt.alias("text"))
docs.write.mode("overwrite").parquet({docs_path!r})
print("setup done", n)
spark.stop()
"""

LEG_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from decisions_knowledge_graph_data_spark.session import get_spark
from decisions_knowledge_graph_data_spark.operators.dedup import (
    build_signature_store, incremental_dedup, minhash_dup_pairs,
)

spark = get_spark("incdedup-{leg}", parallelism={cpus},
                  shuffle_partitions={cpus})
docs = spark.read.parquet({docs_path!r})
corpus = docs.filter(F.col("doc_id") % 20 != 19)
batch = docs.filter(F.col("doc_id") % 20 == 19)
t0 = time.time()
leg = {leg!r}
if leg == "full":
    n_pairs = minhash_dup_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.4).count()
elif leg == "build":
    build_signature_store(corpus, "doc_id", "text", {store_root!r})
    n_pairs = -1
else:
    n_pairs = incremental_dedup(
        spark, batch, "doc_id", "text", {store_root!r},
        jaccard_threshold=0.4).count()
wall = time.time() - t0
n_batch = batch.count()
print(json.dumps({{"leg": leg, "cpus": {cpus}, "wall_s": round(wall, 2),
                   "n_pairs": n_pairs, "n_batch": n_batch,
                   "batch_docs_per_s": round(n_batch / wall, 1)}}))
spark.stop()
"""


def _run(snippet: str, **kw) -> dict:
    # start_new_session + killpg: on timeout the WHOLE process group dies,
    # including the local[N] JVM grandchild — a surviving JVM would burn
    # CPU into the next leg and poison its timing (CLAUDE.md measurement
    # hygiene).
    import signal

    code = snippet.format(repo=REPO, **kw)
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, start_new_session=True)
    try:
        out, err = proc.communicate(timeout=7200)
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        raise SystemExit("leg timed out; process group killed")
    line = None
    for ln in out.splitlines():
        if ln.startswith("{"):
            line = json.loads(ln)
    if proc.returncode != 0:
        print(out[-2000:], file=sys.stderr)
        print(err[-4000:], file=sys.stderr)
        raise SystemExit(f"leg failed rc={proc.returncode}")
    if line is None:
        print(out[-2000:], file=sys.stderr)
        raise SystemExit("leg exited 0 without printing its JSON line")
    print(json.dumps(line))
    return line


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    work = os.path.join(tempfile.gettempdir(), f"incdedup_{n_docs}")
    docs_path = os.path.join(work, "docs.parquet")
    store_root = os.path.join(work, "store")
    # gate on the _SUCCESS marker, not the directory: a killed setup
    # leaves a partial parquet dir that would silently benchmark a
    # smaller corpus
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        code = SETUP_SNIPPET.format(repo=REPO, n_docs=n_docs,
                                    docs_path=docs_path)
        r = subprocess.run([sys.executable, "-c", code], timeout=7200)
        if r.returncode != 0:
            raise SystemExit("setup failed")
    import shutil

    shutil.rmtree(store_root, ignore_errors=True)

    full = _run(LEG_SNIPPET, leg="full", cpus=n_high, docs_path=docs_path,
                store_root=store_root)
    build = _run(LEG_SNIPPET, leg="build", cpus=n_high, docs_path=docs_path,
                 store_root=store_root)
    inc_hi = _run(LEG_SNIPPET, leg="inc", cpus=n_high, docs_path=docs_path,
                  store_root=store_root)
    inc_lo = _run(LEG_SNIPPET, leg="inc_lo", cpus=n_low, docs_path=docs_path,
                  store_root=store_root)

    speedup = full["wall_s"] / inc_hi["wall_s"]
    eff = (inc_lo["wall_s"] / inc_hi["wall_s"]) / (n_high / n_low)
    print(json.dumps({
        "summary": "incremental_dedup",
        "n_docs": n_docs,
        "batch_pct": 5.0,
        "full_recompute_s": full["wall_s"],
        "store_build_once_s": build["wall_s"],
        "incremental_batch_s": inc_hi["wall_s"],
        "per_batch_speedup_vs_full": round(speedup, 2),
        "pairs_full": full["n_pairs"],
        "pairs_incremental": inc_hi["n_pairs"],
        "scaling": {"n_low": n_low, "n_high": n_high,
                    "low_s": inc_lo["wall_s"], "high_s": inc_hi["wall_s"],
                    "efficiency": round(eff, 2)},
    }))


if __name__ == "__main__":
    main()
