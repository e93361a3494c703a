"""Scale evidence for the corpus-curation family (operators/textstats.py
+ the dedup curation ops): run pii_scrub, repetition_stats,
boilerplate_stats, typicality_score, and global_span_dedup over an
N-million-doc synthetic corpus at two parallelism levels (fresh JVM per
leg, never concurrent — measurement hygiene per CLAUDE.md) and report
throughput + scaling efficiency.

Reuses bench_trainprep's column-native corpus (~1 KB/doc, deterministic,
no external data). NOTE: that corpus is deliberately repetition-heavy
(each doc repeats one of 97 tokens ~100×), which makes it the WORST case
for these operators — hot n-gram keys, near-total span duplication —
i.e. the hub-skew regime the north rule calls out, not a soft corpus.

Usage: python tools/bench_curation.py [n_docs] [n_low] [n_high]
       (defaults 2_000_000 2 8 — the box's honest N vs 4N pair;
       n_low=0 runs ONLY the high leg — the data-linearity probe)
Prints one JSON line per leg plus a summary block to paste into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_trainprep import SETUP_SNIPPET, docs_path  # noqa: E402

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from decisions_knowledge_graph_data_spark.session import get_spark
from decisions_knowledge_graph_data_spark.operators.dedup import (
    global_span_dedup,
)
from decisions_knowledge_graph_data_spark.operators.textstats import (
    boilerplate_stats, pii_scrub, repetition_stats, typicality_score,
)

spark = get_spark(
    "curation-bench", parallelism={cpus}, shuffle_partitions={cpus},
    extra_conf={{"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)}},
)
docs = spark.read.parquet({docs_path!r})

out = {{"cpus": {cpus}, "n_docs": {n_docs}}}


def timed(key, fn):
    # steady-state: the first run pays one-time JIT/codegen (seconds and
    # serial — it poisons scaling pairs of seconds-long jobs)
    fn()
    t0 = time.time()
    r = fn()
    out[key] = round(time.time() - t0, 2)
    return r


# scan-stage op: force the full regex work via length() of the scrubbed
# column (an agg over counts alone would let Catalyst prune the scrub)
out["pii_sig"] = timed(
    "pii_sec",
    lambda: pii_scrub(docs, "doc_id", "text")
    .agg(F.sum(F.length("text_scrubbed")).alias("s"),
         F.sum("n_email").alias("e")).first().asDict(),
)

out["rep_sig"] = timed(
    "repetition_sec",
    lambda: repetition_stats(docs, "doc_id", "text")
    .agg(F.sum("n_words").alias("w"),
         F.sum((F.col("dup_word_frac") * 10000).cast("long")).alias("d"),
         F.sum((F.col("top_ngram_frac") * 10000).cast("long")).alias("t"))
    .first().asDict(),
)

out["bp_sig"] = timed(
    "boilerplate_sec",
    lambda: boilerplate_stats(docs, "doc_id", "text")
    .agg(F.sum("n_ngrams").alias("n"),
         F.sum("n_bp_distinct").alias("b"),
         F.sum((F.col("bp_char_frac") * 10000).cast("long")).alias("f"))
    .first().asDict(),
)

out["typ_sig"] = timed(
    "typicality_sec",
    lambda: typicality_score(docs, "doc_id", "text")
    .agg(F.sum("n_bigrams").alias("n"),
         F.sum("typicality").alias("t")).first().asDict(),
)

out["span_sig"] = timed(
    "span_sec",
    lambda: global_span_dedup(docs, "doc_id", "text")
    .agg(F.sum("n_spans").alias("n"),
         F.sum("n_kept").alias("k"),
         F.sum(F.length("text_dedup")).alias("c")).first().asDict(),
)

out["total_sec"] = round(
    out["pii_sec"] + out["repetition_sec"] + out["boilerplate_sec"]
    + out["typicality_sec"] + out["span_sec"], 2)
print(json.dumps(out))
"""

OPS = ("pii_sec", "repetition_sec", "boilerplate_sec", "typicality_sec",
       "span_sec", "total_sec")


def run_leg(cpus: int, n_docs: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cpus=cpus, n_docs=n_docs,
                              docs_path=docs_path(n_docs))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    leg = json.loads(line)
    print(line, flush=True)
    return leg


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    if not os.path.exists(os.path.join(docs_path(n_docs), "_SUCCESS")):
        code = SETUP_SNIPPET.format(repo=REPO, n_docs=n_docs,
                                    docs_path=docs_path(n_docs))
        subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)
    if n_low == 0:
        run_leg(n_high, n_docs)
        return
    lo = run_leg(n_low, n_docs)
    hi = run_leg(n_high, n_docs)
    ratio = n_high / n_low
    eff = {k: round((lo[k] / hi[k]) / ratio, 2) for k in OPS}
    # output identity across parallelism levels (the invariance half of
    # the two-cluster-size criterion)
    for sig in ("pii_sig", "rep_sig", "bp_sig", "typ_sig", "span_sig"):
        assert lo[sig] == hi[sig], (sig, lo[sig], hi[sig])
    print(json.dumps({
        "n_docs": n_docs, "pair": [n_low, n_high], "efficiency": eff,
        "low": lo, "high": hi,
    }))


if __name__ == "__main__":
    main()
