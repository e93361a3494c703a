"""ANN family throughput evidence: exact BLAS scan vs PQ/ADC compressed
scan over an N x 64-dim corpus (headline N=100M), plus a
two-parallelism ADC pair.

Protocol (same setup/leg discipline as bench_scaling.py): the corpus and
its PQ encoding are built ONCE, untimed, into /tmp; each timed leg is a
fresh cold measurement repeated N times reporting the min (this host
stalls in waves — see BENCH/BASELINE.md round-5 notes).

Usage:
  python tools/bench_ann.py setup [n_rows]
  python tools/bench_ann.py leg exact|adc|adc_refine [cpus] [repeats]
  python tools/bench_ann.py all [n_rows]      # setup + the report matrix

The serving shape is the realistic one: codebooks trained offline on a
sample, corpus codes STORED (vec_id, pq_codes) — a probe batch scans the
compressed table, never re-encoding. m=8 subspaces x 256 codes = 8 bytes
per vector vs 256 bytes float32 (32x).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/kg_ann_bench"
N_DEFAULT = 1_000_000
DIMS = 64
M = 8
N_CODES = 256
K = 10
N_PROBES = 8
SAMPLE = 50_000


def _spark(cpus: int):
    from decisions_knowledge_graph_data_spark.session import get_spark

    return get_spark(f"ann-bench-{cpus}", parallelism=cpus,
                     shuffle_partitions=cpus)


def _vec_df(spark, n: int):
    """Deterministic pseudo-random unit-ish vectors via an Arrow kernel —
    no RNG state, reproducible across runs and partitionings."""
    import numpy as np

    def kernel(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0).to_numpy()
            # fully vectorized modular-hash values in [-0.5, 0.5)
            d = np.arange(DIMS, dtype=np.int64)
            v = (ids[:, None] * 2654435761 + d[None, :] * 40503984749) % 1021
            mat = (v.astype(np.float32) / 1021.0) - 0.5
            emb = pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), DIMS).cast(
                pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), emb], names=["vec_id", "embedding"])

    return spark.range(n).repartition(64).mapInArrow(
        kernel, "vec_id long, embedding array<float>")


def setup(n: int) -> None:
    from pyspark.sql import functions as F

    from decisions_knowledge_graph_data_spark.operators.similarity import (
        pq_encode, train_pq,
    )

    spark = _spark(8)
    vec_path = f"{ROOT}/vecs_{n}.parquet"
    code_path = f"{ROOT}/codes_{n}.parquet"
    if not os.path.exists(os.path.join(code_path, "_SUCCESS")):
        _vec_df(spark, n).write.mode("overwrite").parquet(vec_path)
        vecs = spark.read.parquet(vec_path)
        books = train_pq(
            vecs.filter(F.col("vec_id") % max(1, n // SAMPLE) == 0),
            "embedding", m=M, n_codes=N_CODES, n_iter=3)
        import numpy as np

        np.save(f"{ROOT}/books_{n}.npy", np.stack(books))
        # serving layout: codes PACKED as one fixed-width binary value
        # per row (the Faiss code-table shape). Parquet decodes a plain
        # BYTE_ARRAY column ~10x faster than list<int32> (measured:
        # list-decode was 90 s single-core over 100M rows — more than
        # the ADC arithmetic itself), and the scan kernel gets the whole
        # batch as ONE buffer to frombuffer/reshape.
        def pack(batches):
            import pyarrow as pa

            for rb in batches:
                if rb.num_rows == 0:
                    continue
                flat = rb.column(1).flatten().to_numpy(
                    zero_copy_only=False)
                codes = flat.astype(np.uint8).reshape(rb.num_rows, M)
                fsb = pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(M), rb.num_rows,
                    [None, pa.py_buffer(codes.tobytes())])
                yield pa.RecordBatch.from_arrays(
                    [rb.column(0), fsb.cast(pa.binary())],
                    names=["vec_id", "codes"],
                )

        pq_encode(vecs, "embedding", books).select(
            "vec_id", "pq_codes"
        ).mapInArrow(pack, "vec_id long, codes binary").write.mode(
            "overwrite").parquet(code_path)
    print(f"# setup done: {vec_path} + {code_path}", file=sys.stderr)


def _probes(spark, vec_path: str):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(vec_path).filter(F.col("vec_id") < N_PROBES)
        .select(F.col("vec_id").alias("probe_id"),
                F.col("embedding").alias("probe_vec"))
    )


def leg(which: str, cpus: int, repeats: int, n: int) -> dict:
    import numpy as np

    from decisions_knowledge_graph_data_spark.operators.similarity import (
        brute_force_topk_np, pq_topk,
    )

    spark = _spark(cpus)
    vec_path = f"{ROOT}/vecs_{n}.parquet"
    code_path = f"{ROOT}/codes_{n}.parquet"
    books = list(np.load(f"{ROOT}/books_{n}.npy"))
    probes = _probes(spark, vec_path)
    probes.count()  # warm the tiny probe read out of the timing
    runs = []
    rows = None
    for _ in range(repeats):
        t0 = time.time()
        if which == "exact":
            corpus = spark.read.parquet(vec_path)
            rows = brute_force_topk_np(
                corpus, probes, "vec_id", "embedding", "probe_id",
                "probe_vec", k=K).count()
        else:
            # ADC over the STORED codes (pq_topk re-encodes its corpus
            # argument, so the stored-codes serving shape inlines the
            # same Arrow scoring kernel against the codes parquet)
            rows = _adc_scan(
                spark, code_path, probes, books,
                refine=(4 if which == "adc_refine" else 1),
                vec_path=vec_path,
            )
        runs.append(round(time.time() - t0, 3))
    return {"leg": which, "cpus": cpus, "rows": rows,
            "runs": runs, "best": min(runs)}


def _adc_scan(spark, code_path, probes, books, refine, vec_path):
    """Score stored (vec_id, pq_codes) via per-probe LUTs — the serving
    path pq_topk's docstring describes, reading only the compressed
    table (plus, with refine, a candidate-pruned read of the vectors)."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = [np.asarray(bk, dtype=np.float64) for bk in books]
    m = len(b)
    w = b[0].shape[1]
    p_rows = probes.collect()
    p_keys = [r["probe_id"] for r in p_rows]
    p_mat = np.asarray([r["probe_vec"] for r in p_rows], dtype=np.float64)
    p_mat /= np.maximum(np.linalg.norm(p_mat, axis=1, keepdims=True), 1e-12)
    luts = np.stack(
        [p_mat[:, s * w:(s + 1) * w] @ b[s].T for s in range(m)], axis=1)
    keep = K * max(1, refine)

    def kernel(batches):
        # Arrow path + per-probe 1-D gathers (same recipe as pq_topk);
        # the packed-binary codes column decodes as ONE contiguous
        # buffer — frombuffer/reshape, no per-element work at all
        import pyarrow as pa  # noqa: F401

        for rb in batches:
            if rb.num_rows == 0:
                continue
            col = rb.column(1)
            bufs = col.buffers()  # [validity, offsets, data]
            off = np.frombuffer(bufs[1], dtype=np.int32)[
                col.offset:col.offset + rb.num_rows + 1]
            raw = np.frombuffer(bufs[2], dtype=np.uint8)
            codes = raw[off[0]:off[-1]].reshape(rb.num_rows, m)
            keys = rb.column(0).to_numpy()
            top = min(keep, rb.num_rows)
            pks, cks, cos = [], [], []
            for j, pk in enumerate(p_keys):
                acc = luts[j, 0][codes[:, 0]]
                for s in range(1, m):
                    acc = acc + luts[j, s][codes[:, s]]
                idx = np.argpartition(-acc, top - 1)[:top]
                pks.append(np.full(top, pk, dtype=np.int64))
                cks.append(keys[idx])
                cos.append(np.round(acc[idx], 6))
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate(pks)),
                 pa.array(np.concatenate(cks).astype(np.int64)),
                 pa.array(np.concatenate(cos))],
                names=["probe_id", "vec_id", "cosine"],
            )

    partials = spark.read.parquet(code_path).select(
        "vec_id", "codes"
    ).mapInArrow(kernel, "probe_id long, vec_id long, cosine double")
    wnd = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.col("vec_id"))
    ranked = (
        partials.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= keep)
    )
    if refine <= 1:
        return ranked.filter(F.col("rank") <= K).count()
    from decisions_knowledge_graph_data_spark.operators.dedup import cosine

    cand = ranked.select("probe_id", "vec_id")
    pv = probes.select(F.col("probe_id").alias("_rpk"),
                       F.col("probe_vec").cast("array<double>").alias("_rpv"))
    rescored = (
        spark.read.parquet(vec_path)
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(pv), F.col("probe_id") == F.col("_rpk"))
        .withColumn("c2", F.round(
            cosine(F.col("_rpv"), F.col("embedding").cast("array<double>")), 6))
    )
    wnd2 = Window.partitionBy("probe_id").orderBy(F.desc("c2"), F.col("vec_id"))
    return (
        rescored.withColumn("r2", F.row_number().over(wnd2))
        .filter(F.col("r2") <= K).count()
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "setup":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else N_DEFAULT
        setup(n)
        return
    if mode == "leg":
        which = sys.argv[2]
        cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        n = int(sys.argv[5]) if len(sys.argv) > 5 else N_DEFAULT
        print(json.dumps(leg(which, cpus, repeats, n)))
        return
    n = int(sys.argv[2]) if len(sys.argv) > 2 else N_DEFAULT
    setup(n)
    print("# run legs as separate processes for cold JVMs:", file=sys.stderr)
    print(f"#   python tools/bench_ann.py leg exact 8 3 {n}", file=sys.stderr)
    print(f"#   python tools/bench_ann.py leg adc 8 3 {n}", file=sys.stderr)
    print(f"#   python tools/bench_ann.py leg adc_refine 8 3 {n}", file=sys.stderr)
    print(f"#   python tools/bench_ann.py leg adc 2 3 {n}", file=sys.stderr)


if __name__ == "__main__":
    main()
