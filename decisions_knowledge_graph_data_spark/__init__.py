"""decisions_knowledge_graph_data_spark — a PySpark-native knowledge-graph
construction engine.

A from-scratch, Spark-first rebuild of the *capabilities* of the reference
pipeline `shaharzep/decisions-knowledge-graph-data` (a Node.js/TypeScript
row-at-a-time LLM-orchestration pipeline): schema-validated structured
extraction, (subj, pred, obj) triple emission, entity linking with
broadcast-dictionary fast paths + MinHash/LSH blocking + vectorized
similarity scoring, canonicalization via iterative connected components,
checkpoint/resume, and per-partition lineage/metrics — all expressed as
DataFrame/SQL plans that Catalyst optimizes, with Arrow-batched pandas
kernels only where built-in operators genuinely can't express the
semantics.

Package layout:
  sources/    deterministic synthetic corpus + registry generators, readers
  functions/  pure column-expression helpers (ids, text normalization)
  operators/  extraction kernels, linking, canonicalization, dedup, ANN
  plans/      end-to-end staged pipeline with checkpoint/resume + metrics
  streaming/  incremental-batch surface (foreachBatch) — the reference has
              no true stream processing (SURVEY.md §2.9)
"""

__version__ = "0.1.0"
