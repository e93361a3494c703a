"""Streaming surface.

The reference has **no true stream processing** (SURVEY.md §2.9) — its
"streaming" is incremental/durable batch: write-as-you-go result files
(`ConcurrentProcessor.ts:117-238`) and resume-by-skipping-done-keys
(`ConcurrentRunner.ts:194-233`). Our batch pipeline reproduces those with
atomic per-stage writes and anti-join resume (plans/checkpoint.py).

For engines that do want a streaming surface, ``incremental.py`` provides
a Structured Streaming ingest: file-source stream of document parquet →
the same extraction kernel → ``foreachBatch`` append with the same
checkpoint tables, so the batch and streaming paths share one code path.
"""
