"""Python user-defined table functions (Spark 4 ``@udtf`` surface).

Third leg of the Python extension-surface trio next to the DataSource
API (``sources/python_datasource.py``) and transformWithStateInPandas
(``streaming/stateful.py``): a UDTF plugs a pure-Python row expander
into the SQL planner as a table-valued function. The shape that matters
at scale is the ``TABLE(...) PARTITION BY k`` form — Spark shuffles the
input on ``k``, instantiates the UDTF once per key, streams the
partition's rows through ``eval`` and calls ``terminate`` once at the
end, so a single pass can emit both per-row expansions AND a per-group
summary (something an ``explode`` cannot do without a second
aggregation over the exploded output).

Production expanders in this engine stay ``explode``-based (JVM-side,
zero Python, no forced shuffle — see COVERAGE.md "UDTF-like
expanders"); this module is the pluggable-custom-logic slot for
semantics the built-ins genuinely can't express, mirroring the
reference's per-document orchestration step (SURVEY.md §2.10) as a
planner-integrated table function instead of a driver loop.

``ChunkTextUDTF`` is the deterministic demonstrator: sliding
character-window chunking (the training-data "doc → overlapping
chunks" shape) with an md5 content fingerprint per chunk, plus one
``terminate``-emitted summary row per document (chunk_idx = -1,
full-text length + fingerprint). Pure function of the text, so DuckDB
reproduces every row arithmetically — the board query's oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf

CHUNK_CHARS = 120
STRIDE_CHARS = 100


@udtf(returnType="doc_id bigint, chunk_idx int, n_chars int, h8 string")
class ChunkTextUDTF:
    """Sliding-window chunker: one row per chunk, one summary per doc.

    Invoke as ``chunk_text(TABLE(v) PARTITION BY doc_id)`` — each
    partition is one document (doc_id is unique), ``eval`` yields its
    chunk rows, ``terminate`` the doc-level summary. Empty text yields
    no chunk rows but still a summary (len 0, md5 of "").
    """

    def __init__(self) -> None:
        self._doc = None

    def eval(self, row):
        text, did = row["text"], row["doc_id"]
        if text is None:
            return
        self._doc = (
            did, len(text), hashlib.md5(text.encode()).hexdigest()[:8]
        )
        for k, s in enumerate(range(0, len(text), STRIDE_CHARS)):
            chunk = text[s:s + CHUNK_CHARS]
            yield did, k, len(chunk), hashlib.md5(
                chunk.encode()
            ).hexdigest()[:8]

    def terminate(self):
        # reset after emitting: if the runtime reuses one instance for
        # several partitions, a doc whose rows all had NULL text must
        # not inherit the previous partition's summary
        if self._doc is not None:
            did, n, h = self._doc
            self._doc = None
            yield did, -1, n, h


def register_chunk_text(spark) -> None:
    """Per-session registration: ``spark.udtf.register``."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
