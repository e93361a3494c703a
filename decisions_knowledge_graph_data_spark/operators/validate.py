"""Schema validation + valid/invalid routing — the "typed boundary".

Parity targets (SURVEY.md §2.8):
  - AJV compile+validate per stage, allErrors, formatted error strings
    (`src/utils/validators.ts:27-117`);
  - valid/invalid routing with failure categories and preserved payloads
    (`ConcurrentProcessor.ts:406-431`; categories
    `ResultProcessor.ts:491-514`);
  - JSON salvage parse: direct parse → fenced block → first ``{...}``
    (`src/utils/validators.ts:191-226`).

Two surfaces:
  - column-level checks (`enum_check`, `pattern_check`, `range_check`,
    `required_check`) composed into a ``validate_columns`` routing split —
    whole-stage codegen, zero Python;
  - a ``mapInPandas`` kernel (`validate_json_kernel`) for nested JSON
    documents against a JSON-Schema-subset dict, compiled once per
    partition — the Arrow-batched analog of the AJV path, used when rows
    carry nested structs/JSON strings rather than flat columns.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------ column checks


def enum_check(col: Column, allowed: list[str], name: str) -> Column:
    return F.when(col.isin(*allowed), F.lit(None).cast("string")).otherwise(
        F.concat(F.lit(f"{name}: must be one of {allowed}, got "), col.cast("string"))
    )


def pattern_check(col: Column, pattern: str, name: str) -> Column:
    return F.when(col.rlike(pattern), F.lit(None).cast("string")).otherwise(
        F.concat(F.lit(f"{name}: must match {pattern}, got "), col.cast("string"))
    )


def range_check(col: Column, lo: float, hi: float, name: str) -> Column:
    return F.when(
        col.isNotNull() & (col >= lo) & (col <= hi), F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit(f"{name}: must be in [{lo}, {hi}], got "), col.cast("string")))


def required_check(col: Column, name: str) -> Column:
    return F.when(
        col.isNotNull() & (col.cast("string") != ""), F.lit(None).cast("string")
    ).otherwise(F.lit(f"{name}: required"))


def validate_columns(df: DataFrame, checks: list[Column]) -> tuple[DataFrame, DataFrame]:
    """Apply check columns; route rows to (valid, failures). Failures carry
    AJV-style formatted error strings (semicolon-joined, validators.ts:91-104)."""
    errs = F.array_compact(F.array(*checks))
    tagged = df.withColumn("_errors", errs)
    ok = tagged.filter(F.size("_errors") == 0).drop("_errors")
    bad = tagged.filter(F.size("_errors") > 0).withColumn(
        "error", F.array_join("_errors", "; ")
    ).withColumn("reason", F.lit("Schema Validation")).drop("_errors")
    return ok, bad


# ---------------------------------------------------------- JSON-doc kernel

_FENCE_RE = re.compile(r"```(?:json)?\s*(\{.*?\})\s*```", re.DOTALL)
_BRACE_RE = re.compile(r"\{.*\}", re.DOTALL)
MAX_SALVAGE_BYTES = 100_000  # 100KB guard (validators.ts:191-226)


def salvage_json(text: str | None):
    """Direct parse → ```json fence → first {...} — validators.ts:191-226."""
    if text is None or len(text) > MAX_SALVAGE_BYTES:
        return None
    try:
        return json.loads(text)
    except (ValueError, TypeError):
        pass
    m = _FENCE_RE.search(text)
    if m:
        try:
            return json.loads(m.group(1))
        except ValueError:
            pass
    m = _BRACE_RE.search(text)
    if m:
        try:
            return json.loads(m.group(0))
        except ValueError:
            return None
    return None


def _validate_value(value, schema: dict, path: str, errors: list[str]) -> None:
    """Minimal JSON-Schema-draft-07 subset: type, required, properties,
    items, enum, pattern, minimum/maximum, minLength/maxLength, anyOf."""
    if "anyOf" in schema:
        sub_errs = []
        for sub in schema["anyOf"]:
            es: list[str] = []
            _validate_value(value, sub, path, es)
            sub_errs.append(es)
        if not any(not es for es in sub_errs):
            errors.append(f"{path}: does not match anyOf")
        return
    t = schema.get("type")
    if t:
        ok = {
            "object": lambda v: isinstance(v, dict),
            "array": lambda v: isinstance(v, list),
            "string": lambda v: isinstance(v, str),
            "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
            "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
            "boolean": lambda v: isinstance(v, bool),
            "null": lambda v: v is None,
        }[t](value)
        if not ok:
            errors.append(f"{path}: expected {t}")
            return
    if "enum" in schema and value not in schema["enum"]:
        errors.append(f"{path}: not in enum")
    if isinstance(value, str):
        if "pattern" in schema and not re.search(schema["pattern"], value):
            errors.append(f"{path}: pattern mismatch")
        if "minLength" in schema and len(value) < schema["minLength"]:
            errors.append(f"{path}: shorter than minLength")
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            errors.append(f"{path}: longer than maxLength")
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in schema and value < schema["minimum"]:
            errors.append(f"{path}: below minimum")
        if "maximum" in schema and value > schema["maximum"]:
            errors.append(f"{path}: above maximum")
    if isinstance(value, dict):
        for req in schema.get("required", []):
            if req not in value:
                errors.append(f"{path}.{req}: required")
        for k, sub in schema.get("properties", {}).items():
            if k in value:
                _validate_value(value[k], sub, f"{path}.{k}", errors)
    if isinstance(value, list) and "items" in schema:
        for i, item in enumerate(value):
            _validate_value(item, schema["items"], f"{path}[{i}]", errors)


def validate_json_kernel(df: DataFrame, json_col: str, schema: dict,
                         key_cols: list[str]) -> DataFrame:
    """Arrow-batched validate: parse (with salvage) + schema-check each
    JSON document; emits (keys..., valid boolean, error string)."""
    out_schema = ", ".join(f"{k} string" for k in key_cols) + ", valid boolean, error string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            valids, errors = [], []
            for raw in pdf[json_col]:
                doc = salvage_json(raw)
                if doc is None:
                    valids.append(False)
                    errors.append("Request Error: unparseable JSON")
                    continue
                errs: list[str] = []
                _validate_value(doc, schema, "$", errs)
                valids.append(not errs)
                errors.append("; ".join(errs) if errs else None)
            out = pdf[key_cols].astype(str).copy()
            out["valid"] = valids
            out["error"] = errors
            yield out

    return df.select(*key_cols, json_col).mapInPandas(kernel, schema=out_schema)
