"""N-way stage-output merge — the mergeJobResults / merge_full_data analog.

Parity targets:
  - keep keys present in ALL stage outputs, report the rest with which
    stage they're missing from (`mergeJobResults.ts:206-242`,
    `merge_full_data.ts:133-151`);
  - strip excluded metadata fields before merging
    (`merge_full_data.ts:28-33`, `mergeJobResults.ts:308-318`);
  - deterministic output order by key (`mergeJobResults.ts:300`).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXCLUDED_FIELDS = ["custom_id", "run_ts", "attempt"]  # metadata, not payload


def merge_stage_outputs(
    stages: dict[str, DataFrame], keys: list[str],
    excluded: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Inner-join all stage outputs on the composite key.

    Returns (merged, missing_report) where missing_report has one row per
    (key, stage it is missing from) — built from the union of keys via
    left_anti per stage (the "which job is it missing from" log of
    mergeJobResults.ts:223-236).
    """
    excluded = EXCLUDED_FIELDS if excluded is None else excluded
    cleaned: dict[str, DataFrame] = {}
    for name, df in stages.items():
        drop = [c for c in excluded if c in df.columns]
        out = df.drop(*drop) if drop else df
        # prefix non-key columns so the N-way join never collides
        renames = {c: f"{name}__{c}" for c in out.columns if c not in keys}
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        cleaned[name] = out

    merged = reduce(lambda a, b: a.join(b, keys, "inner"), cleaned.values())
    merged = merged.orderBy(*keys)

    all_keys = reduce(
        lambda a, b: a.unionByName(b),
        [df.select(*keys) for df in cleaned.values()],
    ).distinct()
    reports = []
    for name, df in cleaned.items():
        missing = all_keys.join(df.select(*keys).distinct(), keys, "left_anti")
        reports.append(missing.withColumn("missing_from", F.lit(name)))
    missing_report = reduce(lambda a, b: a.unionByName(b), reports)
    return merged, missing_report
