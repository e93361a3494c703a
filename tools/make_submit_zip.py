"""Package the engine for spark-submit --py-files.

Produces dist/decisions_kg_spark.zip containing the package, plus the
job entry point is jobs/run_kg_pipeline.py. Cluster usage:

    spark-submit \
      --py-files dist/decisions_kg_spark.zip \
      jobs/run_kg_pipeline.py \
      --input  <source table path (parquet/Iceberg)> \
      --workdir <checkpoint/output dir> [--resume]

Local verification: tools/test_spark_submit.sh runs the same command on
local[8] against a small generated corpus.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "decisions_knowledge_graph_data_spark"


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "decisions_kg_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
