#!/usr/bin/env bash
# Local verification of the spark-submit --py-files packaging path.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

python tools/make_submit_zip.py

WORK=$(mktemp -d /tmp/kg_submit.XXXX)
python - <<EOF
import sys
sys.path.insert(0, "$REPO")
from decisions_knowledge_graph_data_spark.session import get_spark
from decisions_knowledge_graph_data_spark.sources.corpus import documents_df
spark = get_spark("submit-fixture", parallelism=8)
documents_df(spark, 500).write.mode("overwrite").parquet("$WORK/docs")
spark.stop()
EOF

spark-submit --master 'local[8]' \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.ui.enabled=false \
  --py-files dist/decisions_kg_spark.zip \
  jobs/run_kg_pipeline.py --input "$WORK/docs" --workdir "$WORK/out" --strict-invariant \
  | tee "$WORK/run1.json"

# resume: simulate a mid-pipeline crash by deleting the outputs of the
# last two stages, then re-run with --resume — earlier stages must be
# read (not recomputed) and the final counts must be identical
rm -rf "$WORK/out/s6_nodes" "$WORK/out/s6_edges"
spark-submit --master 'local[8]' \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.ui.enabled=false \
  --py-files dist/decisions_kg_spark.zip \
  jobs/run_kg_pipeline.py --input "$WORK/docs" --workdir "$WORK/out" --resume \
  | tee "$WORK/run2.json"

j1=$(grep -o '{.*}' "$WORK/run1.json" | tail -1)
j2=$(grep -o '{.*}' "$WORK/run2.json" | tail -1)
if [ "$j1" != "$j2" ]; then
  echo "RESUME MISMATCH: $j1 vs $j2" >&2
  exit 1
fi

echo "spark-submit + resume OK; outputs:"
ls "$WORK/out"
