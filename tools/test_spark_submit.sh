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
  jobs/run_kg_pipeline.py --input "$WORK/docs" --workdir "$WORK/out" --strict-invariant

echo "spark-submit run OK; outputs:"
ls "$WORK/out"
