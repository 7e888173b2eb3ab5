#!/usr/bin/env bash
# Package coords_spark as a --py-files zip and spark-submit the chunk
# pipeline (BASELINE.json:14). Extra args pass through to submit_job.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/dist"
cd "$REPO"
python "$REPO/tools/build_zip.py"
exec spark-submit --master "${SPARK_MASTER:-local[8]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-16}" \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$REPO/dist/coords_spark.zip" \
  "$REPO/tools/submit_job.py" "$@"
