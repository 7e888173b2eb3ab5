#!/usr/bin/env bash
# Package coords_spark as a --py-files zip and spark-submit the chunk
# pipeline (BASELINE.json:14). Extra args pass through to submit_job.py.
#
# Carries the engine's payload-aware session config (mirrors
# coords_spark/session.py — spark-submit does NOT run through get_spark,
# so without these the 1g default heap OOMs shuffling KB-sized image rows
# and the 128 MB scan splits cap local parallelism):
#   DRIVER_MEM          heap (default 8g; scale with --master core count)
#   SHUFFLE_PARTITIONS  shuffle partition count (default 16)
#   SPARK_MASTER        master URL (default local[8])
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/dist"
cd "$REPO"
python "$REPO/tools/build_zip.py"
exec spark-submit --master "${SPARK_MASTER:-local[8]}" \
  --driver-memory "${DRIVER_MEM:-8g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-16}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch="${ARROW_BATCH:-16384}" \
  --conf spark.sql.files.maxPartitionBytes="${MAX_PARTITION_BYTES:-16m}" \
  --conf spark.sql.files.openCostInBytes="${OPEN_COST:-1m}" \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$REPO/dist/coords_spark.zip" \
  "$REPO/tools/submit_job.py" "$@"
