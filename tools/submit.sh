#!/usr/bin/env bash
# Package coords_spark as a --py-files zip and spark-submit the chunk
# pipeline (BASELINE.json:14). Extra args pass through to submit_job.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/dist"
cd "$REPO"
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/coords_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("coords_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("built dist/coords_spark.zip")
EOF
exec spark-submit --master "${SPARK_MASTER:-local[8]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-16}" \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$REPO/dist/coords_spark.zip" \
  "$REPO/tools/submit_job.py" "$@"
