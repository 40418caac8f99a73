#!/usr/bin/env bash
# Cluster submission (north rule: "run via spark-submit --py-files on a
# multi-executor cluster at two cluster sizes").
#
# Packages the engine as a zip and submits the end-to-end pipeline
# (fagi_gis_spark.pipeline.runner) — locally this exercises the exact
# spark-submit + --py-files path a cluster run uses; on a real cluster
# swap --master for yarn/k8s and set the executor counts for the N and
# 4N measurements:
#
#   tools/submit.sh --master spark://host:7077 \
#       --conf spark.executor.instances=8  ...   # N
#   tools/submit.sh --master spark://host:7077 \
#       --conf spark.executor.instances=32 ...   # 4N
#
# Everything after the known flags is forwarded to spark-submit verbatim.

set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT_DIR="${OUT_DIR:-/tmp/fagi_submit_out}"
SF_DIR="${SF_DIR:-/root/testdata/sf0.001}"
MASTER="${MASTER:-local[8]}"

ZIP="$(mktemp -d)/fagi_gis_spark.zip"
(cd "$REPO" && python -c "
import shutil, sys, zipfile, os
with zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk('fagi_gis_spark'):
        dirs[:] = [d for d in dirs if d != '__pycache__']
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('packaged', '$ZIP')
")

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=32 \
  --py-files "$ZIP" \
  "$@" \
  "$REPO/fagi_gis_spark/pipeline/runner.py" \
  --sf-dir "$SF_DIR" --out-dir "$OUT_DIR" --transformation keep_a
