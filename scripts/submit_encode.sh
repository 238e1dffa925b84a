#!/usr/bin/env bash
# Cluster launch for the encode pipeline (north rule: spark-submit --py-files
# on a multi-executor cluster). Locally this degrades to local[N].
#
# Usage: scripts/submit_encode.sh <src_parquet_dir> <out_dir> [master]
set -euo pipefail
SRC=${1:?src parquet dir}
OUT=${2:?output dir}
MASTER=${3:-local[32]}

cd "$(dirname "$0")/.."
ZIP=/tmp/nail_parquet_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" nail_parquet_spark -x '*__pycache__*'

spark-submit \
  --master "$MASTER" \
  --name nail-spark-encode \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  scripts/run_encode_job.py "$SRC" "$OUT"
