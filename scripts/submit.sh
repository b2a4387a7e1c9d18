#!/usr/bin/env bash
# Package the engine and run it via spark-submit --py-files (north rule).
#   scripts/submit.sh [--master local[32]] [--sf-dir DIR] [--out DIR] [engine args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[${SPARK_GRAFT_CPUS:-32}]"
ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --master) MASTER="$2"; shift 2 ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

DIST="$REPO/dist"
mkdir -p "$DIST"
ZIP="$DIST/volltextextraktion_selenium_md_spark.zip"
(cd "$REPO" && rm -f "$ZIP" \
  && zip -qr "$ZIP" volltextextraktion_selenium_md_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.driver.memory="${SPARK_DRIVER_MEMORY:-48g}" \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/scripts/run_crawl.py" "${ARGS[@]}"
