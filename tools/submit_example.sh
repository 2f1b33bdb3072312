#!/usr/bin/env bash
# Example cluster launch (north rule: spark-submit --py-files on a
# multi-executor cluster at sizes N and 4N executors).
#
# The package is pure Python — zip it and ship with --py-files; no jars
# to build. On a real deployment the pages table is an Iceberg catalog
# table (add the iceberg-spark-runtime package and catalog conf).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/wedge_parallel_triangle_counting_spark.zip
(cd "$REPO" && zip -qr "$ZIP" wedge_parallel_triangle_counting_spark)

EXECUTORS="${EXECUTORS:-8}"           # run once with N, once with 4N
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

exec spark-submit \
  --master "${MASTER:-yarn}" \
  --deploy-mode client \
  --num-executors "$EXECUTORS" \
  --executor-cores 4 \
  --executor-memory 8g \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 8)) \
  --py-files "$ZIP" \
  "$REPO/bench.py"
