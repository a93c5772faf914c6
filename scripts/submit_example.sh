#!/usr/bin/env bash
# Package the engine and submit to a cluster at two sizes (N and 4N
# executors) — the north_rule deployment shape. In the sandbox the same
# binary runs local-mode via --cores (bench.py automates the local proxy).
set -euo pipefail
cd "$(dirname "$0")/.."

zip -qr /tmp/samu_ocr_extraction_poc_spark.zip samu_ocr_extraction_poc_spark

COMMON=(
  --py-files /tmp/samu_ocr_extraction_poc_spark.zip
  --conf spark.sql.adaptive.enabled=true
  --conf spark.sql.adaptive.skewJoin.enabled=true
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=256
  --conf spark.sql.sources.partitionOverwriteMode=dynamic
  scripts/run_pipeline.py
  --input "${INPUT:?set INPUT}" --output "${OUTPUT:?set OUTPUT}" --n-parts 4096
)

# N executors
spark-submit --num-executors "${N:-64}" "${COMMON[@]}" --run-id "run-N"
# 4N executors (resume-safe: completed partitions are skipped)
spark-submit --num-executors "$((4 * ${N:-64}))" "${COMMON[@]}" --run-id "run-4N"
