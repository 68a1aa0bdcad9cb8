#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (SURVEY.md §2.6 P6:
# single pinned environment, stdlib-only kernel, uniform executors).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ocr_pipeline_spark.zip
zip -qr dist/ocr_pipeline_spark.zip ocr_pipeline_spark -x '*__pycache__*'
echo "dist/ocr_pipeline_spark.zip ($(du -h dist/ocr_pipeline_spark.zip | cut -f1))"
