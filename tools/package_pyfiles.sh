#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployment (SURVEY §7.4).
#
#   tools/package_pyfiles.sh [out.zip]
#   spark-submit --py-files dist/pdf_ocr_api_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       repo/pdf_ocr_api_spark/runner.py --input ... --output ...
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-dist/pdf_ocr_api_spark.zip}"
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
zip -qr "$OUT" pdf_ocr_api_spark -x '*/__pycache__/*'
unzip -l "$OUT" | tail -2
echo "wrote $OUT"
