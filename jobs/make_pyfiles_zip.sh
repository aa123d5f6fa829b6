#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule launch mode):
#   ./jobs/make_pyfiles_zip.sh            -> dist/em.zip
#   spark-submit --py-files dist/em.zip jobs/run_pipeline.py \
#       --input <web_pages> --workdir <dir> [--labeled <pairs>]
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/em.zip
zip -qr dist/em.zip entity_matching_in_online_retail_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "dist/em.zip ($(du -h dist/em.zip | cut -f1))"
