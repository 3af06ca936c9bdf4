#!/bin/sh
# Package the engine for spark-submit --py-files (north rule ships the
# job as: spark-submit --py-files engine.zip jobs/extract_job.py ...)
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
python -m zipfile -c engine.zip zhtml_spark/
echo "wrote $(pwd)/engine.zip"
echo "usage: spark-submit --py-files engine.zip jobs/extract_job.py --input <tbl> --output <dir>"
