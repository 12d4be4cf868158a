#!/bin/sh
# Build the spark-submit --py-files artifact.
set -e
cd "$(dirname "$0")/.."
rm -f goorc_spark.zip
zip -qr goorc_spark.zip goorc_spark -x "*__pycache__*"
echo "built $(pwd)/goorc_spark.zip ($(du -h goorc_spark.zip | cut -f1))"
