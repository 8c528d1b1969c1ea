#!/usr/bin/env bash
# Build the spark-submit shippable artifact (north rule: ships via
# spark-submit --py-files on a multi-executor cluster).
set -euo pipefail
cd "$(dirname "$0")"
python -m zipfile -c nemo_spark.zip nemo_spark/
echo "built nemo_spark.zip — run e.g.:"
echo "  spark-submit --py-files nemo_spark.zip your_job.py"
