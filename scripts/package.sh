#!/bin/sh
# Build the --py-files artifact for spark-submit deployment.
#   sh scripts/package.sh [out.zip]     (default /tmp/dq.zip)
set -e
OUT="${1:-/tmp/dq.zip}"
cd "$(dirname "$0")/.."
rm -f "$OUT"
zip -qr "$OUT" dq -i 'dq/*.py'
echo "wrote $OUT"
echo "run:  spark-submit --py-files $OUT scripts/run_job.py --help"
