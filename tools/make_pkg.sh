#!/bin/sh
# Package the engine for `spark-submit --py-files` (north-rule packaging).
# Usage: tools/make_pkg.sh [out.zip]
set -e
OUT="${1:-/tmp/spark_ingest_pkg.zip}"
cd "$(dirname "$0")/.."
rm -f "$OUT"
python3 -c "
import zipfile, pathlib
out = zipfile.ZipFile('$OUT', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('logstash_filter_elastic_integration_spark').rglob('*.py')):
    out.write(p, str(p))
out.close()
print('$OUT')
"
