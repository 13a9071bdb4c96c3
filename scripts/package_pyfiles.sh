#!/usr/bin/env bash
# Package bright_spark for cluster submission (north rule: the pipeline
# runs via spark-submit --py-files at 10^12-file scale):
#
#   scripts/package_pyfiles.sh                     # -> dist/bright_spark.zip
#   spark-submit --py-files dist/bright_spark.zip \
#       jobs/build_index.py --source s3://corpus --index-dir s3://idx \
#       --partitions 65536
#   spark-submit --py-files dist/bright_spark.zip \
#       jobs/query.py --index-dir s3://idx --q 'parser AND config'
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/bright_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/bright_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("bright_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/bright_spark.zip")
EOF
unzip -l dist/bright_spark.zip | tail -2
