#!/bin/bash
# North-rule check: the whole pipeline (build + WAND query + envelope)
# runs via `spark-submit --py-files <package.zip>` with the engine
# imported ONLY from the shipped zip — the deployment shape of a real
# multi-executor cluster. Usage: scripts/submit_check.sh
set -euo pipefail
cd "$(dirname "$0")/.."

PKG=/tmp/uci_searchengine_spark.zip
WORK=/tmp/submit_check
rm -f "$PKG"; rm -rf "$WORK"; mkdir -p "$WORK"

python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("/tmp/uci_searchengine_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("uci_searchengine_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF

SUBMIT=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'bin', 'spark-submit'))")
# copy the driver script OUT of the repo so imports can only come from the zip
cp scripts/submit_job.py "$WORK/job.py"
cd "$WORK"
"$SUBMIT" --master 'local[4]' --py-files "$PKG" "$WORK/job.py" "$WORK"
