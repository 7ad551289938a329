#!/usr/bin/env python
"""Package the engine for `spark-submit --py-files` (north-rule deployment path).

Builds dist/corpus_dedup_spark.zip containing the pure-Python package (no tests, no
caches). Example cluster submit:

  spark-submit \
    --py-files dist/corpus_dedup_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=100000 \
    scripts/submit_pipeline.py --input <pages table> --work-dir <checkpoint dir>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "corpus_dedup_spark.zip")
    pkg = os.path.join(REPO, "corpus_dedup_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
