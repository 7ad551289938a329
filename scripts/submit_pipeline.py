#!/usr/bin/env python
"""Cluster entry point for spark-submit: run the full checkpointed dedup pipeline.

  spark-submit --py-files dist/corpus_dedup_spark.zip scripts/submit_pipeline.py \
      --input /path/to/pages_parquet_or_table --work-dir /path/to/checkpoints

On a cluster the SparkSession comes from spark-submit's conf (no .master() override);
locally it falls back to local[*].
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages parquet path or table name (url, warc_ts, html, text, lang)")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--mode", default="sentence")
    ap.add_argument("--max-length", type=int, default=0)
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("corpus_dedup_pipeline").getOrCreate()

    from corpus_dedup_spark.config import DedupConfig
    from corpus_dedup_spark.plans.pipeline import DedupPipeline

    cfg = DedupConfig(mode=args.mode, max_length=args.max_length,
                      jaccard_threshold=args.jaccard_threshold)
    pages = (spark.read.parquet(args.input) if "/" in args.input
             else spark.table(args.input))
    pipe = DedupPipeline(spark, cfg, args.work_dir, run_id=args.run_id)
    n_docs = pages.count()
    # pipeline wall is timed AFTER session creation and the input count, so
    # JVM/executor cold-start (a constant at every cluster size) is excluded
    # from the scaling comparison
    t0 = time.time()
    out = pipe.run(pages)
    stages = {name: df.count() for name, df in out.items()}
    wall = time.time() - t0

    # per-stage walls from the lineage rows (written by _record_lineage)
    try:
        stage_walls = {
            r["stage"]: r["wall_ms"] / 1000.0
            for r in pipe.lineage().select(
                "stage", F.col("counters")["wall_ms"].alias("wall_ms")
            ).distinct().collect()
        }
    except Exception:
        stage_walls = {}

    summary = {
        "run_id": pipe.run_id,
        "config_hash": cfg.config_hash(),
        "stages": stages,
        "stage_wall_sec": {k: round(v, 2) for k, v in stage_walls.items()},
        "n_docs": n_docs,
        "pipeline_wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1) if wall > 0 else None,
    }
    print("SUBMIT_SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
