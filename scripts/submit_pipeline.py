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

from pyspark.sql import SparkSession


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
    out = pipe.run(pages)

    summary = {
        "run_id": pipe.run_id,
        "config_hash": cfg.config_hash(),
        "stages": {name: df.count() for name, df in out.items()},
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
