#!/usr/bin/env python
"""A/B: ObjectHashAggregate sort-fallback threshold + min_by keeper agg.

Spark's ObjectHashAggregateExec (collect_list, min_by, ...) falls back to a
SORT-based path after `spark.sql.execution.objectHashAggregate.sortBased.
fallbackThreshold` distinct keys PER PARTITION (default 128). Both agg stages
here have 10^4-10^5 groups/partition, so the default silently turns them into
sorts. Variants (full exact pipeline, alternated best-of-N):

  v0 baseline          current code, default threshold
  v4 thresh            threshold=64M (reassembly collect_list goes true-hash)
  v5 thresh+min_by     v4 + keeper agg as min_by (ObjectHashAggregate, no sort)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def keepers_min_by(units, id_col="url"):
    return (
        units.withColumn("_h", F.xxhash64("norm_unit"))
        .groupBy("_h", "norm_unit")
        .agg(
            F.min_by(F.struct(F.col(id_col), F.col("unit_idx")),
                     F.struct(F.col(id_col), F.col("unit_idx"))).alias("_keeper"),
            F.count("*").alias("n_occ"),
        )
        .select("norm_unit",
                F.col(f"_keeper.{id_col}").alias(id_col),
                F.col("_keeper.unit_idx").alias("unit_idx"),
                "n_occ")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=200000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from bench import ensure_pages_cache
    from corpus_dedup_spark.operators.exact_dedup import (
        dedup_keepers, explode_units_arrow, reassemble)
    from corpus_dedup_spark.plans.session import build_session

    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)
    parts = max(args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name="profile_objhash",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    THRESH = "spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold"
    default_thresh = spark.conf.get(THRESH, "128")

    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()
    warm = pages.limit(4000)

    def full_v0(p):
        return reassemble(dedup_keepers(explode_units_arrow(p)).drop("n_occ"))

    def full_v5(p):
        return reassemble(keepers_min_by(explode_units_arrow(p)).drop("n_occ"))

    variants = {
        "v0_baseline": (default_thresh, full_v0),
        "v4_thresh": ("67108864", full_v0),
    }
    for th, fn in variants.values():
        spark.conf.set(THRESH, th)
        fn(warm).count()
    spark.conf.set(THRESH, default_thresh)

    best: dict[str, float] = {}
    counts: dict[str, int] = {}
    for _ in range(args.repeats):
        for name, (th, fn) in variants.items():
            spark.catalog.clearCache()
            p = pages.cache(); p.count()
            spark.conf.set(THRESH, th)
            try:
                t0 = time.time()
                counts[name] = fn(p).count()
                dt = time.time() - t0
            finally:
                spark.conf.set(THRESH, default_thresh)
            best[name] = min(best.get(name, float("inf")), dt)

    assert len(set(counts.values())) == 1, counts
    print(json.dumps({k: round(v, 3) for k, v in best.items()} |
                     {"cores": args.cores, "n_docs": args.n_docs,
                      "rows": counts["v0_baseline"]}))


if __name__ == "__main__":
    main()
