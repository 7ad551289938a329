#!/usr/bin/env python
"""Alternating phase-cost experiment for the exact-dedup pipeline at the bench
shape: extraction-only vs +keeper-agg vs full (reassembly+stats). Best-of-rounds,
variants alternate within one session (co-tenant noise rule).

  python scripts/exp_exact_phases.py --cores 32 --n-docs 50000 --rounds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n-docs", type=int, default=50000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from bench import ensure_pages_cache
    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)

    from pyspark.sql import functions as F

    from corpus_dedup_spark.operators.exact_dedup import (
        dedup_keepers, explode_units_arrow, run_exact_dedup_observed)
    from corpus_dedup_spark.plans.session import build_session

    parts = max(args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name="exp_exact", master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()

    def extract_only(p):
        explode_units_arrow(p).agg(F.count("*")).collect()

    def keepers_only(p):
        dedup_keepers(explode_units_arrow(p)).agg(F.count("*")).collect()

    def full(p):
        deduped, obs = run_exact_dedup_observed(p)
        deduped.count()
        _ = obs.get

    variants = {"extract": extract_only, "keepers": keepers_only, "full": full}
    full(pages.limit(4000))  # warm workers

    best = {k: float("inf") for k in variants}
    times = {k: [] for k in variants}
    for _ in range(args.rounds):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            p = pages.cache()
            p.count()
            t0 = time.time()
            fn(p)
            dt = time.time() - t0
            times[name].append(round(dt, 3))
            best[name] = min(best[name], dt)
    print(json.dumps({"n_docs": args.n_docs, "cores": args.cores, "parts": parts,
                      "best": {k: round(v, 3) for k, v in best.items()},
                      "all": times}))
    spark.stop()


if __name__ == "__main__":
    main()
