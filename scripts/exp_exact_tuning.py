#!/usr/bin/env python
"""Alternating tuning experiment for the full exact-dedup pipeline: shuffle
partition counts and AQE on/off at the bench shape (one session per conf is
required for AQE, so this alternates SESSIONS in rounds — slower but honest).

  python scripts/exp_exact_tuning.py --cores 32 --n-docs 50000 --rounds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_once(cores: int, parts: int, aqe: bool, pages_path: str) -> float:
    from corpus_dedup_spark.operators.exact_dedup import run_exact_dedup_observed
    from corpus_dedup_spark.plans.session import build_session

    spark = build_session(
        app_name=f"exp_tune_{parts}_{aqe}", master=f"local[{cores}]",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": str(aqe).lower()})
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()
    d, o = run_exact_dedup_observed(pages.limit(4000))
    d.count()
    _ = o.get  # warm
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        p = pages.cache()
        p.count()
        t0 = time.time()
        deduped, obs = run_exact_dedup_observed(p)
        deduped.count()
        _ = obs.get
        best = min(best, time.time() - t0)
    spark.stop()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n-docs", type=int, default=50000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from bench import ensure_pages_cache
    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)

    variants = {
        "p32_aqe": (32, True),
        "p64_aqe": (64, True),
        "p96_aqe": (96, True),
        "p32_noaqe": (32, False),
        "p64_noaqe": (64, False),
    }
    best = {k: float("inf") for k in variants}
    times = {k: [] for k in variants}
    for _ in range(args.rounds):
        for name, (parts, aqe) in variants.items():
            dt = run_once(args.cores, parts, aqe, pages_path)
            times[name].append(round(dt, 3))
            best[name] = min(best[name], dt)
    print(json.dumps({"best": {k: round(v, 3) for k, v in best.items()},
                      "all": times}))


if __name__ == "__main__":
    main()
