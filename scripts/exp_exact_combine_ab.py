#!/usr/bin/env python
"""Alternating A/B: run_exact_dedup_observed with/without the fused
partition-local combine, bench shape. Best-of-rounds each."""
from __future__ import annotations
import argparse, json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n-docs", type=int, default=50000)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    from bench import ensure_pages_cache
    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)
    from corpus_dedup_spark.operators.exact_dedup import run_exact_dedup_observed
    from corpus_dedup_spark.plans.session import build_session
    parts = max(args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name="exp_comb", master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()
    for lc in (False, True):  # warm both paths
        d, o = run_exact_dedup_observed(pages.limit(4000), local_combine=lc)
        d.count(); _ = o.get
    best = {"plain": float("inf"), "combined": float("inf")}
    times = {"plain": [], "combined": []}
    for _ in range(args.rounds):
        for name, lc in (("plain", False), ("combined", True)):
            spark.catalog.clearCache()
            p = pages.cache(); p.count()
            t0 = time.time()
            deduped, obs = run_exact_dedup_observed(p, local_combine=lc)
            deduped.count(); _ = obs.get
            dt = time.time() - t0
            times[name].append(round(dt, 3))
            best[name] = min(best[name], dt)
    print(json.dumps({"best": {k: round(v, 3) for k, v in best.items()},
                      "all": times}))
    spark.stop()

if __name__ == "__main__":
    main()
