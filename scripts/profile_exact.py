#!/usr/bin/env python
"""Stage breakdown of the exact-dedup leg (extract → keeper agg → reassembly).

Cumulative-stage timing, alternated best-of-N in one process (host is noisy):
  A = extraction only            (mapInArrow, no exchange; count())
  B = extraction + keeper agg    (one exchange + SortAggregate)
  C = full pipeline              (reassembly: second exchange + collect_list)

So keeper-agg cost ≈ B−A, reassembly cost ≈ C−B, at the clean-window minimum
of each. Usage: python scripts/profile_exact.py --cores 8 --n-docs 200000
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
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=200000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from bench import ensure_pages_cache
    from corpus_dedup_spark.operators.exact_dedup import (
        dedup_keepers, explode_units_arrow, reassemble, run_exact_dedup_observed)
    from corpus_dedup_spark.plans.session import build_session

    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)
    parts = max(args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name="profile_exact",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()

    # warm the Python workers
    warm = pages.limit(4000)
    run_exact_dedup_observed(warm)[0].count()

    best: dict[str, float] = {}

    def leg(name, thunk):
        t0 = time.time()
        thunk()
        dt = time.time() - t0
        best[name] = min(best.get(name, float("inf")), dt)

    for _ in range(args.repeats):
        spark.catalog.clearCache()
        p = pages.cache(); p.count()
        leg("A_extract", lambda: explode_units_arrow(p).count())
        leg("B_keepers", lambda: dedup_keepers(explode_units_arrow(p)).count())
        leg("C_full", lambda: reassemble(
            dedup_keepers(explode_units_arrow(p)).drop("n_occ")).count())

    out = {k: round(v, 3) for k, v in best.items()}
    out["keeper_agg_delta"] = round(best["B_keepers"] - best["A_extract"], 3)
    out["reassembly_delta"] = round(best["C_full"] - best["B_keepers"], 3)
    out["cores"] = args.cores
    out["n_docs"] = args.n_docs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
