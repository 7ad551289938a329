#!/usr/bin/env python
"""Exact-dedup wall INCLUDING the output write, for the same-host reference
comparison (scripts/bench_reference.py): the reference binary's wall includes
reading 200k input files and writing ~174k deduped files; our bench leg reads
cached parquet and materializes via count(). This measures the write-inclusive
wall (parquet to tmpfs) so BENCH.md can report both shapes.

  python scripts/exp_exact_write.py --cores 8 --n-docs 200000 --repeats 4
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=200000)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--out", default="/dev/shm/exact_out")
    args = ap.parse_args()

    from bench import ensure_pages_cache
    from corpus_dedup_spark.operators.exact_dedup import run_exact_dedup_observed
    from corpus_dedup_spark.plans.session import build_session

    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)
    parts = max(args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name="exact_write", master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()
    d, _ = run_exact_dedup_observed(pages.limit(4000))
    d.write.mode("overwrite").parquet(args.out)  # warm

    samples = []
    for _ in range(args.repeats):
        shutil.rmtree(args.out, ignore_errors=True)
        t0 = time.time()
        deduped, obs = run_exact_dedup_observed(pages)
        deduped.write.parquet(args.out)
        samples.append(round(time.time() - t0, 3))
    best = min(samples)
    print(json.dumps({"cores": args.cores, "n_docs": args.n_docs,
                      "samples": samples, "best": best,
                      "docs_per_sec_best": round(args.n_docs / best, 1),
                      "stats": obs.get}))
    spark.stop()


if __name__ == "__main__":
    main()
