#!/usr/bin/env python
"""Alternating A/B/C experiment for the near-dup leg at the bench shape.

Co-tenant noise on this host swings identical jobs 6x, so variants MUST alternate
within one session (A,B,C,A,B,C,...) and report best-of-rounds each.

  A = r2 shape: features repartition(id)+persist, OPH
  B = no repartition (persist only), OPH
  C = no repartition, classic minhash scheme

Usage: python scripts/exp_neardup_ab.py --cores 32 --n-docs 50000 --rounds 3
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

    from corpus_dedup_spark.config import DedupConfig
    from corpus_dedup_spark.operators.minhash_lsh import near_dup_clusters
    from corpus_dedup_spark.plans.session import build_session

    parts = max(args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name="exp_ab", master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()

    cfg_oph = DedupConfig(jaccard_threshold=0.5)
    cfg_classic = DedupConfig(jaccard_threshold=0.5, minhash_scheme="classic")

    variants = {
        "A_repart_oph": (cfg_oph, True),
        "B_plain_oph": (cfg_oph, False),
        "C_plain_classic": (cfg_classic, False),
    }

    # warm UDF workers with both schemes
    near_dup_clusters(pages.limit(2000), cfg_oph).count()
    near_dup_clusters(pages.limit(2000), cfg_classic).count()

    best: dict[str, float] = {k: float("inf") for k in variants}
    times: dict[str, list] = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, (cfg, prepart) in variants.items():
            spark.catalog.clearCache()
            p = pages.cache()
            p.count()
            t0 = time.time()
            from corpus_dedup_spark.operators.connected_components import (
                attach_labels, connected_components)
            from pyspark.sql import functions as F
            verified, _f, _d = __import__(
                "corpus_dedup_spark.operators.minhash_lsh",
                fromlist=["near_dup_edges"]).near_dup_edges(
                    p, cfg, prepartition_features=prepart)
            labels = connected_components(
                verified.select(F.col("id_a").alias("src"),
                                F.col("id_b").alias("dst")))
            n = attach_labels(p.select("url"), labels, "url").count()
            dt = time.time() - t0
            times[name].append(round(dt, 3))
            best[name] = min(best[name], dt)
    print(json.dumps({"n_docs": args.n_docs, "cores": args.cores,
                      "best": {k: round(v, 3) for k, v in best.items()},
                      "all": times, "n_clustered": n}))
    spark.stop()


if __name__ == "__main__":
    main()
