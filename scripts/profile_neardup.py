#!/usr/bin/env python
"""Phase breakdown of the near-dup leg (features / candidates / verify / CC) at a
given core count — identifies which phase limits N→4N scaling. Usage:

  python scripts/profile_neardup.py --cores 8 --n-docs 200000 [--parts 24]
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
    ap.add_argument("--parts", type=int, default=None,
                    help="input+shuffle partitions (default max(cores,8))")
    args = ap.parse_args()

    from bench import ensure_pages_cache
    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)

    from pyspark.sql import functions as F

    from corpus_dedup_spark.config import DedupConfig
    from corpus_dedup_spark.operators.connected_components import (
        attach_labels, connected_components)
    from corpus_dedup_spark.operators.minhash_lsh import (candidate_pairs,
                                                          doc_band_features,
                                                          verify_jaccard)
    from corpus_dedup_spark.plans.session import build_session

    parts = args.parts or max(
        args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name=f"prof_c{args.cores}",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    n = pages.count()
    cfg = DedupConfig(jaccard_threshold=0.5)

    # warm UDF workers
    doc_band_features(pages.limit(2000), cfg).count()

    t = {}
    t0 = time.time()
    features = doc_band_features(pages, cfg).persist()
    features.count()
    t["features"] = round(time.time() - t0, 3)

    t0 = time.time()
    bands_df = features.select(
        "url", F.posexplode("bands").alias("band_id", "band_hash"))
    pairs, dropped = candidate_pairs(bands_df, cfg)
    pairs = pairs.persist()
    n_pairs = pairs.count()
    t["candidates"] = round(time.time() - t0, 3)

    t0 = time.time()
    verified = verify_jaccard(pairs, features, cfg).filter(
        F.col("jaccard") >= F.lit(cfg.jaccard_threshold)).persist()
    n_ver = verified.count()
    t["verify"] = round(time.time() - t0, 3)

    t0 = time.time()
    labels = connected_components(
        verified.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    labels = labels.persist()
    labels.count()
    t["cc"] = round(time.time() - t0, 3)

    t0 = time.time()
    out = attach_labels(pages.select("url"), labels, "url")
    n_clustered = out.count()
    t["attach"] = round(time.time() - t0, 3)

    print(json.dumps({
        "cores": args.cores, "parts": parts, "n_docs": n,
        "n_pairs": n_pairs, "n_verified": n_ver, "n_clustered": n_clustered,
        "phases": t, "total": round(sum(t.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
