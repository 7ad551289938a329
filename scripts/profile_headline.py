#!/usr/bin/env python
"""Phase-level profiling of the two bench headline legs (guide §1: measure
first, noop-sink isolation). Replicates bench.py's setup (same session conf,
same cached+repartitioned input, same warm-up) and times each phase of the
exact-dedup and near-dup pipelines separately so optimization lands where the
time actually goes. Does NOT touch bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import ensure_pages_cache
    from corpus_dedup_spark.config import DedupConfig
    from corpus_dedup_spark.operators import exact_dedup as ed
    from corpus_dedup_spark.operators import minhash_lsh as ml
    from corpus_dedup_spark.operators.connected_components import (
        attach_labels, connected_components)
    from corpus_dedup_spark.plans.session import build_session

    sf = args.n_docs / 500_000
    pages_path, _ = ensure_pages_cache(sf, n_docs=args.n_docs)
    parts = max(args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name="profile_headline",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()

    cfg = DedupConfig(jaccard_threshold=0.5)

    # warm-up (same as bench)
    warm = pages.limit(4000).repartition(parts)
    ed.run_exact_dedup(warm)[2].collect()
    ml.near_dup_clusters(warm, cfg).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t: dict[str, float] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        dt = round(time.time() - t0, 3)
        t[name] = min(t.get(name, float("inf")), dt)

    for _ in range(args.repeats):
        spark.catalog.clearCache()
        p = pages.cache(); p.count()

        # ---- exact leg phases ----
        units = ed.explode_units_arrow(p)
        timed("exact.1_extract_units(noop)", lambda: noop(units))
        keepers = ed.dedup_keepers(ed.explode_units_arrow(p))
        timed("exact.2_keepers(noop)", lambda: noop(keepers))
        timed("exact.3_full_leg(count)",
              lambda: ed.reassemble(
                  ed.dedup_keepers(ed.explode_units_arrow(p)).drop("n_occ")
              ).count())

        # ---- near-dup leg phases ----
        feats = ml.doc_band_features(p, cfg)
        timed("near.1_features(noop)", lambda: noop(feats))
        fp = ml.doc_band_features(p, cfg).persist()
        timed("near.1b_features_persist(count)", lambda: fp.count())
        bands_df = fp.select("url", F.posexplode("bands").alias("band_id", "band_hash"))
        pairs, _dropped = ml.candidate_pairs(bands_df, cfg, "url")
        timed("near.2_candidate_pairs(count)", lambda: pairs.count())
        verified = ml.verify_jaccard(pairs, fp, cfg, "url").filter(
            F.col("jaccard") >= F.lit(cfg.jaccard_threshold))
        vp = verified.persist()
        timed("near.3_verify(count)", lambda: vp.count())
        labels = connected_components(
            vp.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
        timed("near.4_cc+attach(count)",
              lambda: attach_labels(p.select("url"), labels, "url").count())
        fp.unpersist(); vp.unpersist()

    print(json.dumps(t, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
