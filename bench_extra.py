#!/usr/bin/env python
"""Round-6 optimization harness: per-query timing + plan capture.

bench.py is FROZEN for measurement; this file exists so the optimization round
can isolate individual queries (guide §1.4) without touching the frozen bench.

- Replicates bench.py's query methodology exactly: same session conf, catalog
  clearCache before each sample, time `.count()`, best of --repeats interleaved.
- `--noop` times a full-materialization noop sink instead of count() (guide
  §1.4: count() lets the optimizer prune; noop computes every column).
- `--explain DIR` writes `<query>.txt` with the `.explain("formatted")` output.
- `--headline` also times the two bench headline legs (exact dedup, near-dup).

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 --queries embedding_top1
  python bench_extra.py --explain plans/r06 --suffix _before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Deliberate copies of bench.py's q_names tuple and (below) its partition
# sizing formula: bench.py is FROZEN for measurement and keeps both as
# main()-local values, so they cannot be imported. Re-sync by hand if a
# future (unfrozen) round changes them.
BENCH_QUERIES = (
    "token_jaccard_pairs", "cc_bucket_clusters", "substring_search",
    "embedding_top1", "event_hourly", "sentence_dedup_pages",
    "boilerplate_bigrams", "url_canonical", "exact_substr_spans",
    "sequence_pack", "asof_purchase", "unigram_lm",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf1.0"))
    ap.add_argument("--queries", nargs="*", default=None,
                    help="subset of query names (default: the bench set)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="noop-sink full materialization instead of count()")
    ap.add_argument("--explain", default=None,
                    help="directory to write <query><suffix>.txt explain dumps")
    ap.add_argument("--suffix", default="",
                    help="filename suffix for explain dumps (_before/_after)")
    ap.add_argument("--search", action="store_true",
                    help="also time search_index_build + substring_search_probe3")
    args = ap.parse_args()

    base = os.path.basename(args.sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1

    from corpus_dedup_spark.plans.queries import QUERIES
    from corpus_dedup_spark.plans.session import build_session

    n_docs_hint = max(1000, int(500_000 * sf))
    parts = max(args.cores, 8, min(3 * args.cores, n_docs_hint // 8000))
    spark = build_session(app_name=f"bench_extra_c{args.cores}",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or list(BENCH_QUERIES)
    timings: dict[str, float] = {}

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        import contextlib
        import io
        for qname in names:
            df = QUERIES[qname](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain,
                                   f"{qname}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())

    def run_once(qname: str) -> float:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"q:{qname}")
        t0 = time.time()
        df = QUERIES[qname](spark, args.sf_dir)
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return round(time.time() - t0, 3)

    for _ in range(args.repeats):
        for qname in names:
            t = run_once(qname)
            timings[qname] = min(timings.get(qname, float("inf")), t)

    if args.search:
        from pyspark.sql import functions as F

        from corpus_dedup_spark import kernel
        from corpus_dedup_spark.operators.search import (build_fingerprint_index,
                                                         search)
        from corpus_dedup_spark.plans.queries import SEARCH_QUERY

        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("url"), "text")
        qlen = len(kernel.utf8_decode_buffer(SEARCH_QUERY.encode()))
        for _ in range(args.repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription("q:search_index_build")
            t0 = time.time()
            sidx = build_fingerprint_index(docs, window=qlen).persist()
            sidx.count()
            t = round(time.time() - t0, 3)
            timings["search_index_build"] = min(
                timings.get("search_index_build", float("inf")), t)
            spark.sparkContext.setJobDescription("q:substring_search_probe3")
            t0 = time.time()
            for probe_q in (SEARCH_QUERY, "partition", "zz-no-hit-zz"[:qlen]):
                search(sidx, docs, probe_q.ljust(qlen)[:qlen]).count()
            t = round(time.time() - t0, 3)
            timings["substring_search_probe3"] = min(
                timings.get("substring_search_probe3", float("inf")), t)
            sidx.unpersist()

    print(json.dumps({"sf": sf, "mode": "noop" if args.noop else "count",
                      "repeats": args.repeats, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
