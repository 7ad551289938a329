#!/usr/bin/env python
"""Alternating A/B for exact-dedup session configs that need a fresh JVM
(shuffle codec / compression) plus keeper-agg key variants. One subprocess per
run, variants round-robin within a round (co-tenant noise rule), min per
variant across rounds.

  python scripts/exp_exact_conf.py --cores 8 --n-docs 200000 --rounds 3
  python scripts/exp_exact_conf.py --worker --variant zstd ...   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANT_CONF = {
    # session.py now defaults to zstd (landed from this experiment's round-1
    # results) — 'base' and 'lz4fast' pin the codec back to lz4 explicitly so
    # the pre-landing baseline stays reproducible
    "base": {"spark.io.compression.codec": "lz4"},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "nocomp": {"spark.shuffle.compress": "false",
               "spark.shuffle.spill.compress": "false"},
    "lenkey": {"spark.io.compression.codec": "lz4"},  # keeper agg key A/B at
    #                                                   the lz4 baseline
    "lz4fast": {"spark.io.compression.codec": "lz4",
                "spark.io.compression.lz4.blockSize": "512k"},
    # Arrow batch sizing for the extraction UDF (session default 100k rows)
    "arrow50k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    "arrow200k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "200000"},
    # combinations — the codec lever (transport) and the lenkey lever
    # (comparator) act on different stages, so they may stack
    "zstd_lenkey": {"spark.io.compression.codec": "zstd"},
    "nocomp_lenkey": {"spark.shuffle.compress": "false",
                      "spark.shuffle.spill.compress": "false"},
}


def _dedup_keepers_binkey(units, id_col="url"):
    """Keeper agg with the (id, unit_idx) pair packed into ONE binary value —
    order-preserving encoding utf8(id) || 0x00 || big-endian-u64(unit_idx)
    (unsigned-lex binary order == struct order; urls contain no NUL).

    MEASURED NEGATIVE (r5): the hope was HashAggregate, but Spark's
    HashAggregateExec requires every agg BUFFER field to be a fixed-width
    mutable UnsafeRow type; a min(binary) buffer is variable-length, so the
    planner still emits SortAggregate (verified on the executed plan) and the
    packing only adds concat/unhex work per row. Rows verified bit-identical
    to mainline; kept as documentation of the dead end."""
    from pyspark.sql import functions as F
    packed = F.expr(
        f"concat(encode({id_col}, 'UTF-8'), X'00', "
        "unhex(lpad(hex(unit_idx), 16, '0')))")
    agg = (
        units.withColumn("_h", F.xxhash64("norm_unit"))
        .withColumn("_l", F.octet_length("norm_unit"))
        .groupBy("_h", "_l", "norm_unit")
        .agg(F.min(packed).alias("_k"), F.count("*").alias("n_occ"))
    )
    klen = F.octet_length("_k")
    return agg.select(
        "norm_unit",
        F.decode(F.expr("substring(_k, 1, octet_length(_k) - 9)"),
                 "UTF-8").alias(id_col),
        F.expr("cast(conv(hex(substring(_k, -8, 8)), 16, 10) as bigint)")
         .alias("unit_idx"),
        "n_occ",
    )


def _dedup_keepers_lenkey(units, id_col="url"):
    from pyspark.sql import functions as F
    return (
        units.withColumn("_h", F.xxhash64("norm_unit"))
        .withColumn("_l", F.octet_length("norm_unit"))
        .groupBy("_h", "_l", "norm_unit")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("unit_idx"))).alias("_keeper"),
            F.count("*").alias("n_occ"),
        )
        .select(
            "norm_unit",
            F.col(f"_keeper.{id_col}").alias(id_col),
            F.col("_keeper.unit_idx").alias("unit_idx"),
            "n_occ",
        )
    )


def worker(variant: str, cores: int, n_docs: int, repeats: int) -> None:
    from bench import ensure_pages_cache
    pages_path, _ = ensure_pages_cache(0.1, n_docs=n_docs)

    from corpus_dedup_spark.operators import exact_dedup
    from corpus_dedup_spark.plans.session import build_session

    if variant.endswith("lenkey"):
        exact_dedup.dedup_keepers = _dedup_keepers_lenkey
    elif variant.endswith("binkey"):
        exact_dedup.dedup_keepers = _dedup_keepers_binkey

    parts = max(cores, 8, min(3 * cores, n_docs // 8000))
    spark = build_session(app_name=f"exp_conf_{variant}",
                          master=f"local[{cores}]", shuffle_partitions=parts,
                          extra_conf=VARIANT_CONF.get(variant, {}))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()
    d, o = exact_dedup.run_exact_dedup_observed(pages.limit(4000))
    d.count()
    _ = o.get  # warm workers + codegen
    samples = []
    for _i in range(repeats):
        spark.catalog.clearCache()
        p = pages.cache()
        p.count()
        t0 = time.time()
        deduped, obs = exact_dedup.run_exact_dedup_observed(p)
        n_out = deduped.count()
        stats = obs.get
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({"variant": variant, "cores": cores, "n_docs": n_docs,
                      "samples": samples, "best": min(samples),
                      "n_out": n_out, "unique": stats["unique_units"],
                      "dups": stats["duplicate_units"]}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=200000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--variants", default="base,zstd,nocomp,lenkey")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--variant", default="base")
    args = ap.parse_args()

    if args.worker:
        worker(args.variant, args.cores, args.n_docs, args.repeats)
        return

    variants = args.variants.split(",")
    best: dict[str, float] = {v: float("inf") for v in variants}
    alls: dict[str, list] = {v: [] for v in variants}
    for r in range(args.rounds):
        order = variants if r % 2 == 0 else variants[::-1]
        for v in order:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--variant", v, "--cores", str(args.cores),
                 "--n-docs", str(args.n_docs), "--repeats", str(args.repeats)],
                capture_output=True, text=True, cwd=REPO)
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if not lines:
                print(f"variant {v} round {r} FAILED:\n{out.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            rec = json.loads(lines[-1])
            alls[v].append(rec["samples"])
            best[v] = min(best[v], rec["best"])
            print(json.dumps({"round": r, **rec}))
    print(json.dumps({"best": best, "all": alls,
                      "docs_per_sec_best": {
                          v: round(args.n_docs / b, 1)
                          for v, b in best.items() if b < float("inf")}}))


if __name__ == "__main__":
    main()
