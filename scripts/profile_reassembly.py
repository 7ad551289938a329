#!/usr/bin/env python
"""A/B reassembly variants for the exact-dedup leg (the biggest stage cost at
8 cores: ~2.5 s of a ~5.9 s pipeline — profile_exact.py).

Variants (each timed as the FULL pipeline, alternated best-of-N):
  v0 current: groupBy(id) + array_sort(collect_list(struct)) + transform-cast + array_join
  v1 getField: array_sort(collect_list(struct)).norm_unit cast once, concat_ws
  v2 sorted mapInArrow: repartition(id) + sortWithinPartitions + numpy concat kernel
  v3 string-typed units: cast norm_unit to string BEFORE the keeper agg (no per-
     element cast in the agg; shuffle bytes identical — UTF8String is the bytes)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def reassemble_v1(kept, id_col="url"):
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.array_sort(
                F.collect_list(F.struct("unit_idx", "norm_unit"))
            ).getField("norm_unit").cast("array<string>"),
        ).alias("dedup_text"),
        F.count("*").alias("n_units"),
    )


def reassemble_v2(kept, id_col="url"):
    import pyarrow as pa

    def fn(batches):
        # a doc's rows can span Arrow batch boundaries inside one sorted
        # partition: hold the last (possibly incomplete) doc back and prepend
        # its units to the next batch
        pend_id, pend_units = None, []

        def units_of(rb):
            buf = rb.column("norm_unit")
            return [u if u is not None else b"" for u in buf.to_pylist()]

        for rb in batches:
            ids = rb.column(id_col).to_pylist()
            if not ids:
                continue
            units = units_of(rb)
            if pend_id is not None and ids and ids[0] == pend_id:
                pass  # continues below via prepend
            out_ids, texts, counts = [], [], []
            i, n = 0, len(ids)
            while i < n:
                j = i
                while j < n and ids[j] == ids[i]:
                    j += 1
                group = units[i:j]
                if pend_id is not None and ids[i] == pend_id:
                    group = pend_units + group
                    pend_id, pend_units = None, []
                elif pend_id is not None:
                    out_ids.append(pend_id)
                    texts.append(b"\n".join(pend_units).decode("utf-8"))
                    counts.append(len(pend_units))
                    pend_id, pend_units = None, []
                if j == n:
                    pend_id, pend_units = ids[i], group
                else:
                    out_ids.append(ids[i])
                    texts.append(b"\n".join(group).decode("utf-8"))
                    counts.append(len(group))
                i = j
            if out_ids:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_ids), pa.array(texts),
                     pa.array(counts, type=pa.int64())],
                    names=[id_col, "dedup_text", "n_units"])
        if pend_id is not None:
            yield pa.RecordBatch.from_arrays(
                [pa.array([pend_id]),
                 pa.array([b"\n".join(pend_units).decode("utf-8")]),
                 pa.array([len(pend_units)], type=pa.int64())],
                names=[id_col, "dedup_text", "n_units"])

    shaped = kept.repartition(F.col(id_col)).sortWithinPartitions(id_col, "unit_idx")
    id_type = dict(kept.dtypes)[id_col]
    return shaped.mapInArrow(
        fn, schema=f"{id_col} {id_type}, dedup_text string, n_units long")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=200000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from bench import ensure_pages_cache
    from corpus_dedup_spark.operators.exact_dedup import (
        dedup_keepers, explode_units_arrow, reassemble)
    from corpus_dedup_spark.plans.session import build_session

    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)
    parts = max(args.cores, 8, min(3 * args.cores, args.n_docs // 8000))
    spark = build_session(app_name="profile_reassembly",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()
    warm = pages.limit(4000)

    def kept_of(p):
        return dedup_keepers(explode_units_arrow(p)).drop("n_occ")

    def kept_str(p):
        units = explode_units_arrow(p).withColumn(
            "norm_unit", F.col("norm_unit").cast("string"))
        return dedup_keepers(units).drop("n_occ")

    variants = {
        "v0_current": lambda p: reassemble(kept_of(p)),
        "v1_getfield": lambda p: reassemble_v1(kept_of(p)),
        "v2_maparrow": lambda p: reassemble_v2(kept_of(p)),
        "v3_string": lambda p: kept_str(p).groupBy("url").agg(
            F.concat_ws("\n", F.array_sort(
                F.collect_list(F.struct("unit_idx", "norm_unit"))
            ).getField("norm_unit")).alias("dedup_text"),
            F.count("*").alias("n_units")),
    }
    for fn in variants.values():
        fn(warm).count()  # warm workers + JIT

    best: dict[str, float] = {}
    counts: dict[str, int] = {}
    for _ in range(args.repeats):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            p = pages.cache(); p.count()
            t0 = time.time()
            counts[name] = fn(p).count()
            dt = time.time() - t0
            best[name] = min(best.get(name, float("inf")), dt)

    assert len(set(counts.values())) == 1, counts
    print(json.dumps({k: round(v, 3) for k, v in best.items()} |
                     {"cores": args.cores, "n_docs": args.n_docs,
                      "rows": counts["v0_current"]}))


if __name__ == "__main__":
    main()
