#!/usr/bin/env python
"""Byte-identical END-TO-END output parity vs the actual reference binary.

The strongest possible parity evidence: run the reference C binary
(single-threaded, so its first-wins keeper is deterministic) and this engine
on the identical corpus, and compare every output document byte-for-byte.

Alignment of keeper semantics: the engine's keeper is min(url, unit_idx);
the reference's is first-occurrence in file-processing order, which at
DEDUP_THREADS=1 is its readdir() order (src/dedup.c — no sort). readdir
order is fs-defined, so the dump discovers it: create the name set, read
back the directory's actual order, and write the rank-k url's text into the
k-th name of that order — the reference's own readdir of the unchanged
directory then processes documents in exactly the engine's url order.

Output format parity (src/dedup.c:341-351, 660-700): kept normalized units
joined by '\n', no trailing newline; documents whose every unit was a
duplicate are skipped (files_empty). The engine's reassemble() produces the
identical contract (dedup_text, absent row for empty docs).

  python scripts/verify_reference_output.py --n-docs 200000
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

from pyspark.sql import functions as F  # noqa: E402  (after sys.path insert)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("REF_VERIFY_DIR", "/dev/shm/refverify")


def dump_rank_named(n_docs: int, out: str) -> tuple[list[str], list[str]]:
    """One file per doc; returns (names in readdir order, urls in rank order),
    aligned index-by-index: the k-th readdir name holds the rank-k url's text."""
    import pyarrow.parquet as pq

    from bench import ensure_pages_cache
    pages_path, _ = ensure_pages_cache(0.1, n_docs=n_docs)
    urls, texts = [], []
    for f in sorted(glob.glob(os.path.join(pages_path, "*.parquet"))):
        t = pq.read_table(f, columns=["url", "text"])
        urls.extend(t.column("url").to_pylist())
        texts.extend(t.column("text").to_pylist())
    order = sorted(range(len(urls)), key=lambda i: urls[i])
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    # readdir order is fs-defined (NOT insertion order here), so align by
    # discovery: create the full name set first, read back the directory's
    # actual readdir order, then write url-rank k's text into the k-th name
    # of that order. The reference's own readdir of the (unchanged) dir sees
    # the same sequence, so its processing order == url rank order.
    names = [f"doc_{i:07d}.txt" for i in range(len(order))]
    for name in names:
        open(os.path.join(out, name), "wb").close()
    scan1 = [e.name for e in os.scandir(out)]
    assert sorted(scan1) == names
    ranked_urls = []
    for name, i in zip(scan1, order):
        with open(os.path.join(out, name), "wb") as fh:
            fh.write(texts[i].encode("utf-8"))
        ranked_urls.append(urls[i])
    scan2 = [e.name for e in os.scandir(out)]
    assert scan2 == scan1, "readdir order changed after content writes"
    return scan1, ranked_urls


def build_reference() -> str:
    from scripts.bench_reference import build, patch_tree
    os.makedirs(WORK, exist_ok=True)
    src = os.path.join(WORK, "src")
    patch_tree("/root/reference/src", src)
    return build(src, WORK)["release_c"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=200000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--mode", default="sentence",
                    choices=["sentence", "line", "paragraph", "document"])
    ap.add_argument("--max-length", type=int, default=0)
    ap.add_argument("--dups", action="store_true",
                    help="also compare the --write-duplicates sink (multiset "
                         "of duplicate-occurrence norm units)")
    args = ap.parse_args()

    corpus = os.path.join(WORK, "corpus")
    refout = os.path.join(WORK, "out")
    binary = build_reference()
    scan_names, ranked_urls = dump_rank_named(args.n_docs, corpus)
    url_of_name = dict(zip(scan_names, ranked_urls))

    cmd = [binary, corpus, refout, "--dedup-mode", args.mode]
    if args.max_length:
        cmd += ["--max-length", str(args.max_length)]
    if args.dups:
        cmd += ["--write-duplicates"]
    shutil.rmtree(refout, ignore_errors=True)
    r = subprocess.run(cmd, env={**os.environ, "DEDUP_THREADS": "1"},
                       capture_output=True, text=True, check=True)
    summary = [ln for ln in r.stdout.splitlines() if "Dedup summary" in ln][-1]

    ref_docs: dict[str, bytes] = {}
    for name in os.listdir(refout):
        if not name.startswith("doc_"):
            continue  # duplicates.txt etc.
        with open(os.path.join(refout, name), "rb") as fh:
            ref_docs[url_of_name[name]] = fh.read()

    from bench import ensure_pages_cache
    from corpus_dedup_spark.operators.exact_dedup import run_exact_dedup_observed
    from corpus_dedup_spark.plans.session import build_session
    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)
    spark = build_session(app_name="verify_ref_output",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=max(8, args.cores))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    deduped, obs = run_exact_dedup_observed(pages, mode=args.mode,
                                            max_length=args.max_length)
    ours = {row["url"]: row["dedup_text"].encode("utf-8")
            for row in deduped.collect()}
    stats = obs.get

    dups_equal = None
    if args.dups:
        from collections import Counter

        from corpus_dedup_spark.operators.exact_dedup import (
            explode_units_arrow, mark_duplicates)
        with open(os.path.join(refout, "duplicates.txt"), "rb") as fh:
            ref_dups = Counter(fh.read().splitlines())
        units = explode_units_arrow(pages, mode=args.mode,
                                    max_length=args.max_length)
        rows = (mark_duplicates(units).filter(F.col("is_dup"))
                .select("norm_unit").collect())
        eng_dups = Counter(bytes(row["norm_unit"]) for row in rows)
        dups_equal = ref_dups == eng_dups
    spark.stop()

    only_ref = sorted(set(ref_docs) - set(ours))
    only_ours = sorted(set(ours) - set(ref_docs))
    diff = [u for u in ref_docs if u in ours and ref_docs[u] != ours[u]]
    print(json.dumps({
        "n_docs": args.n_docs,
        "mode": args.mode,
        "max_length": args.max_length,
        "duplicates_sink_equal": dups_equal,
        "ref_written": len(ref_docs),
        "engine_written": len(ours),
        "only_ref": len(only_ref),
        "only_engine": len(only_ours),
        "content_mismatches": len(diff),
        "byte_identical": not (only_ref or only_ours or diff),
        "engine_stats": stats,
        "ref_summary": summary.split("Dedup summary")[-1].strip(),
        "first_mismatch": (diff[0] if diff else
                           only_ref[0] if only_ref else
                           only_ours[0] if only_ours else None),
    }))


if __name__ == "__main__":
    main()
