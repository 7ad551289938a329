#!/usr/bin/env python
"""Paired same-window engine-vs-reference comparison at equal threads.

The round-5 same-host anchor (scripts/bench_reference.py + a manually
interleaved engine leg) was taken during a co-tenant storm; a later calm
window showed the reference binary ~1.5× faster than its stormy best, so the
cross-engine RATIO is not storm-immune after all — the two sides must be
paired per round, not compared across sessions. This harness alternates, in
EVERY round: reference `release_c` (threads=T, tmpfs corpus, its native
one-file-per-doc input) and the engine's exact-dedup compute+count job
(local[T], same documents), then reports per-round paired ratios and the
median ratio — the storm lands on both legs of a pair or neither.

  python scripts/bench_head_to_head.py --threads 8 --rounds 3
  (expects scripts/bench_reference.py to have been run once: it leaves the
   built binaries and the dumped corpus under $REF_BENCH_DIR)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = os.environ.get("REF_BENCH_DIR", "/dev/shm/refbench")


def run_reference(binary: str, corpus: str, threads: int) -> float:
    env = dict(os.environ, DEDUP_THREADS=str(threads))
    out_dir = os.path.join(WORK, "out_h2h")
    subprocess.run(["rm", "-rf", out_dir], check=True)
    t0 = time.time()
    subprocess.run([binary, corpus, out_dir], env=env, check=True,
                   capture_output=True, text=True)
    return time.time() - t0


def engine_worker(threads: int, n_docs: int, repeats: int,
                  write_output: bool = False) -> None:
    from bench import ensure_pages_cache
    from corpus_dedup_spark.operators.exact_dedup import \
        run_exact_dedup_observed
    from corpus_dedup_spark.plans.session import build_session

    pages_path, _ = ensure_pages_cache(0.1, n_docs=n_docs)
    parts = max(threads, 8, min(3 * threads, n_docs // 8000))
    spark = build_session(app_name="h2h", master=f"local[{threads}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(WORK, "engine_out_h2h")
    pages = spark.read.parquet(pages_path).repartition(parts).cache()
    pages.count()
    d, o = run_exact_dedup_observed(pages.limit(4000))
    d.count(); _ = o.get  # warm
    best = float("inf")
    for _i in range(repeats):
        spark.catalog.clearCache()
        p = pages.cache(); p.count()
        t0 = time.time()
        deduped, obs = run_exact_dedup_observed(p)
        if write_output:
            # the reference's wall always includes writing its output files;
            # this leg writes the deduped table to the SAME tmpfs
            deduped.write.mode("overwrite").parquet(out_dir)
        else:
            deduped.count()
        _ = obs.get
        best = min(best, time.time() - t0)
    print(json.dumps({"engine_wall": round(best, 3)}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n-docs", type=int, default=200000)
    ap.add_argument("--engine-repeats", type=int, default=2)
    ap.add_argument("--engine-worker", action="store_true")
    ap.add_argument("--engine-write", action="store_true",
                    help="engine leg writes its deduped output to tmpfs "
                         "(apples-to-apples with the reference's wall, which "
                         "always includes writing its output files)")
    args = ap.parse_args()
    if args.engine_worker:
        engine_worker(args.threads, args.n_docs, args.engine_repeats,
                      write_output=args.engine_write)
        return

    binary = os.path.join(WORK, "corpus_dedup_c")
    if not os.path.exists(binary):
        cands = [os.path.join(WORK, f) for f in os.listdir(WORK)
                 if f.startswith("corpus_dedup")] if os.path.isdir(WORK) else []
        if not cands:
            sys.exit("run scripts/bench_reference.py first (builds binaries)")
        binary = sorted(cands)[0]
    corpus = os.path.join(WORK, "corpus")

    pairs = []
    for rnd in range(args.rounds):
        order = ("ref", "eng") if rnd % 2 == 0 else ("eng", "ref")
        walls = {}
        for leg in order:
            if leg == "ref":
                walls["ref"] = run_reference(binary, corpus, args.threads)
            else:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--engine-worker", "--threads", str(args.threads),
                     "--n-docs", str(args.n_docs),
                     "--engine-repeats", str(args.engine_repeats)]
                    + (["--engine-write"] if args.engine_write else []),
                    capture_output=True, text=True, cwd=REPO, check=True)
                line = [ln for ln in out.stdout.splitlines()
                        if ln.startswith("{")][-1]
                walls["eng"] = json.loads(line)["engine_wall"]
        ratio = walls["ref"] / walls["eng"]
        pairs.append({"round": rnd, "ref_wall": round(walls["ref"], 2),
                      "engine_wall": round(walls["eng"], 2),
                      "ratio_ref_over_engine": round(ratio, 3)})
        print(json.dumps(pairs[-1]))
    print(json.dumps({
        "threads": args.threads, "n_docs": args.n_docs,
        "engine_write": args.engine_write,
        "median_paired_ratio": round(statistics.median(
            p["ratio_ref_over_engine"] for p in pairs), 3),
        "best_ref": min(p["ref_wall"] for p in pairs),
        "best_engine": min(p["engine_wall"] for p in pairs),
        "pairs": pairs,
    }))


if __name__ == "__main__":
    main()
