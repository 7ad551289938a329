#!/usr/bin/env python
"""Build and run the REFERENCE C binary on the exact bench corpus, same host,
same thread count — the apples-to-apples anchor for BENCH.md.

Earlier rounds compared our engine against the reference README's published
88,806 docs/s, which was measured on UNSTATED hardware and a corpus with
~4.9 KB/doc (BASELINE.md) — 3.4x larger documents than the bench corpus.
This script removes both unknowns: it builds the reference from
/root/reference (out-of-tree, in a temp dir; no reference code enters this
repo), dumps the identical 200k-doc bench corpus as one file per document
(the reference's input model, src/io_utils.c), and times full dedup runs
at a given DEDUP_THREADS on this machine.

Build notes (documented, reproducible):
- the sandbox has gcc 12, which predates several C23 constructs the
  reference uses (constexpr, digit separators, auto, [[nodiscard]],
  static_assert on non-ICE constants). The patch step below mechanically
  lowers them to the exact gnu2x equivalents (constexpr -> static const,
  1'000 -> 1000, [[maybe_unused]] -> __attribute__((unused)), asserts on
  now-non-constant values dropped). No semantic change.
- `corpus_dedup_c` is the reference's own `make release_c` configuration
  (all *_USE_ASM=0). `corpus_dedup_asm` additionally assembles the five
  gcc-`-x assembler-with-cpp` fast paths (hash worker + radix passes);
  wavesort.asm requires NASM, which the sandbox lacks, so WAVESORT_USE_ASM
  stays 0 (the reference's scalar wave-sort fallback runs instead).
- both are -O3 -march=native -flto, the reference's release flags
  (CMakeLists.txt:111-121).

Protocol: variants alternate within each round (co-tenant noise rule,
BENCH.md), best-of across rounds. The reference's unique/duplicate sentence
counts are asserted against the engine's (4,063,632 / 1,545,333 on the
200k-doc corpus) — an independent end-to-end parity check of the kernel.

  python scripts/bench_reference.py --threads 8 --rounds 5
  python scripts/bench_reference.py --threads 8 32 --rounds 3
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_SRC = "/root/reference/src"
WORK = os.environ.get("REF_BENCH_DIR", "/dev/shm/refbench")

CFLAGS = ("-O3 -march=native -fomit-frame-pointer -flto -DNDEBUG -std=gnu2x "
          "-Dauto=__auto_type -include stdbool.h").split()
ASM_FILES = ["hash_worker", "radix_histogram_length", "radix_scatter_length",
             "radix_histogram_block_id", "radix_scatter_block_id"]


def patch_tree(src: str, dst: str) -> None:
    """Copy the reference source and lower its C23-only constructs to gnu2x."""
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    for path in glob.glob(os.path.join(dst, "**", "*.[ch]"), recursive=True):
        with open(path) as f:
            t = f.read()
        t = re.sub(r"(\d)'(\d)", r"\1\2", t)
        t = re.sub(r"(\d)'(\d)", r"\1\2", t)  # 4'294'967'296 needs two passes
        t = t.replace("static constexpr", "static const")
        t = re.sub(r"\bconstexpr\b", "static const", t)
        t = t.replace("[[nodiscard]]", "")
        t = t.replace("[[maybe_unused]]", "__attribute__((unused))")
        t = re.sub(r"\bnullptr\b", "((void*)0)", t)
        t = re.sub(r"static_assert\s*\([^;]*?\);", "", t, flags=re.S)
        with open(path, "w") as f:
            f.write(t)


def build(src_dir: str, out_dir: str) -> dict[str, str]:
    inc = os.path.join(src_dir, "include")
    cs = sorted(glob.glob(os.path.join(src_dir, "*.c")))
    bins = {}
    noasm = [f"-D{d}=0" for d in ("WAVESORT_USE_ASM", "HASH_WORKER_USE_ASM",
                                  "RADIX_SORT_USE_ASM", "RADIX_SORT_USE_ASM_IMPL")]
    c_bin = os.path.join(out_dir, "corpus_dedup_c")
    subprocess.run(["gcc", *CFLAGS, *noasm, f"-I{inc}", *cs,
                    "-o", c_bin, "-lpthread"], check=True, capture_output=True)
    bins["release_c"] = c_bin

    objs = []
    for f in ASM_FILES:
        obj = os.path.join(out_dir, f + ".o")
        r = subprocess.run(["gcc", "-x", "assembler-with-cpp", "-c",
                            "-DHASH_UNROLL=8", "-DHASH_PREFETCH_DISTANCE=256",
                            f"-I{inc}", os.path.join(src_dir, "asm", f + ".asm"),
                            "-o", obj], capture_output=True)
        if r.returncode != 0:
            print(f"asm {f} failed; release_c only", file=sys.stderr)
            return bins
        objs.append(obj)
    asm_defs = ["-DWAVESORT_USE_ASM=0", "-DHASH_WORKER_USE_ASM=1",
                "-DRADIX_SORT_USE_ASM=1", "-DRADIX_SORT_USE_ASM_IMPL=1",
                "-DHASH_PREFETCH_DISTANCE=256", "-DHASH_UNROLL=8"]
    asm_bin = os.path.join(out_dir, "corpus_dedup_asm")
    subprocess.run(["gcc", *CFLAGS, *asm_defs, f"-I{inc}", *cs, *objs,
                    "-o", asm_bin, "-lpthread"], check=True, capture_output=True)
    bins["release_asm_no_wavesort"] = asm_bin
    return bins


def dump_corpus(n_docs: int, out: str) -> int:
    """One file per document, the reference's input model, in tmpfs."""
    import pyarrow.parquet as pq

    from bench import ensure_pages_cache
    pages_path, _ = ensure_pages_cache(0.1, n_docs=n_docs)
    if os.path.exists(out) and len(os.listdir(out)) == n_docs:
        return n_docs
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    i = 0
    for f in sorted(glob.glob(os.path.join(pages_path, "*.parquet"))):
        for text in pq.read_table(f, columns=["text"]).column("text").to_pylist():
            with open(os.path.join(out, f"doc_{i:07d}.txt"), "wb") as fh:
                fh.write(text.encode("utf-8"))
            i += 1
    return i


def run_once(binary: str, corpus: str, threads: int) -> tuple[float, str]:
    outdir = os.path.join(WORK, "out")
    shutil.rmtree(outdir, ignore_errors=True)
    t0 = time.time()
    r = subprocess.run([binary, corpus, outdir],
                       env={**os.environ, "DEDUP_THREADS": str(threads)},
                       capture_output=True, text=True, check=True)
    wall = time.time() - t0
    summary = [ln for ln in r.stdout.splitlines() if "Dedup summary" in ln]
    return wall, summary[-1] if summary else ""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, nargs="+", default=[8])
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--n-docs", type=int, default=200000)
    args = ap.parse_args()

    os.makedirs(WORK, exist_ok=True)
    src = os.path.join(WORK, "src")
    patch_tree(REF_SRC, src)
    bins = build(src, WORK)
    corpus = os.path.join(WORK, "corpus")
    n = dump_corpus(args.n_docs, corpus)

    results: dict[str, dict[str, float]] = {}
    # None until a summary line is actually parsed: a crashed/odd-format run
    # must not report parity vacuously true
    parity_ok: bool | None = None
    for rnd in range(args.rounds):
        for t in args.threads:
            for name, b in bins.items():
                wall, summary = run_once(b, corpus, t)
                key = f"{name}@t{t}"
                results.setdefault(key, {"best": float("inf"), "all": []})
                results[key]["all"].append(round(wall, 2))
                results[key]["best"] = min(results[key]["best"], round(wall, 2))
                if args.n_docs == 200000:
                    m = re.search(
                        r"unique sentences (\d+), duplicate sentences (\d+)",
                        summary)
                    if not m:
                        parity_ok = False  # unparseable run is NOT parity
                    else:
                        ok = (m.group(1), m.group(2)) == ("4063632", "1545333")
                        parity_ok = ok if parity_ok is None else (parity_ok and ok)
                print(json.dumps({"round": rnd, "bin": name, "threads": t,
                                  "wall": round(wall, 2),
                                  "docs_per_sec": round(n / wall, 1)}))
    print(json.dumps({
        "n_docs": n,
        "best": {k: v["best"] for k, v in results.items()},
        "docs_per_sec_best": {k: round(n / v["best"], 1)
                              for k, v in results.items()},
        "all": {k: v["all"] for k, v in results.items()},
        "unique_dup_parity_with_engine": parity_ok,
    }))


if __name__ == "__main__":
    main()
