#!/usr/bin/env python
"""Host memory-bus calibration for the N→4N scaling protocol.

Runs the same memory-heavy kernel (shuffle-profile work: streaming u64
transforms + a sort, ~6x data size of traffic per rep) in N concurrent
PROCESSES (no Python GIL, no Spark — pure hardware) and reports aggregate
throughput at each level. If the host itself cannot scale memory-bound work
NxM→4xM, a single-box Spark run cannot either: the engine's measured scaling
efficiency should be read against this hardware ceiling, not against 1.0.
A real 4x-executor cluster multiplies memory channels with nodes.

Usage: python scripts/bus_probe.py [--levels 1,2,8] [--mb 256] [--reps 3]
Prints one JSON line per level plus a summary.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _work(mb: int, reps: int, q) -> None:
    n = mb * 1024 * 1024 // 8
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 62, n, dtype=np.uint64)
    # warm (first-touch pages)
    b = a * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
    t0 = time.time()
    for _ in range(reps):
        with np.errstate(over="ignore"):
            b = a * np.uint64(0x100000001B3) + np.uint64(7)
            b ^= b >> np.uint64(29)
        c = np.sort(b)
        s = int(c[0])
    dt = time.time() - t0
    q.put(dt)


def run_level(procs: int, mb: int, reps: int) -> dict:
    q = mp.Queue()
    ps = [mp.Process(target=_work, args=(mb, reps, q)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    times = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    agg = procs * mb * reps / wall  # MB of kernel input processed per second
    return {"procs": procs, "wall_s": round(wall, 3),
            "agg_mb_per_s": round(agg, 1),
            "per_proc_mb_per_s": round(agg / procs, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,8")
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    best: dict[int, dict] = {}
    for r in range(args.rounds):
        for lv in levels:
            res = run_level(lv, args.mb, args.reps)
            res["round"] = r
            print(json.dumps(res))
            if lv not in best or res["agg_mb_per_s"] > best[lv]["agg_mb_per_s"]:
                best[lv] = res
    summary = {"best": {str(k): v["agg_mb_per_s"] for k, v in best.items()}}
    ks = sorted(best)
    for lo, hi in zip(ks, ks[1:]):
        eff = (best[hi]["agg_mb_per_s"] / best[lo]["agg_mb_per_s"]) / (hi / lo)
        summary[f"hw_eff_{lo}to{hi}"] = round(eff, 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
