#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.md sandbox protocol): run the identical
headline dedup job at local[8] and local[32] on the identical input and report
throughput at both plus scaling efficiency = (T8_wall / T32_wall) / 4.

Each run is a fresh `python bench.py --cores N --skip-queries` subprocess (fresh JVM —
no warm-cache bleed between parallelism levels). Writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, sf_dir: str, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cores", str(cores),
         "--sf-dir", sf_dir, "--skip-queries", "--n-docs", str(n_docs)],
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # the corpus must be large enough that 32 cores have real work per task —
    # otherwise fixed scheduling/worker costs dominate and efficiency is meaningless
    n_docs = int(os.environ.get("SCALING_N_DOCS", "200000"))
    results = {}
    for cores in (8, 32):
        results[cores] = run(cores, sf_dir, n_docs)
        print(json.dumps(results[cores]))

    t8, t32 = results[8]["value"], results[32]["value"]
    d8, d32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = (d32 / d8) / 4.0
    lines = [
        "# BENCH — throughput + N→4N scaling evidence",
        "",
        "Sandbox protocol (BASELINE.md): no multi-executor cluster exists here, so the",
        "N→4N executor criterion is evidenced by the identical job on identical input",
        "at local[8] vs local[32] (4× cores), fresh JVM per run.",
        "",
        f"Input: deterministic synthetic pages table, {results[8]['n_docs']} docs "
        f"(sf={results[8]['sf']}), seed 42.",
        "Headline job: exact sentence dedup (extract → normalize → global first-wins",
        "window → reassembly) + near-dup pipeline (MinHash → LSH bands → candidate",
        "join → exact-Jaccard verify → connected components).",
        "",
        "| cores | wall (s) | docs/s | exact-dedup docs/s | exact-pair recall |",
        "|---|---|---|---|---|",
        f"| 8 | {t8} | {d8} | {results[8]['docs_per_sec_exact']} | "
        f"{results[8]['exact_pair_recall']} |",
        f"| 32 | {t32} | {d32} | {results[32]['docs_per_sec_exact']} | "
        f"{results[32]['exact_pair_recall']} |",
        "",
        f"**Scaling efficiency (8→32 cores) = ({d32} / {d8}) / 4 = {eff:.3f}** "
        f"(target ≥ 0.8: {'PASS' if eff >= 0.8 else 'MISS'})",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(results[8]),
        json.dumps(results[32]),
        "```",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"scaling efficiency: {eff:.3f}")


if __name__ == "__main__":
    main()
