#!/usr/bin/env python
"""Search-mode parity vs the actual reference binary.

The reference's --search mode reads every file through read_file_bytes —
which replaces '\n'/'\r' with spaces (quirk Q1, src/io_utils.c:71,86), so
the indexed text has NO newlines and every printed hit is line 1 with
col = codepoint offset + 1 — decodes to UTF-32, concatenates, builds ONE
global Block Tree + rolling prefix tables (base 1315423911, value cp+1), and
answers stdin queries with window-hash probes verified through block-tree
access, printing ``path:line:col`` (src/search_mode.c). This script runs that
binary on the bench corpus and compares every hit against the engine's
fingerprint-index search (operators/search.py, squash=True — the same
newline-to-space read transform).

Because verification in the reference goes through query_access() over its
Block Tree, a green run is ALSO end-to-end evidence for the reference-parity
of hash family H4, probe/verify J3, and the block-tree access path.

  python scripts/verify_reference_search.py --n-docs 20000
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("REF_VERIFY_DIR", "/dev/shm/refverify")
QLEN = 15
N_QUERIES = 4


def pick_queries(texts: list[str]) -> list[str]:
    """Deterministic single-line substrings of length QLEN + one absent."""
    qs: list[str] = []
    step = max(1, len(texts) // (N_QUERIES * 7))
    for i in range(0, len(texts), step):
        t = texts[i]
        for start in (12, 40, 80):
            q = t[start:start + QLEN]
            if len(q) == QLEN and "\n" not in q and q.strip() == q and q not in qs:
                qs.append(q)
                break
        if len(qs) == N_QUERIES:
            break
    qs.append("zzqxj_no_match_" [:QLEN].ljust(QLEN, "z"))  # absent control
    return qs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from scripts.verify_reference_output import build_reference, dump_rank_named
    binary = build_reference()
    corpus = os.path.join(WORK, "corpus_search")
    scan_names, ranked_urls = dump_rank_named(args.n_docs, corpus)
    url_of_path = {os.path.join(corpus, n): u
                   for n, u in zip(scan_names, ranked_urls)}

    import glob

    import pyarrow.parquet as pq

    from bench import ensure_pages_cache
    pages_path, _ = ensure_pages_cache(0.1, n_docs=args.n_docs)
    urls, texts = [], []
    for f in sorted(glob.glob(os.path.join(pages_path, "*.parquet"))):
        t = pq.read_table(f, columns=["url", "text"])
        urls.extend(t.column("url").to_pylist())
        texts.extend(t.column("text").to_pylist())
    queries = pick_queries([t.replace("\n", " ").replace("\r", " ")
                            for t in texts])

    stdin = "\n".join(queries) + "\nexit\n"
    r = subprocess.run([binary, "--search", corpus],
                       input=stdin, capture_output=True, text=True,
                       env={**os.environ, "DEDUP_THREADS": "1"}, check=True)
    # hits appear between the per-query "search>" prompts; attribute by order
    ref_hits: list[set] = [set() for _ in queries]
    qi = -1
    for ln in r.stdout.splitlines():
        if "search>" in ln:
            qi += 1
            ln = ln.split("search>")[-1].strip()
        m = re.match(r"^(.*):(\d+):(\d+)$", ln)
        if m and 0 <= qi < len(queries) and m.group(1) in url_of_path:
            ref_hits[qi].add((url_of_path[m.group(1)],
                              int(m.group(2)), int(m.group(3))))

    from corpus_dedup_spark.operators.search import build_fingerprint_index, search
    from corpus_dedup_spark.plans.session import build_session
    spark = build_session(app_name="verify_ref_search",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=max(8, args.cores))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    index = build_fingerprint_index(pages, QLEN).cache()
    index.count()

    results = {}
    all_ok = True
    for qi, q in enumerate(queries):
        rows = search(index, pages, q).collect()
        # squashed text has no newlines: the reference prints line 1,
        # col = codepoint offset + 1, for every hit
        eng = {(row["url"], 1, row["pos"] + 1) for row in rows}
        ok = eng == ref_hits[qi]
        all_ok &= ok
        results[q] = {"engine_hits": len(eng), "ref_hits": len(ref_hits[qi]),
                      "match": ok}
    spark.stop()
    print(json.dumps({"n_docs": args.n_docs, "queries": results,
                      "all_match": all_ok}))


if __name__ == "__main__":
    main()
