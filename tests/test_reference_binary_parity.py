"""End-to-end parity against the ACTUAL reference binary, inside pytest.

Builds the reference from /root/reference out-of-tree (scripts/
bench_reference.py lowers its C23-only constructs for the sandbox's gcc 12;
no reference code enters this repo) and asserts:

1. dedup output is byte-identical per document (reference single-threaded so
   its first-wins keeper is deterministic, file order aligned to the engine's
   url order — scripts/verify_reference_output.py semantics), and
2. search-mode hits match exactly as (url, line, col) sets.

Skipped when gcc or /root/reference is unavailable. Full-scale runs (200k
docs) live in the scripts; these use small corpora to keep the suite fast.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/dev/shm/refbench_pytest"

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None or not os.path.isdir("/root/reference/src"),
    reason="gcc or reference source unavailable")


@pytest.fixture(scope="module")
def ref_binary():
    from scripts.bench_reference import build, patch_tree
    os.makedirs(WORK, exist_ok=True)
    src = os.path.join(WORK, "src")
    try:
        patch_tree("/root/reference/src", src)
        bins = build(src, WORK)
    except (subprocess.CalledProcessError, OSError) as e:
        pytest.skip(f"reference build failed: {e}")
    return bins["release_c"]


def test_dedup_output_byte_identical(spark, ref_binary):
    from scripts.verify_reference_output import dump_rank_named

    from bench import ensure_pages_cache
    from corpus_dedup_spark.operators.exact_dedup import run_exact_dedup_observed

    n_docs = 2000
    corpus = os.path.join(WORK, "corpus")
    refout = os.path.join(WORK, "out")
    scan_names, ranked_urls = dump_rank_named(n_docs, corpus)
    url_of_name = dict(zip(scan_names, ranked_urls))

    shutil.rmtree(refout, ignore_errors=True)
    subprocess.run([ref_binary, corpus, refout],
                   env={**os.environ, "DEDUP_THREADS": "1"},
                   capture_output=True, check=True)
    ref_docs = {}
    for name in os.listdir(refout):
        if name.startswith("doc_"):
            with open(os.path.join(refout, name), "rb") as fh:
                ref_docs[url_of_name[name]] = fh.read()

    pages_path, _ = ensure_pages_cache(0.1, n_docs=n_docs)
    deduped, _ = run_exact_dedup_observed(spark.read.parquet(pages_path))
    ours = {r["url"]: r["dedup_text"].encode("utf-8") for r in deduped.collect()}

    assert set(ours) == set(ref_docs)
    diff = [u for u in ref_docs if ref_docs[u] != ours[u]]
    assert not diff, f"{len(diff)} docs differ, first: {diff[0]}"


def test_search_hits_match_binary(spark, ref_binary):
    import glob
    import re

    import pyarrow.parquet as pq

    from scripts.verify_reference_output import dump_rank_named

    from bench import ensure_pages_cache
    from corpus_dedup_spark.operators.search import (build_fingerprint_index,
                                                     search)

    n_docs = 1000
    corpus = os.path.join(WORK, "corpus_search")
    scan_names, ranked_urls = dump_rank_named(n_docs, corpus)
    url_of_path = {os.path.join(corpus, n): u
                   for n, u in zip(scan_names, ranked_urls)}

    pages_path, _ = ensure_pages_cache(0.1, n_docs=n_docs)
    first_text = pq.read_table(
        sorted(glob.glob(os.path.join(pages_path, "*.parquet")))[0],
        columns=["text"]).column("text")[0].as_py()
    query = first_text.replace("\n", " ").replace("\r", " ")[20:35]
    assert len(query) == 15

    r = subprocess.run([ref_binary, "--search", corpus],
                       input=query + "\nexit\n", capture_output=True,
                       text=True, env={**os.environ, "DEDUP_THREADS": "1"},
                       check=True)
    ref_hits = set()
    for ln in r.stdout.splitlines():
        if "search>" in ln:
            ln = ln.split("search>")[-1].strip()
        m = re.match(r"^(.*):(\d+):(\d+)$", ln)
        if m and m.group(1) in url_of_path:
            ref_hits.add((url_of_path[m.group(1)], int(m.group(2)),
                          int(m.group(3))))

    pages = spark.read.parquet(pages_path)
    index = build_fingerprint_index(pages, len(query))
    rows = search(index, pages, query).collect()
    eng = {(row["url"], 1, row["pos"] + 1) for row in rows}

    assert eng and eng == ref_hits
