"""Block tree: structure, pointer correctness, query_access reconstruction; search."""

import pyspark.sql.functions as F
import pytest

from corpus_dedup_spark.operators.block_tree import (build_block_tree,
                                                     query_access, tree_stats)
from corpus_dedup_spark.operators.search import (build_fingerprint_index,
                                                 search, search_many,
                                                 search_report)


@pytest.fixture(scope="module")
def repetitive_pages(spark):
    # highly repetitive text → pointer nodes must appear
    return spark.createDataFrame(
        [("u1", "abcdabcdabcdabcd"),
         ("u2", "xyxyxyxyxyxyxyxy"),
         ("u3", "entirely unique content with no repeats at all")],
        ["url", "text"])


def test_tree_structure(spark, repetitive_pages):
    tree = build_block_tree(repetitive_pages)
    rows = tree.collect()
    # roots: one level-0 node per doc, full length
    roots = [r for r in rows if r["level"] == 0]
    assert {r["url"] for r in roots} == {"u1", "u2", "u3"}
    for r in roots:
        assert r["start_pos"] == 0 and r["is_marked"]
    # every pointer node's target references content equal to its own
    texts = {r["url"]: r["text"] for r in repetitive_pages.collect()}
    for r in rows:
        if not r["is_marked"]:
            t = texts[r["url"]]
            a = t[r["start_pos"]:r["start_pos"] + r["length"]]
            b = t[r["target_pos"]:r["target_pos"] + r["length"]]
            assert a == b, r
    # repetitive docs must produce pointer nodes
    assert any(not r["is_marked"] for r in rows if r["url"] == "u1")


def test_query_access_reconstruction(spark, repetitive_pages):
    tree = build_block_tree(repetitive_pages)
    texts = {r["url"]: r["text"] for r in repetitive_pages.collect()}
    for url, text in texts.items():
        rows = [r.asDict() for r in tree.filter(F.col("url") == url).collect()]
        for pos in range(len(text)):
            assert query_access(rows, text, pos) == text[pos], (url, pos)


def test_tree_stats(spark, repetitive_pages):
    st = tree_stats(build_block_tree(repetitive_pages)).collect()
    assert st[0]["level"] == 0 and st[0]["n_nodes"] == 3
    assert sum(r["n_pointers"] for r in st) > 0


def test_search_single_and_batch(spark):
    pages = spark.createDataFrame(
        [("d1", "the cat sat on the mat"),
         ("d2", "a cat and another cat here"),
         ("d3", "no felines at all")],
        ["url", "text"])
    idx = build_fingerprint_index(pages, window=3)
    hits = search(idx, pages, "cat")
    got = {(r["url"], r["pos"]) for r in hits.collect()}
    assert got == {("d1", 4), ("d2", 2), ("d2", 18)}
    rep = search_report(hits).collect()[0]
    assert rep["total_hits"] == 3 and rep["docs_with_hits"] == 2
    # batch: same-length queries broadcast-joined
    many = search_many(idx, pages, ["cat", "mat", "sat"])
    got2 = {(r["query"], r["url"], r["pos"]) for r in many.collect()}
    assert ("mat", "d1", 19) in got2 and ("sat", "d1", 8) in got2
    assert len([g for g in got2 if g[0] == "cat"]) == 3


def test_search_squash_semantics(spark):
    # newline squash (Q1): query with a space matches across what was a newline
    pages = spark.createDataFrame([("d1", "hello\nworld")], ["url", "text"])
    idx = build_fingerprint_index(pages, window=11)
    assert search(idx, pages, "hello world").count() == 1
