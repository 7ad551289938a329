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


def test_stats_oracle_unrolled_matches_recursive_cte():
    """The r5 unrolled block_tree_stats oracle must stay value-identical to the
    r4 recursive-CTE formulation under the DuckDB installed here. The unroll
    exists because window-inside-recursive-CTE evaluation varies across DuckDB
    releases (driver-red in r4 while locally green); this pins that the
    portable reformulation did not change semantics where both are defined."""
    import duckdb

    from corpus_dedup_spark.plans.queries import (SQL_BLOCK_TREE_STATS,
                                                  _block_tree_stats_sql)

    recursive_sql = r"""
WITH RECURSIVE sq AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         replace(replace(text, chr(10), ' '), chr(13), ' ') AS text
  FROM documents WHERE doc_id < 50
), tree AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS level, CAST(0 AS BIGINT) AS start_pos,
         CAST(length(text) AS BIGINT) AS length, true AS is_marked
  FROM sq WHERE length(text) > 0
  UNION ALL
  SELECT doc_id, level, start_pos, length,
         row_number() OVER (PARTITION BY doc_id, level, content
                            ORDER BY start_pos) = 1 AS is_marked
  FROM (
    SELECT t.doc_id, t.level + 1 AS level,
           t.start_pos + c.j * (t.length // 2) AS start_pos,
           CASE WHEN c.j = 0 THEN t.length // 2
                ELSE t.length - (t.length // 2) END AS length,
           substr(s.text, CAST(t.start_pos + c.j * (t.length // 2) + 1 AS INT),
                  CAST(CASE WHEN c.j = 0 THEN t.length // 2
                       ELSE t.length - (t.length // 2) END AS INT)) AS content
    FROM tree t JOIN sq s USING (doc_id), range(0, 2) c(j)
    WHERE t.is_marked AND t.length > 1 AND t.level < 40
  )
)
SELECT level, count(*) AS n_nodes,
       count_if(is_marked) AS n_marked,
       count_if(NOT is_marked) AS n_pointers
FROM tree GROUP BY level ORDER BY level
"""
    assert SQL_BLOCK_TREE_STATS == _block_tree_stats_sql(40)
    con = duckdb.connect()
    # repetition-heavy synthetic docs exercise pointer nodes at several levels
    con.execute("""
        CREATE TABLE documents AS
        SELECT i AS doc_id,
               repeat('abracadabra ', 1 + i % 7) ||
               repeat('xyz', i % 5) || CAST(i AS VARCHAR) AS text
        FROM (SELECT unnest(generate_series(0, 49)) AS i)
    """)
    got = con.sql(SQL_BLOCK_TREE_STATS).fetchall()
    want = con.sql(recursive_sql).fetchall()
    assert got == want
    assert sum(r[3] for r in got) > 0  # non-vacuous: pointer nodes exist
