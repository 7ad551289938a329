"""hash_split + top_k_per_key (corpus_splits.py): determinism, skew shape."""

import hashlib

import pytest

from corpus_dedup_spark.operators.corpus_splits import (
    hash_split,
    split_column,
    top_k_per_key,
)


class TestHashSplit:
    def test_matches_reference_md5(self, spark):
        df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
        got = {r["doc_id"]: r["split"]
               for r in hash_split(df, salt="s").collect()}
        for i in range(200):
            h2 = hashlib.md5(f"s{i}".encode()).hexdigest()[:2]
            want = "train" if h2 < "cc" else ("val" if h2 < "e6" else "test")
            assert got[i] == want

    def test_deterministic_across_runs(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = sorted(map(tuple, hash_split(df).collect()))
        b = sorted(map(tuple, hash_split(df).collect()))
        assert a == b

    def test_salt_redraws(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in hash_split(df, salt="a").collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(df, salt="b").collect()}
        assert any(a[i] != b[i] for i in a)  # different draw...
        assert set(a.values()) == {"train", "val", "test"}  # ...same buckets

    def test_proportions(self, spark):
        df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
        counts = {r["split"]: r["count"]
                  for r in hash_split(df).groupBy("split").count().collect()}
        n = sum(counts.values())
        assert n == 20_000
        # expected 204/26/26 of 256; md5 is uniform, allow ±2% absolute
        assert abs(counts["train"] / n - 204 / 256) < 0.02
        assert abs(counts["val"] / n - 26 / 256) < 0.02
        assert abs(counts["test"] / n - 26 / 256) < 0.02

    def test_incremental_append_stability(self, spark):
        """A doc's split never changes when the corpus around it grows."""
        small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
        big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(big).collect()}
        assert all(b[i] == a[i] for i in a)


class TestTopKPerKey:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "key string, o long, t long")

    def test_basic(self, spark):
        rows = [("a", v, 100 + v) for v in [5, 3, 9, 1, 7]] + \
               [("b", v, 200 + v) for v in [2, 8]]
        out = top_k_per_key(self._df(spark, rows), "key", "o", 3, "t").collect()
        got = {(r["key"], r["rank"]): (r["o"], r["t"]) for r in out}
        assert got == {
            ("a", 1): (1, 101), ("a", 2): (3, 103), ("a", 3): (5, 105),
            ("b", 1): (2, 202), ("b", 2): (8, 208),
        }

    def test_ties_break_deterministically(self, spark):
        rows = [("a", 1, t) for t in [30, 10, 20]]
        out = top_k_per_key(self._df(spark, rows), "key", "o", 2, "t").collect()
        assert sorted((r["rank"], r["t"]) for r in out) == [(1, 10), (2, 20)]

    def test_hot_key_many_partitions(self, spark):
        """A key spanning every input partition still yields the global top-K."""
        df = spark.range(0, 10_000, 1, 16).selectExpr(
            "'hot' AS key", "CAST(id % 997 AS LONG) AS o", "id AS t")
        out = top_k_per_key(df, "key", "o", 5, "t").collect()
        # global minima: o=0 at t=0, 997, 1994, 2991, 3988
        assert [(r["o"], r["t"]) for r in sorted(out, key=lambda r: r["rank"])] \
            == [(0, 0), (0, 997), (0, 1994), (0, 2991), (0, 3988)]

    def test_no_window_in_plan(self, spark):
        """The skew-proof claim: no Window operator, two hash aggregations."""
        df = spark.range(0, 100).selectExpr(
            "CAST(id % 3 AS STRING) key", "id o", "id t")
        plan = top_k_per_key(df, "key", "o", 3, "t") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "partial_collect_list" in plan
