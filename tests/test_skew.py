"""Salted aggregation: correctness vs unsalted, determinism, hot-key capping."""

import pyspark.sql.functions as F

from corpus_dedup_spark.functions.skew import posting_lists, salted_collect_list


def test_salted_collect_matches_unsalted(spark):
    rows = [(f"k{i % 5}", f"v{i:03d}") for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"])
    salted = {r["k"]: r["values"]
              for r in salted_collect_list(df, "k", "v", salt_buckets=4).collect()}
    plain = {r["k"]: sorted(r["vals"]) for r in
             df.groupBy("k").agg(F.collect_list("v").alias("vals")).collect()}
    assert salted == plain


def test_salted_collect_deterministic(spark):
    rows = [(f"k{i % 3}", f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "v"])
    a = {r["k"]: r["values"] for r in
         salted_collect_list(df, "k", "v", salt_buckets=8).collect()}
    b = {r["k"]: r["values"] for r in
         salted_collect_list(df.repartition(7), "k", "v", salt_buckets=8).collect()}
    assert a == b


def test_posting_lists_cap_hot_unit(spark):
    # one boilerplate unit in 500 docs, one rare unit in 2
    rows = [("boiler", f"u{i:04d}") for i in range(500)]
    rows += [("rare", "u0001"), ("rare", "u0002")]
    df = spark.createDataFrame(rows, ["norm_unit", "url"])
    out = {r["norm_unit"]: r for r in
           posting_lists(df, salt_buckets=4, max_docs_per_unit=50).collect()}
    assert out["rare"]["doc_ids"] == ["u0001", "u0002"]
    assert out["boiler"]["n_docs_capped"] == 50
    # deterministic sample: sorted, capped
    assert out["boiler"]["doc_ids"] == sorted(out["boiler"]["doc_ids"])
