"""Structured Streaming dedup: streamed keep-set equals the batch keep-set."""

import pyspark.sql.functions as F
import pytest

from corpus_dedup_spark.operators.exact_dedup import explode_units
from corpus_dedup_spark.sources.pages import pages_spark
from corpus_dedup_spark.streaming.stream_dedup import run_stream_to_memory


def test_stream_matches_batch_keepset(spark, tmp_path):
    df, _, _ = pages_spark(spark, n_docs=60, seed=5)
    path = str(tmp_path / "pages_stream")
    df.write.mode("overwrite").parquet(path)

    q = run_stream_to_memory(spark, path, df.schema, query_name="sd_test")
    q.awaitTermination(120)
    streamed = spark.sql("select norm_unit from sd_test")
    stream_units = {bytes(r["norm_unit"]) for r in streamed.collect()}

    batch_units = {
        bytes(r["norm_unit"])
        for r in explode_units(df).select("norm_unit").distinct().collect()
    }
    assert stream_units == batch_units
