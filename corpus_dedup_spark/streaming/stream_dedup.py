"""Structured Streaming exact dedup — incremental ingestion of new crawl batches.

The reference is a batch CLI; this is the engine's extension for continuously-arriving
pages: readStream over the pages table directory → the SAME extraction UDF →
``dropDuplicates`` on the normalized unit (state-store-backed — the streaming analog of
the global sentence set), watermarked on ``warc_ts`` so late arrivals older than the
watermark don't grow state forever.

At scale: state is hash-partitioned on norm_unit (same key as the batch shuffle);
RocksDB state store + watermark bound memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corpus_dedup_spark.functions.udfs import make_extract_units_udf


def stream_unit_dedup(spark: SparkSession, input_dir: str, schema,
                      mode: str = "sentence", max_length: int = 0,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming keep-side units: (url, unit_idx, norm_unit, warc_ts), first-wins
    across all micro-batches via state-store dropDuplicates."""
    extract = make_extract_units_udf(mode, max_length)
    pages = (
        spark.readStream.schema(schema).parquet(input_dir)
        .withWatermark("warc_ts", watermark)
    )
    units = pages.select(
        "url", "warc_ts",
        F.posexplode(extract(F.col("text"))).alias("unit_idx", "norm_unit"),
    )
    # state key = the normalized unit bytes (never a hash alone — quirk Q6)
    return units.dropDuplicates(["norm_unit"])


def run_stream_to_memory(spark: SparkSession, input_dir: str, schema,
                         query_name: str = "stream_dedup", **kwargs):
    """Test/demo harness: availableNow trigger drains existing files once into an
    in-memory sink; returns the StreamingQuery."""
    deduped = stream_unit_dedup(spark, input_dir, schema, **kwargs)
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
