"""Structured Streaming exact dedup — incremental ingestion of new crawl batches.

The reference is a batch CLI; this is the engine's extension for continuously-arriving
pages: readStream over the pages table directory → the SAME extraction UDF →
state-store-backed dedup on the normalized unit (the streaming analog of the global
sentence set).

State-lifetime contract (two modes; ``bounded_state`` is REQUIRED — the default
flip-flopped across reviews because neither mode is a safe silent choice, so the
caller must pick one explicitly):
- ``bounded_state=False``: plain ``dropDuplicates`` on norm_unit — exact global
  first-wins, the SAME guarantee as the batch engine. State grows with the
  distinct-unit count (Spark only evicts dedup state when the event-time column
  is part of the key); fine for bounded replays and finite backfills, UNSAFE on
  a truly unbounded stream.
- ``bounded_state=True``: ``dropDuplicatesWithinWatermark`` — Spark evicts a
  unit's state once the watermark passes its event time, so memory is bounded;
  the trade is that a duplicate arriving later than the watermark delay is
  RE-EMITTED. This is the scale-safe mode for a truly unbounded stream — it
  weakens the dedup guarantee, so it too must be an explicit choice.

At scale: state is hash-partitioned on norm_unit (same key as the batch shuffle);
RocksDB state store keeps it off-heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corpus_dedup_spark.functions.udfs import make_extract_units_udf


def stream_unit_dedup(spark: SparkSession, input_dir: str, schema,
                      mode: str = "sentence", max_length: int = 0,
                      watermark: str = "1 hour",
                      *, bounded_state: bool) -> DataFrame:
    """Streaming keep-side units: (url, unit_idx, norm_unit, warc_ts), first-wins
    across micro-batches (see module docstring for the state-lifetime contract)."""
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
    if bounded_state:
        return units.dropDuplicatesWithinWatermark(["norm_unit"])
    return units.dropDuplicates(["norm_unit"])


def run_stream_to_memory(spark: SparkSession, input_dir: str, schema,
                         query_name: str = "stream_dedup",
                         bounded_state: bool = False, **kwargs):
    """Test/demo harness: availableNow trigger drains existing files once into an
    in-memory sink; returns the StreamingQuery. The harness drains a FINITE file
    set, so exact dedup (bounded_state=False) is the sound harness default."""
    deduped = stream_unit_dedup(spark, input_dir, schema,
                                bounded_state=bounded_state, **kwargs)
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
