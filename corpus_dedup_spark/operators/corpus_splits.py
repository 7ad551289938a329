"""Deterministic corpus partitioning ops: hash split and per-domain caps.

Two staples of a training-data pipeline that must be *reproducible across
engines and runs*:

- ``hash_split``: assign every document to train/val/test by a cryptographic
  hash of a stable key — never by ``rand()``, so re-runs, incremental
  appends, and other engines (the DuckDB oracle) agree row-for-row. The
  bucket is derived from the md5 hex digest by STRING comparison against
  hex thresholds, which sidesteps engine-specific hex→int conversion
  entirely: md5 is uniform per hex position, so the first two hex chars
  give 256 equiprobable buckets.

- ``top_k_per_key``: keep the K smallest ``order_col`` rows per key (e.g.
  ≤K pages per domain — frequency capping hot hosts). A plain
  ``row_number() OVER (PARTITION BY key)`` shuffles EVERY row of a hot
  domain to one task; at web scale a single host can be 10^8 pages. This
  implementation is a two-phase distributed top-K: each map task first
  collapses to ≤K rows per (task, key) with a partial aggregation, so the
  shuffle carries at most K × n_tasks rows per key regardless of skew, then
  a final per-key merge re-sorts and slices. Both phases are JVM array
  expressions (sort_array + slice) — no window, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 256 first-two-hex-char buckets: '00'..'cb' = 204/256 ≈ 79.7% train,
# 'cc'..'e5' = 26/256 ≈ 10.2% val, 'e6'..'ff' = 26/256 ≈ 10.2% test.
DEFAULT_SPLITS = (("train", "cc"), ("val", "e6"))  # (label, exclusive upper)
FINAL_SPLIT = "test"


def split_column(key: Column, salt: str = "",
                 splits=DEFAULT_SPLITS, final: str = FINAL_SPLIT) -> Column:
    """Split label from md5(salt || key) — portable string-threshold buckets."""
    digest2 = F.substring(F.md5(F.encode(F.concat(F.lit(salt), key),
                                         "UTF-8")), 1, 2)
    expr = F.lit(final)
    for label, upper in reversed(splits):
        expr = F.when(digest2 < upper, F.lit(label)).otherwise(expr)
    return expr


def hash_split(docs: DataFrame, key_col: str = "doc_id",
               salt: str = "") -> DataFrame:
    """(…docs, split): deterministic train/val/test assignment by hashed key.

    ``salt`` lets a pipeline re-draw the split without touching the key
    (e.g. per-experiment salts) while staying fully reproducible.
    """
    key = F.col(key_col).cast("string")
    return docs.withColumn("split", split_column(key, salt))


def top_k_per_key(df: DataFrame, key_col: str, order_col: str, k: int,
                  tiebreak_col: str | None = None) -> DataFrame:
    """(key, order, rank): the K smallest order values per key, skew-proof.

    Two-phase: (1) per-map-task partial top-K via sort_array+slice inside a
    partial-combining aggregation — a hot key contributes ≤K rows per task
    to the shuffle; (2) per-key merge of the partial arrays, final sort,
    slice, posexplode to (rank, value). Ordering is by (order_col,
    tiebreak_col) encoded as a struct so ties are deterministic.
    """
    tiebreak = tiebreak_col or order_col
    pair = F.struct(F.col(order_col).alias("o"),
                    F.col(tiebreak).alias("t"))
    # Phase 1: top-K per (physical input partition, key). Grouping by the
    # projected partition id spreads a hot key over as many reducers as it
    # has input tasks — no single reducer ever sees more of a key than one
    # task's worth, and each (pid, key) group collapses to ≤K rows before
    # the phase-2 shuffle. (spark_partition_id must be projected first:
    # nondeterministic expressions can't appear in groupBy directly.)
    local = (
        df.select(key_col, pair.alias("_p"),
                  F.spark_partition_id().alias("_pid"))
        .groupBy("_pid", key_col)
        .agg(F.slice(F.sort_array(F.collect_list("_p")), 1, k).alias("_top"))
    )
    # Phase 2: merge the ≤K-per-task partials — ≤ K × n_tasks rows per key.
    merged = (
        local.groupBy(key_col)
        .agg(F.slice(F.sort_array(F.flatten(F.collect_list("_top"))),
                     1, k).alias("_top"))
    )
    out = merged.select(
        key_col, F.posexplode("_top").alias("_rank0", "_p"))
    cols = [
        F.col(key_col),
        F.col("_p.o").alias(order_col),
        (F.col("_rank0") + 1).cast("long").alias("rank"),
    ]
    if tiebreak != order_col:
        cols.insert(2, F.col("_p.t").alias(tiebreak))
    return out.select(*cols)
