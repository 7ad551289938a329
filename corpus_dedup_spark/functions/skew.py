"""Explicit skew-handling primitives (north rule: "skew from hot shards and
boilerplate-heavy hosts is handled via salted repartitioning and AQE skew-join hints").

Most of this engine's aggregations are partial-combinable (min/count/sum), where
Spark's map-side combine already neutralizes hot keys. Salting is for the rest:
aggregations whose state grows with group size (collect_list/collect_set — posting
lists, per-key samples) where a hot key would pin one reducer. The two-phase pattern
splits each key into ``salt_buckets`` sub-keys, aggregates per sub-key, then merges
sub-aggregates — O(group/salt) peak state instead of O(group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "_salt",
              on: Column | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, salt_buckets): hash of ``on``, or —
    fallback — a hash of ALL row columns. Both are pure functions of row content,
    never of partition/task layout, so reruns stay byte-identical (resume contract).
    Rows identical in every column hash to one salt bucket; pass ``on`` with a
    distinguishing column when exact duplicates dominate a hot key."""
    src = [on] if on is not None else [F.col(c) for c in df.columns]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*src), F.lit(salt_buckets)))


def salted_collect_list(df: DataFrame, key: str, value: str, salt_buckets: int = 8,
                        max_per_key: int | None = None,
                        sort_result: bool = True) -> DataFrame:
    """(key, value) → (key, values array) via two-phase salted aggregation.

    Phase 1 groups by (key, salt) — a key with 10^8 rows lands on ``salt_buckets``
    reducers instead of one. Phase 2 merges the per-salt arrays (flatten + optional
    global sort + optional cap). With ``max_per_key`` the cap applies per-salt first
    (bounding phase-1 state) and again after the merge."""
    salted = with_salt(df, salt_buckets, on=F.col(value))
    per_salt = salted.groupBy(key, "_salt").agg(
        F.collect_list(value).alias("_vals"))
    if max_per_key is not None:
        # sort before the per-salt cap: each salt keeps its smallest max_per_key, so
        # the merged smallest-max_per_key equals the global smallest-max_per_key —
        # a deterministic sample regardless of arrival/partition order
        per_salt = per_salt.withColumn(
            "_vals", F.slice(F.array_sort("_vals"), 1, max_per_key))
    merged = per_salt.groupBy(key).agg(
        F.flatten(F.collect_list("_vals")).alias("values"))
    if sort_result:
        merged = merged.withColumn("values", F.array_sort("values"))
    if max_per_key is not None:
        merged = merged.withColumn("values", F.slice("values", 1, max_per_key))
    return merged


def posting_lists(units: DataFrame, unit_col: str = "norm_unit",
                  id_col: str = "url", salt_buckets: int = 8,
                  max_docs_per_unit: int = 1000) -> DataFrame:
    """Inverted index: unit → (capped, sorted) list of containing documents.

    The canonical hot-key case: a boilerplate unit appears in 10^8 documents; salting
    bounds any single task's state to ~max_docs_per_unit while the cap records only a
    deterministic sample (smallest ids) for huge posting lists."""
    out = salted_collect_list(
        units.select(unit_col, id_col), unit_col, id_col,
        salt_buckets=salt_buckets, max_per_key=max_docs_per_unit)
    return out.withColumnRenamed("values", "doc_ids").withColumn(
        "n_docs_capped", F.size("doc_ids"))
