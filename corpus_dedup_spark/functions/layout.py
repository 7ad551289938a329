"""Input-layout repair — fan a narrow scan out to the cluster's task slots.

The driver's sf tables are single-file, single-row-group parquet: Spark can
never split them past ONE scan task, so every map-side stage above the scan
(pandas/Arrow UDFs, regex chains, explodes) runs serially no matter how many
cores the cluster has (guide §2.5 "input skew": one huge unsplittable input).
A production table (or a 100 TB Iceberg table) arrives already split to match
the cluster, so the repartition below is CONDITIONAL: it fires only when the
scan has fewer partitions than the cluster has slots, and is a no-op — zero
added Exchange — on any well-laid-out input.

The cost when it fires is one round-robin shuffle of the narrow projection
(select the columns you need BEFORE fanning out); the payoff is that the
expensive per-row compute above it parallelizes across every core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the default parallelism, but ONLY when
    its current plan yields fewer partitions than that — a no-op (no Exchange)
    for inputs whose layout already matches the cluster.

    Known limitation: the guard tests the scan's PARTITION COUNT, not its row
    distribution. A multi-GB single-row-group file byte-splits into many
    partitions of which only one yields rows, and the guard cannot see that
    (knowing it would require reading footer metadata per file). That layout
    is pathological for every engine — writers emit ≤128 MB-1 GB row groups —
    and the driver tables that motivated this helper are small enough to
    fall on the fires-correctly side."""
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
