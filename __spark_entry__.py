"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementations live in ``corpus_dedup_spark``; this module is a thin
adapter. tests/test_oracle_parity.py replicates the driver comparison locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference dedup pipeline (sentence-split → normalize →
    global first-wins dedup → per-doc reassembly) on sf0.001 documents-as-pages."""
    from corpus_dedup_spark.operators.exact_dedup import run_exact_dedup
    from corpus_dedup_spark.sources.pages import documents_as_pages

    pages = documents_as_pages(spark, "/root/testdata/sf0.001")
    _marked, deduped, _stats = run_exact_dedup(pages)
    return deduped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from corpus_dedup_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from corpus_dedup_spark.plans.queries import ORACLES

    return dict(ORACLES)
