"""Smoke the driver contract: entry() + every rows-only query returns a DataFrame."""

import pytest

import __spark_entry__ as entry_mod
from corpus_dedup_spark.plans.queries import ORACLES, QUERIES


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["url", "dedup_text", "n_units"]
    assert len(rows) > 0


def test_contract_shapes():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 15


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) >= 1
