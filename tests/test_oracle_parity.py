"""Local replica of the driver's DuckDB-oracle comparison: row count + column names +
order-insensitive values for every oracle-backed query at sf0.001."""

import math

import duckdb
import pytest

from corpus_dedup_spark.plans.queries import ORACLES, QUERIES

TABLES = ("region nation customer supplier part orders lineitem events documents "
          "embeddings").split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "__int__") and not isinstance(v, (int, float)):  # Decimal
        try:
            f = float(v)
            return int(f) if f == int(f) else round(f, 6)
        except (ValueError, OverflowError):
            return str(v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort key on repr like the driver does — raw tuples with NULLs (e.g.
    # ROLLUP subtotal rows) aren't orderable against strings
    return sorted(
        (tuple(_norm(row[i]) for i in idx) for row in rows),
        key=lambda t: tuple(repr(v) for v in t),
    ), [cols[i] for i in idx]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ddf = duck.sql(ORACLES[name])
    drows = ddf.fetchall()
    dcols = [d[0] for d in ddf.description]
    s_set, s_cols = _rowset(scols, srows)
    d_set, d_cols = _rowset(dcols, drows)
    assert [c.lower() for c in s_cols] == [c.lower() for c in d_cols], (
        f"{name}: column mismatch {s_cols} vs {d_cols}")
    assert len(s_set) == len(d_set), (
        f"{name}: row count {len(s_set)} vs {len(d_set)}")
    assert s_set == d_set, f"{name}: value mismatch; first diff: " + str(
        next(((a, b) for a, b in zip(s_set, d_set) if a != b), None))
    # STRICT driver-level compare: the external driver hashes repr()s with NO
    # numeric coercion, so a DuckDB HUGEINT/Decimal or a banker's-rounding tie
    # that the friendly compare above absorbs would still fail the round gate.
    # Keep both: the friendly diff localizes a failure, this catches it at all.
    s_repr = sorted(tuple(repr(r[i]) for i in
                          sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows)
    d_repr = sorted(tuple(repr(r[i]) for i in
                          sorted(range(len(dcols)), key=lambda i: dcols[i]))
                    for r in drows)
    assert s_repr == d_repr, f"{name}: STRICT repr mismatch; first diff: " + str(
        next(((a, b) for a, b in zip(s_repr, d_repr) if a != b), None))
