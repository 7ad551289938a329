"""Pin the embedding_ann oracle's embedded hyperplane literal to the kernel.

SQL_EMBEDDING_ANN replays the seeded LSH bucketing with the plane matrix
serialized as a DuckDB literal (plans/ann_planes.py). These tests ensure the
literal IS the matrix the UDF draws (same rng, seed, shape, column-major
layout) and that its repr-serialization round-trips to identical doubles —
so any drift in seed/shape/rng turns the green oracle red here first.
"""
import re

import numpy as np

from corpus_dedup_spark.plans.ann_planes import PLANES_SQL

DIM, N_PLANES, N_TABLES, SEED = 64, 8, 2, 7


def _parse_literal() -> np.ndarray:
    cols = re.findall(r"\[([^\[\]]+)\]", PLANES_SQL)
    assert len(cols) == N_TABLES * N_PLANES
    mat = np.array([[float(x) for x in c.split(",")] for c in cols]).T
    assert mat.shape == (DIM, N_TABLES * N_PLANES)
    return mat


def test_literal_matches_seeded_draw_bit_exactly():
    rng = np.random.default_rng(SEED)
    planes = rng.standard_normal((DIM, N_TABLES * N_PLANES))
    parsed = _parse_literal()
    # bit-exact: repr round-trips doubles losslessly, so == must hold exactly
    assert (parsed == planes).all()


def test_literal_is_what_the_bucket_udf_uses():
    # the UDF builds its planes identically (operators/embedding_dedup.py:
    # make_hyperplane_bucket_udf) — pin the construction, not just the values
    from corpus_dedup_spark.operators import embedding_dedup  # noqa: F401
    import inspect

    src = inspect.getsource(embedding_dedup.make_hyperplane_bucket_udf)
    assert "default_rng(seed)" in src and "standard_normal((dim, n_tables * n_planes))" in src


def test_bucket_ids_match_sql_formula():
    """The SQL bucket formula (sign-bit byte × FNV prime + table salt) must
    equal the UDF's packbits construction for n_planes=8."""
    rng = np.random.default_rng(123)
    vecs = rng.standard_normal((50, DIM))
    planes = _parse_literal()
    signs = (vecs @ planes) > 0
    for t in range(N_TABLES):
        s = signs[:, t * N_PLANES:(t + 1) * N_PLANES]
        # UDF path: little-endian packbits → int64 × prime + t
        bits = np.packbits(s, axis=1, bitorder="little")
        padded = np.zeros((50, 8), dtype=np.uint8)
        padded[:, :bits.shape[1]] = bits
        udf_bucket = padded.view(np.int64).ravel() * np.int64(1099511628211) + np.int64(t)
        # SQL path: sum of 2^j over set bits → same int64
        sql_bucket = (s * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64) \
            * np.int64(1099511628211) + np.int64(t)
        assert (udf_bucket == sql_bucket).all()
