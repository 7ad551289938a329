"""The SQL_MINHASH_SIG oracle's closed form vs the real OPH kernel.

The oracle (plans/queries.py) claims that for a SINGLETON shingle set {s} the
full 128-lane OPH + optimal-densification signature satisfies

    sum(sig)  = P*hv + C*M[hv % P]    (mod 2^64)
    sig[0]    = hv + C*M0[hv % P]     (mod 2^64)     hv = s*a0 + b0 mod 2^64

with M/M0 the probe-table-derived multiplier tables embedded in the SQL.
These tests pin (a) the embedded literals against regeneration from the live
probe tables, and (b) the closed form against _oph_signatures_from_shingle_sets
on randomized singleton inputs — so any drift in _perm_params, _probe_tables,
the densification arithmetic, or the SQL literals turns a green oracle red
here first.
"""
import re

import numpy as np
import pytest

from corpus_dedup_spark.config import DedupConfig
from corpus_dedup_spark.functions.udfs import (_PROBE_ATTEMPTS,
                                               _oph_signatures_from_shingle_sets,
                                               _perm_params, _probe_tables)
from corpus_dedup_spark.plans.queries import (_MINHASH_M, _MINHASH_M0,
                                              SQL_MINHASH_SIG)

_U64 = np.uint64
C = _U64(0x9E3779B97F4A7C15)
CFG = DedupConfig()
P = CFG.num_perm
A0, B0 = (p[0] for p in _perm_params(CFG))


def _parse(lit: str) -> list[int]:
    return [int(x) for x in re.findall(r"-?\d+", lit)]


def _multiplier(probes, c: int, j0: int) -> int:
    for k in range(_PROBE_ATTEMPTS):
        if probes[k][c] == j0:
            return k + 1
    d = (j0 - c) % P
    return _PROBE_ATTEMPTS + (d if d else P)


def test_embedded_tables_match_probe_tables():
    probes = _probe_tables(P, _PROBE_ATTEMPTS)
    M = _parse(_MINHASH_M)
    M0 = _parse(_MINHASH_M0)
    assert len(M) == P and len(M0) == P
    for j0 in range(P):
        assert M[j0] == sum(_multiplier(probes, c, j0) for c in range(P) if c != j0)
        assert M0[j0] == (0 if j0 == 0 else _multiplier(probes, 0, j0))


def test_sql_embeds_the_tables_and_constants():
    assert _MINHASH_M in SQL_MINHASH_SIG and _MINHASH_M0 in SQL_MINHASH_SIG
    assert str(int(A0)) in SQL_MINHASH_SIG
    assert str(int(B0)) in SQL_MINHASH_SIG
    assert str(int(C)) in SQL_MINHASH_SIG


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_closed_form_matches_kernel_on_singletons(seed):
    M = np.array(_parse(_MINHASH_M), dtype=_U64)
    M0 = np.array(_parse(_MINHASH_M0), dtype=_U64)
    rng = np.random.default_rng(seed)
    shingles = rng.integers(0, 1 << 64, size=200, dtype=_U64)
    sets = [np.array([s], dtype=_U64) for s in shingles]
    sig = _oph_signatures_from_shingle_sets(sets, A0, B0, P).view(_U64)
    with np.errstate(over="ignore"):
        hv = shingles * A0 + B0
        j0 = (hv % _U64(P)).astype(np.int64)
        exp_sum = _U64(P) * hv + C * M[j0]
        exp_first = hv + C * M0[j0]
    got_sum = sig.sum(axis=1, dtype=_U64)
    np.testing.assert_array_equal(got_sum, exp_sum)
    np.testing.assert_array_equal(sig[:, 0], exp_first)


def test_multi_shingle_sets_do_NOT_use_the_closed_form():
    """The degenerate-input argument matters: a 2-shingle set must in general
    disagree with the singleton closed form (guards against the oracle
    accidentally looking valid on non-degenerate inputs)."""
    M = np.array(_parse(_MINHASH_M), dtype=_U64)
    rng = np.random.default_rng(42)
    pairs = rng.integers(0, 1 << 64, size=(50, 2), dtype=_U64)
    sets = [np.sort(p) for p in pairs]
    sig = _oph_signatures_from_shingle_sets(sets, A0, B0, P).view(_U64)
    with np.errstate(over="ignore"):
        hv = pairs[:, 0] * A0 + B0
        j0 = (hv % _U64(P)).astype(np.int64)
        exp_sum = _U64(P) * hv + C * M[j0]
    assert (sig.sum(axis=1, dtype=_U64) != exp_sum).any()
