"""Regenerate the closed-form OPH oracle constants embedded in
plans/queries.py (SQL_MINHASH_SIG).

For a SINGLETON shingle set {s}, the OPH + optimal-densification signature is
a pure function of hv = s*a0 + b0 mod 2^64 (see udfs._oph_signatures_from_
shingle_sets): bin j0 = hv % P holds hv; an empty lane c is filled at the
first probe attempt k with probes[k][c] == j0 (value hv + (k+1)*C), else by
the rotation fallback (value hv + (24 + (j0-c) mod P)*C). This script prints
the two derived lookup tables:

  M[j0]  = sum over c != j0 of m(c, j0)   (drives sig_sum = P*hv + C*M[j0])
  M0[j0] = m(0, j0), 0 when j0 == 0       (drives sig_first = hv + C*M0[j0])

plus a0/b0 so drift in _perm_params/_probe_tables is caught by re-running.
"""
import sys

sys.path.insert(0, ".")

from corpus_dedup_spark.config import DedupConfig
from corpus_dedup_spark.functions.udfs import (_PROBE_ATTEMPTS, _perm_params,
                                               _probe_tables)


def multiplier(probes, c: int, j0: int, P: int) -> int:
    for k in range(_PROBE_ATTEMPTS):
        if probes[k][c] == j0:
            return k + 1
    d = (j0 - c) % P
    return _PROBE_ATTEMPTS + (d if d else P)


def main():
    cfg = DedupConfig()
    P = cfg.num_perm
    a, b = _perm_params(cfg)
    probes = _probe_tables(P, _PROBE_ATTEMPTS)
    M = [sum(multiplier(probes, c, j0, P) for c in range(P) if c != j0)
         for j0 in range(P)]
    M0 = [0 if j0 == 0 else multiplier(probes, 0, j0, P) for j0 in range(P)]
    print("a0 =", int(a[0]))
    print("b0 =", int(b[0]))
    print("M  =", M)
    print("M0 =", M0)


if __name__ == "__main__":
    main()
