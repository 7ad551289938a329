"""Regenerate corpus_dedup_spark/plans/ann_planes.py.

The embedding_ann oracle (SQL_EMBEDDING_ANN) needs the seeded hyperplane
matrix of make_hyperplane_bucket_udf(dim=64, n_planes=8, seed=7, n_tables=2)
as a DuckDB literal. Values are serialized with repr() so the decimal text
round-trips to the identical IEEE-754 double in DuckDB. Run after changing
the ANN seed/shape in plans/queries.q_embedding_ann, then re-verify the
oracle.
"""
import sys

import numpy as np

sys.path.insert(0, ".")

DIM, N_PLANES, N_TABLES, SEED = 64, 8, 2, 7


def planes_literal() -> str:
    rng = np.random.default_rng(SEED)
    planes = rng.standard_normal((DIM, N_TABLES * N_PLANES))
    cols = []
    for c in range(N_TABLES * N_PLANES):
        vals = ",".join(repr(float(planes[i, c])) for i in range(DIM))
        cols.append("[" + vals + "]")
    return "[" + ",\n".join(cols) + "]"


def main():
    lit = planes_literal()
    from corpus_dedup_spark.plans import ann_planes
    if ann_planes.PLANES_SQL == lit:
        print("ann_planes.PLANES_SQL is up to date")
    else:
        print("DRIFT: regenerate corpus_dedup_spark/plans/ann_planes.py "
              "(see this script's docstring)")
        sys.exit(1)


if __name__ == "__main__":
    main()
