"""IVF-Flat ANN (operators/ivf_ann.py).

Structural properties (every vector in exactly one cell, centroid determinism),
exactness at nprobe = n_centroids (IVF degrades to brute force), planted-copy
recall at small nprobe, and a numpy reference for the assignment argmax.
"""

import numpy as np
import pytest

from corpus_dedup_spark.operators.ivf_ann import (ivf_assign, ivf_topk,
                                                  select_centroids)

DIM = 8


def _vectors(spark, n=60, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.standard_normal(DIM)])
            for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), rows


def test_centroid_selection_deterministic(spark):
    vecs, _ = _vectors(spark)
    a = sorted(r.cid for r in select_centroids(vecs, 6).collect())
    b = sorted(r.cid for r in select_centroids(vecs, 6).collect())
    assert a == b and len(a) == 6


def test_assignment_partitions_vectors(spark):
    vecs, rows = _vectors(spark)
    cents = select_centroids(vecs, 6)
    cells = ivf_assign(vecs, cents).collect()
    assert len(cells) == len(rows)  # every vector assigned exactly once
    cids = {r.cid for r in cents.collect()}
    assert {r.cell for r in cells} <= cids


def test_assignment_matches_numpy_argmax(spark):
    vecs, rows = _vectors(spark)
    cent_df = select_centroids(vecs, 6)
    cents = {r.cid: np.asarray(r.cvec) for r in cent_df.collect()}
    got = {r.vec_id: r.cell for r in ivf_assign(vecs, cent_df).collect()}
    for vid, v in rows:
        v = np.asarray(v)
        best = max(
            cents.items(),
            key=lambda kv: (float(v @ kv[1] /
                                  (np.linalg.norm(v) * np.linalg.norm(kv[1]))),
                            -kv[0]),
        )[0]
        assert got[vid] == best, vid


def test_nprobe_all_cells_equals_brute_force(spark):
    from corpus_dedup_spark.operators.embedding_dedup import brute_force_topk

    vecs, _ = _vectors(spark, n=40)
    probes = vecs.filter("vec_id < 10")
    ivf = ivf_topk(vecs, probes, k=3, n_centroids=5, nprobe=5)
    bf = brute_force_topk(vecs, probes, k=3)
    key = lambda r: (r.probe_id, r.rank)  # noqa: E731
    a = {key(r): r.neighbor_id for r in ivf.collect()}
    b = {key(r): r.neighbor_id for r in bf.collect()}
    assert a == b


def test_planted_copy_recalled_at_small_nprobe(spark):
    # an exact copy lands in the same cell as its source (identical cosine
    # profile → identical argmax), so even nprobe=1 must rank it first
    vecs, rows = _vectors(spark, n=50)
    copies = [(1000 + i, v) for i, v in rows if i % 10 == 0]
    aug = spark.createDataFrame(
        rows + copies, ["vec_id", "embedding"])
    probes = aug.filter("vec_id >= 1000")
    top = ivf_topk(aug, probes, k=1, n_centroids=6, nprobe=1).collect()
    got = {r.probe_id: (r.neighbor_id, r.cosine) for r in top}
    assert len(got) == len(copies)
    for pid, (nid, cos) in got.items():
        assert nid == pid - 1000 and cos == pytest.approx(1.0)
