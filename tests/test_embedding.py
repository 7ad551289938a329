"""Embedding similarity: brute-force exactness, LSH-ANN recall, dup pairs."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from corpus_dedup_spark.operators.embedding_dedup import (brute_force_topk,
                                                          embedding_dup_pairs,
                                                          lsh_ann_topk)


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_brute_force_matches_numpy(spark, vectors):
    rows = vectors.collect()
    embs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(embs)
    mat = np.stack([embs[i] / np.linalg.norm(embs[i]) for i in ids])
    probes = vectors.filter(F.col("vec_id") < 5)
    got = brute_force_topk(vectors, probes, k=3).collect()
    for pid in range(5):
        sims = mat @ mat[ids.index(pid)]
        order = sorted(((float(-s), i) for i, s in zip(ids, sims) if i != pid))
        expected = [i for _, i in order[:3]]
        mine = [r["neighbor_id"] for r in sorted(
            (x for x in got if x["probe_id"] == pid), key=lambda r: r["rank"])]
        assert mine == expected, pid


def test_lsh_ann_recall_on_planted_neighbors(spark):
    """ANN must find planted close neighbors (cos ≈ 0.99). Random vectors have no
    angularly-close top-1, so recall is measured on planted structure — the workload
    ANN exists for."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 32)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(200)]
    for i in range(30):  # planted neighbor of vector i is id 1000+i
        noisy = base[i] + rng.standard_normal(32).astype(np.float32) * 0.05
        rows.append((1000 + i, noisy.tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    ann = lsh_ann_topk(df, k=1, n_planes=8, n_tables=4).collect()
    got = {r["probe_id"]: r["neighbor_id"] for r in ann}
    hits = sum(got.get(1000 + i) == i for i in range(30))
    assert hits / 30 >= 0.9, f"ANN planted-neighbor recall {hits}/30"


def test_embedding_dup_pairs_finds_planted(spark):
    import pandas as pd
    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    dup = base[7] + rng.standard_normal(16).astype(np.float32) * 0.01
    rows = [(i, base[i].tolist()) for i in range(50)] + [(99, dup.tolist())]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_dup_pairs(df, threshold=0.98, n_planes=8).collect()
    assert any(r["id_a"] == 7 and r["id_b"] == 99 for r in pairs)
