"""MinHash/LSH near-dup detection: exact-dup guarantee + planted-truth recall."""

import pyspark.sql.functions as F
import pytest

from corpus_dedup_spark.config import DedupConfig
from corpus_dedup_spark.operators.minhash_lsh import (band_explode,
                                                      candidate_pairs,
                                                      doc_features,
                                                      near_dup_clusters,
                                                      near_dup_edges)
from corpus_dedup_spark.sources.pages import pages_spark


@pytest.fixture(scope="module")
def cfg():
    return DedupConfig(jaccard_threshold=0.35)


@pytest.fixture(scope="module")
def planted(spark):
    df, truth_pairs, clusters = pages_spark(spark, n_docs=300, seed=7)
    return df.cache(), truth_pairs, clusters


def test_identical_docs_identical_signatures(spark, cfg):
    df = spark.createDataFrame(
        [("a", "One sentence here. Two sentences here. Third one now."),
         ("b", "One sentence here. Two sentences here. Third one now."),
         ("c", "Completely different text. Nothing shared at all. Zilch.")],
        ["url", "text"])
    feats = doc_features(df, cfg).collect()
    by_url = {r["url"]: r for r in feats}
    assert by_url["a"]["sig"] == by_url["b"]["sig"]
    assert by_url["a"]["sig"] != by_url["c"]["sig"]
    assert by_url["a"]["shingles"] == by_url["b"]["shingles"]


def test_exact_pairs_recall_is_one(spark, cfg, planted):
    """The reference's exact-dup semantics are the floor: recall on planted
    whole-doc-exact pairs must be 1.0 (identical sigs ⇒ same buckets ⇒ J=1)."""
    df, truth_pairs, _ = planted
    verified, _, _ = near_dup_edges(df, cfg)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    exact = truth_pairs[truth_pairs["kind"] == "exact"]
    missed = [
        (a, b) for a, b in zip(exact["url_a"], exact["url_b"])
        if (min(a, b), max(a, b)) not in got
    ]
    assert not missed, f"missed {len(missed)}/{len(exact)} exact pairs: {missed[:5]}"


def test_near_pairs_recall(spark, cfg, planted):
    """Recall on planted near pairs, conditioned on true shingle Jaccard ≥ 0.7
    (32 bands × 4 rows: P(candidate | J=0.7) ≈ 0.9998, | J=0.8) ≈ 1-5e-8; pairs
    below the LSH s-curve knee are out of contract — the ≥0.99 north-rule target
    is vs the REFERENCE's assignments, i.e. exact dups, covered by
    test_exact_pairs_recall_is_one)."""
    from corpus_dedup_spark import kernel
    from corpus_dedup_spark.functions.udfs import _shingle_hashes

    df, truth_pairs, _ = planted
    texts = {r["url"]: r["text"] for r in df.select("url", "text").collect()}

    def shingles(url):
        uh = kernel.fnv1a_many(kernel.extract_units(texts[url].encode()))
        return set(_shingle_hashes(uh, cfg.shingle_k).tolist())

    near = truth_pairs[truth_pairs["kind"] == "near"]
    eligible = []
    for a, b in zip(near["url_a"], near["url_b"]):
        sa, sb = shingles(a), shingles(b)
        j = len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0
        if j >= 0.7:
            eligible.append((min(a, b), max(a, b)))
    if not eligible:
        pytest.skip("no near pairs above J=0.7")
    verified, _, _ = near_dup_edges(df, cfg)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    hit = sum(p in got for p in eligible)
    recall = hit / len(eligible)
    assert recall >= 0.99, f"near-dup recall {recall:.3f} ({hit}/{len(eligible)})"


def test_clusters_cover_exact_groups(spark, cfg, planted):
    df, truth_pairs, truth_clusters = planted
    out = near_dup_clusters(df, cfg)
    got = {r["url"]: r["cluster_id"] for r in out.collect()}
    assert set(got) == set(truth_clusters["url"])  # every page labeled
    # all members of a planted exact-dup group share one engine cluster
    exact = truth_pairs[truth_pairs["kind"] == "exact"]
    for a, b in zip(exact["url_a"], exact["url_b"]):
        assert got[a] == got[b], (a, b)


def test_skew_cap_drops_hot_buckets(spark, planted):
    df, _, _ = planted
    tiny_cap = DedupConfig(jaccard_threshold=0.35, max_bucket_size=2)
    feats = doc_features(df, tiny_cap)
    bands_df = band_explode(feats, tiny_cap)
    pairs, dropped = candidate_pairs(bands_df, tiny_cap)
    assert dropped.count() > 0  # exact-dup groups of 3+ exceed cap
    # pairs still computable and bounded
    assert pairs.count() >= 0
