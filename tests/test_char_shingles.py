"""Char-ngram shingle mode: exact-dup guarantee + sensitivity to small edits."""

import pyspark.sql.functions as F

from corpus_dedup_spark.config import DedupConfig
from corpus_dedup_spark.operators.minhash_lsh import doc_features, near_dup_edges


def test_char_mode_signatures(spark):
    cfg = DedupConfig(shingle_level="char", char_ngram=5, jaccard_threshold=0.5)
    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog tonight"),
         ("b", "the quick brown fox jumps over the lazy dog tonight"),
         ("c", "the quick brown fox jumps over the lazy cat tonight"),
         ("d", "completely unrelated text with nothing shared here")],
        ["url", "text"])
    import numpy as np

    feats = {r["url"]: r for r in doc_features(df, cfg).collect()}
    assert feats["a"]["sig"] == feats["b"]["sig"]          # exact dup guarantee
    assert feats["a"]["shingles"] == feats["b"]["shingles"]

    def shingle_set(url):  # shingles are packed u64 blobs
        return set(np.frombuffer(bytes(feats[url]["shingles"]), np.uint64).tolist())

    # one-word edit: most 5-gram shingles shared, but not all
    sa, sc = shingle_set("a"), shingle_set("c")
    j = len(sa & sc) / len(sa | sc)
    assert 0.6 < j < 1.0
    sd = shingle_set("d")
    assert len(sa & sd) / len(sa | sd) < 0.3


def test_char_mode_pipeline_finds_near_dups(spark):
    cfg = DedupConfig(shingle_level="char", char_ngram=5, jaccard_threshold=0.6)
    df = spark.createDataFrame(
        [("a", "The quick brown fox jumps over the lazy dog. " * 5),
         ("b", "The quick brown fox jumps over the lazy cat. " * 5),
         ("z", "Entirely different content in this document body. " * 5)],
        ["url", "text"])
    verified, _, _ = near_dup_edges(df, cfg)
    pairs = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert ("a", "b") in pairs
    assert all("z" not in p for p in pairs)
