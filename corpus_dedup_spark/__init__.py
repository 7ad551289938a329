"""corpus_dedup_spark — a PySpark-native corpus deduplication + clustering engine.

From-scratch Spark-first reimplementation of the capabilities of the reference corpus
dedup engine (exact unit-level dedup, block-fingerprint substring matching, verify,
search) generalized to web-scale near-dup detection: MinHash/LSH, SimHash, n-gram
Jaccard, embedding cosine, connected-components clustering, with checkpointed,
lineage-tracked, resumable stages.
"""

__version__ = "0.1.0"
