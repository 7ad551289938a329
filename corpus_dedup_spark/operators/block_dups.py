"""Cross-document shared-block detection — the suffix-array-prefix-grouping leg.

A classical suffix array groups suffixes by common prefix; at corpus scale the
equivalent Spark shape is: emit a rolling-hash fingerprint for every length-W window of
every document (H2 prefix tables make each window O(1)), then group by fingerprint —
windows sharing a hash are suffixes sharing a W-prefix. Documents co-occurring in a
group share a W-codepoint block; verified pairs (content equality, never hash trust —
quirk Q6) become block-dup edges, the same candidates→verify→edges shape as the LSH
leg (ref: the reference's Block Tree achieves intra-corpus block dedup via
sorted (block_id, length) group scans — src/block_tree_core.c:373-426; this operator is
its cross-document generalization).

Scale: the fingerprint table is (docs × chars) rows — big but narrow (id, pos, whash).
Hot fingerprints (boilerplate blocks) are capped like LSH buckets. A stride > 1
subsamples anchor positions on one side (guaranteeing detection of any shared block of
length >= window + stride - 1 via the anchor alignment trick: left side keeps every
position, right side strides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from corpus_dedup_spark.operators.search import build_fingerprint_index


def shared_block_pairs(pages: DataFrame, window: int = 64, stride: int = 1,
                       max_group: int = 2000, id_col: str = "url",
                       text_col: str = "text") -> DataFrame:
    """Pairs of documents sharing at least one verified W-codepoint block:
    (id_a, id_b, n_shared_windows).

    stride subsamples the probe side; verification compares the actual substrings via
    a join back to the texts.
    """
    idx = build_fingerprint_index(pages, window, id_col, text_col).persist()
    probe = idx if stride <= 1 else idx.filter(F.col("pos") % stride == 0)

    # cap pathological fingerprints (site boilerplate) — same skew treatment as the
    # LSH bucket cap (minhash_lsh.candidate_pairs): sizes via groupBy (map-side
    # partial combine), then a broadcast ANTI-join of the few hot fingerprints.
    # A window count would sort-shuffle the entire docs×chars fingerprint index
    # just to size groups.
    hot = (
        idx.groupBy("whash").agg(F.count("*").alias("grp_n"))
        .filter(F.col("grp_n") > max_group)
        .select("whash")
    )
    base = idx.join(F.broadcast(hot), "whash", "left_anti")
    probe = probe.join(F.broadcast(hot), "whash", "left_anti")

    left = base.select("whash", F.col(id_col).alias("id_a"), F.col("pos").alias("pos_a"))
    right = probe.select("whash", F.col(id_col).alias("id_b"), F.col("pos").alias("pos_b"))
    cand = (
        left.join(right, "whash")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "pos_a", "id_b", "pos_b")
    )

    texts = pages.select(id_col, F.translate(F.col(text_col), "\n\r", "  ").alias("_t"))
    verified = (
        cand.join(texts.withColumnRenamed(id_col, "id_a")
                       .withColumnRenamed("_t", "t_a"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b")
                   .withColumnRenamed("_t", "t_b"), "id_b")
        .where(
            F.substring(F.col("t_a"), (F.col("pos_a") + 1).cast("int"), window)
            == F.substring(F.col("t_b"), (F.col("pos_b") + 1).cast("int"), window)
        )
    )
    return (
        verified.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_windows"))
    )
