"""Sequence packing, as-of join, and corpus-LM quality — unit tests.

The sf0.01 driver contract value-checks these against DuckDB end-to-end
(queries sequence_pack / packed_seq_stats / asof_purchase / unigram_lm /
topk_terms); these tests pin the hand-checkable semantics and the edge cases
the synthetic tables do not contain (blank docs, keys with no earlier match,
equal-timestamp ties).
"""

import datetime

from pyspark.sql import functions as F

from corpus_dedup_spark.operators.asof import asof_join
from corpus_dedup_spark.operators.lm_quality import (top_terms_per_doc,
                                                     unigram_lm_scores)
from corpus_dedup_spark.operators.packing import (global_token_offsets,
                                                  pack_sequences,
                                                  sequence_stats)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def test_offsets_are_exclusive_prefix_sum(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "d e"), (3, "f"), (4, "g h i j")])
    got = {r["doc_id"]: (r["n_tokens"], r["tok_start"])
           for r in global_token_offsets(docs).collect()}
    assert got == {1: (3, 0), 2: (2, 3), 3: (1, 5), 4: (4, 6)}


def test_offsets_distributed_matches_naive(spark):
    # 300 docs over many range partitions: the partition-base re-anchoring
    # must reproduce the naive single-window cumsum exactly.
    docs = _docs(spark, [(i, "t " * (i % 7)) for i in range(300)])
    got = {r["doc_id"]: r["tok_start"]
           for r in global_token_offsets(docs, num_partitions=16).collect()}
    run = 0
    for i in range(300):
        assert got[i] == run
        run += i % 7


def test_blank_docs_occupy_no_sequence(spark):
    docs = _docs(spark, [(1, "a b"), (2, "   "), (3, ""), (4, "c")])
    rows = {r["doc_id"]: r for r in pack_sequences(docs, seq_len=4).collect()}
    assert rows[2]["n_tokens"] == 0 and rows[2]["seq_first"] is None
    assert rows[3]["seq_last"] is None
    # blank docs consume no token slots: doc 4 starts right after doc 1
    assert rows[4]["tok_start"] == 2 and rows[4]["seq_first"] == 0


def test_sequence_stats_full_windows_sum_to_seq_len(spark):
    docs = _docs(spark, [(i, "w " * 5) for i in range(20)])  # 100 tokens
    stats = {r["seq_id"]: (r["n_docs"], r["n_tokens"])
             for r in sequence_stats(pack_sequences(docs, seq_len=8),
                                     seq_len=8).collect()}
    assert sum(n for _, n in stats.values()) == 100
    # 100 tokens / L=8 → 12 full windows of 8 and one final window of 4
    assert all(n == 8 for s, (_, n) in stats.items() if s < 12)
    assert stats[12] == (1, 4)  # doc 19's tail
    # a 5-token doc straddles at most two 8-token windows
    assert all(d <= 2 + 8 // 5 for d, _ in stats.values())


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def _ts(s):
    return datetime.datetime(2026, 1, 1, 0, 0, s)


def test_asof_strictly_earlier_and_ties(spark):
    left = spark.createDataFrame(
        [(10, 1, _ts(5)), (11, 1, _ts(10)), (12, 2, _ts(3))],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(100, 1, _ts(5), 1.5),   # equal ts to event 10 → must NOT match it
         (101, 1, _ts(2), 2.5),
         (102, 1, _ts(5), 3.5)],  # same ts as 100: greater id wins for event 11
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    out = {r["event_id"]: r for r in asof_join(
        left, right.select("user_id", "ts", "event_id", "value"),
        key_col="user_id", ts_col="ts", left_id_col="event_id",
        right_id_col="event_id", right_payload_cols=("value",)).collect()}
    assert out[10]["asof_event_id"] == 101          # strict <: ts(5) excluded
    assert out[11]["asof_event_id"] == 102          # tie at ts(5) → max id
    assert out[11]["asof_value"] == 3.5
    assert out[12]["asof_event_id"] is None         # user 2 has no purchases


# ---------------------------------------------------------------------------
# corpus-LM quality + top-k terms
# ---------------------------------------------------------------------------

def test_unigram_lm_hand_case(spark):
    # corpus counts: the=4 (class 2), cat=2 (class 1), dog=1, sat=1 (class 0)
    docs = _docs(spark, [(1, "the cat the dog"), (2, "the cat the sat")])
    got = {r["doc_id"]: (r["n_tokens"], r["sum_freq_class"])
           for r in unigram_lm_scores(docs).collect()}
    assert got == {1: (4, 2 + 1 + 2 + 0), 2: (4, 2 + 1 + 2 + 0)}


def test_topk_terms_ranking(spark):
    # doc 1: b×3, a×2, c×1; c is corpus-rarer than a (df 1 vs 2)
    docs = _docs(spark, [(1, "b b b a a c"), (2, "a zz")])
    got = [(r["term"], r["tf"], r["df"]) for r in
           top_terms_per_doc(docs, k=2).filter(F.col("doc_id") == 1)
           .orderBy("rank").collect()]
    assert got == [("b", 3, 1), ("a", 2, 2)]  # tf dominates df
    # within equal tf, the corpus-rarer term outranks: make a and c tie on tf
    docs2 = _docs(spark, [(1, "a a c c"), (2, "a zz")])
    got2 = [r["term"] for r in
            top_terms_per_doc(docs2, k=2).filter(F.col("doc_id") == 1)
            .orderBy("rank").collect()]
    assert got2 == ["c", "a"]  # tf tie (2,2): c has df 1 < a's df 2
