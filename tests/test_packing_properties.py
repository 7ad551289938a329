"""Property tests for sequence packing: distributed prefix sum ≡ naive cumsum,
and per-sequence occupancy conservation — under randomized shapes (hypothesis
drives the doc-length profile; Spark evaluation once per example set keeps the
suite fast by testing one drawn corpus per settings profile)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from corpus_dedup_spark.operators.packing import pack_sequences, sequence_stats

_TOKENS = st.integers(min_value=0, max_value=23)


@settings(max_examples=6, deadline=None)
@given(st.lists(_TOKENS, min_size=1, max_size=120), st.integers(2, 17),
       st.integers(2, 9))
def test_packing_matches_naive(spark, token_counts, seq_len, n_parts):
    docs = spark.createDataFrame(
        [(i, "w " * c) for i, c in enumerate(token_counts)],
        "doc_id BIGINT, text STRING",
    ).repartition(n_parts)
    got = {r["doc_id"]: r for r in
           pack_sequences(docs, seq_len=seq_len).collect()}
    run = 0
    for i, c in enumerate(token_counts):
        r = got[i]
        assert r["n_tokens"] == c
        assert r["tok_start"] == run
        if c == 0:
            assert r["seq_first"] is None and r["seq_last"] is None
        else:
            assert r["seq_first"] == run // seq_len
            assert r["seq_last"] == (run + c - 1) // seq_len
        run += c
    # occupancy conservation: per-sequence token fills sum to the corpus total
    stats = {r["seq_id"]: r for r in
             sequence_stats(pack_sequences(docs, seq_len=seq_len),
                            seq_len=seq_len).collect()}
    assert sum(r["n_tokens"] for r in stats.values()) == run
    if run:
        full = run // seq_len
        for s, r in stats.items():
            assert r["n_tokens"] == (seq_len if s < full else run % seq_len)
