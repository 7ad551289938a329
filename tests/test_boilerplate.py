"""Corpus-frequency boilerplate detection on planted fixtures."""

from corpus_dedup_spark.operators.boilerplate import boilerplate_ngram_stats


def test_boilerplate_bigrams_planted(spark):
    # "cookie banner" appears in 3 docs -> boilerplate at min_docs=3;
    # every other bigram is unique to its doc
    rows = [
        ("a", "alpha beta cookie banner gamma"),
        ("b", "delta cookie banner epsilon"),
        ("c", "zeta eta cookie banner"),
        ("d", "theta iota kappa"),
        ("e", "solo"),          # < 2 tokens -> zero grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_grams"], r["n_boiler"])
           for r in boilerplate_ngram_stats(df, n=2, min_docs=3).collect()}
    assert got == {
        "a": (4, 1),  # cookie-banner once among 4 positions
        "b": (3, 1),
        "c": (3, 1),
        "d": (2, 0),
        "e": (0, 0),
    }


def test_boilerplate_counts_positions_not_types(spark):
    # the same boilerplate gram twice in one doc counts twice (positional)
    rows = [
        ("a", "x y z x y"),  # grams: "x y","y z","z x","x y"
        ("b", "x y q"),
        ("c", "p x y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_grams"], r["n_boiler"])
           for r in boilerplate_ngram_stats(df, n=2, min_docs=3).collect()}
    assert got["a"] == (4, 2)  # "x y" boiler (3 docs), both positions counted
    assert got["b"] == (2, 1)
    assert got["c"] == (2, 1)


def test_trigram_mode(spark):
    rows = [("a", "one two three four"), ("b", "one two three"),
            ("c", "one two three")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_grams"], r["n_boiler"])
           for r in boilerplate_ngram_stats(df, n=3, min_docs=3).collect()}
    assert got == {"a": (2, 1), "b": (1, 1), "c": (1, 1)}


def test_repetition_stats_planted(spark):
    from corpus_dedup_spark.operators.boilerplate import repetition_ngram_stats

    rows = [
        ("a", "x y x y x y"),   # grams: xy yx xy yx xy -> 5 pos, 2 distinct, top 3
        ("b", "p q r s"),       # 3 pos, 3 distinct, top 1
        ("c", "solo"),          # 0 grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_grams"], r["n_distinct"], r["top_count"],
                         r["dup_frac_ppm"])
           for r in repetition_ngram_stats(df, n=2).collect()}
    assert got["a"] == (5, 2, 3, 600000)
    assert got["b"] == (3, 3, 1, 0)
    assert got["c"] == (0, 0, 0, 0)


def test_decontamination_planted(spark):
    from corpus_dedup_spark.operators.boilerplate import decontaminate_ngram_hits

    corpus = spark.createDataFrame([
        ("a", "the quick brown fox jumps"),       # contains bench trigram
        ("b", "totally unrelated words here"),
        ("c", "quick brown fox elsewhere too"),   # contains bench trigram
        ("d", "sly quick brown trap"),            # 'quick brown' bigram only
    ], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [("q1", "quick brown fox")], ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_hits"], r["is_contaminated"])
           for r in decontaminate_ngram_hits(corpus, bench, n=3).collect()}
    assert got == {"a": (1, 1), "b": (0, 0), "c": (1, 1), "d": (0, 0)}
