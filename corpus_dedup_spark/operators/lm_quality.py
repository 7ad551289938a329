"""Corpus-statistics language-model quality scoring — CCNet-style, made
engine-exact.

CCNet (Wenzek et al. 2020) buckets web pages by the perplexity of a small LM;
the cheap self-contained analog is a **corpus unigram model**: rare-word-heavy
gibberish scores low, common-word prose scores high. A float
``avg(log p(token))`` is NOT reproducible across engines (double summation is
order-dependent), so the score here is built from integers that both engines
compute identically:

- per-token frequency class ``floor(log2(corpus_count))`` — an exact integer
  for counts < 2^40 (the true log2 is never within 1e-9 of an integer unless
  the count is a power of two, where IEEE log2 is exact; libm variance is
  ~1e-16),
- per-doc ``sum(class)`` and ``n_tokens`` as BIGINTs; the consumer divides.

Scale shape: one token-keyed aggregation builds the vocabulary (map-side
partial combine collapses each task's repeats first — Zipf makes that a huge
reduction), then the class table joins back onto the token stream. The
vocabulary of even a 10^12-doc corpus is orders of magnitude smaller than the
token stream, and the ≥min_count filter truncates the long tail, so AQE
broadcasts it; the token stream itself is never shuffled twice.

Also here: ``top_terms_per_doc`` — the k most distinguishing terms per
document, ranked by (tf DESC, df ASC, term ASC). The usual formulation is
TF-IDF, a float product; ranking by the raw integer pair is the same order
for fixed tf (IDF is monotone-decreasing in df) and is exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Lowercased alphabetic word grain — identical under Java regex and RE2.
_WORD_RE = r"[a-z]+"


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token): exploded lowercase word stream."""
    return docs.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)),
                                       F.lit(_WORD_RE), F.lit(0))).alias("token"),
    )


def unigram_class_table(tokens: DataFrame, min_count: int = 1) -> DataFrame:
    """(token, freq_class): floor(log2(corpus count)) per vocabulary entry."""
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") >= min_count)
        .select("token",
                F.floor(F.log2(F.col("_cnt"))).cast("bigint")
                 .alias("freq_class"))
    )


def unigram_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      min_count: int = 1) -> DataFrame:
    """(id, n_tokens, sum_freq_class): integer-exact unigram LM quality score.

    ``sum_freq_class / n_tokens`` is the mean log2 corpus frequency of the
    document's tokens — high for stopword-rich natural prose, low for rare-
    token noise; the CCNet perplexity bucket boundary becomes a threshold on
    this ratio. Tokens below ``min_count`` fall out of the vocabulary and
    score class 0 (coalesce), the OOV convention."""
    tokens = _doc_tokens(docs, id_col, text_col)
    classes = unigram_class_table(tokens, min_count)
    return (
        tokens.join(classes, "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("freq_class"), F.lit(0)))
             .alias("sum_freq_class"),
        )
    )


def top_terms_per_doc(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id, term, tf, df, rank): the k most distinguishing terms per doc.

    Rank order (tf DESC, df ASC, term ASC) — most frequent in THIS doc,
    rarest across the corpus, lexicographic tiebreak. The per-doc window is
    bounded by the document's own vocabulary (no corpus-scale skew); df
    comes from a distinct-pair aggregation whose map-side combine collapses
    within-task repeats before the shuffle."""
    tf = (
        _doc_tokens(docs, id_col, text_col)
        .groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    )
    df_tbl = (
        tf.groupBy("token").agg(F.count("*").alias("df"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token").asc())
    return (
        tf.join(df_tbl, "token")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("token").alias("term"), "tf", "df", "rank")
    )
