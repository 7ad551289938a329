"""C4-style boilerplate n-gram detection — corpus-frequency text cleaning.

The C4 pipeline drops any line that occurs in 3+ documents of the corpus
(Raffel et al. 2020, "Exploring the Limits of Transfer Learning", §2.2); the
same rule at n-gram granularity flags navigation chrome, cookie banners and
share buttons that exact-duplicate *fragments* across hosts without the whole
document duplicating. The reference engine has no corpus-frequency filter
(its dedup is first-wins identity); this is LLM-pipeline extension surface.

Spark shape (scales to 10^12 docs):
- one ``explode`` of per-doc n-grams (pure JVM expressions — split/
  transform/sequence, no Python),
- the boilerplate set = ``distinct (gram, doc) → groupBy(gram) count ≥ K``:
  one shuffle with map-side partial distinct; the ``≥ K`` filter collapses
  the long tail before anything is joined,
- per-doc counts via a left join against that set — AQE picks broadcast when
  the surviving set is small (typical: boilerplate is a tiny head of the
  gram distribution) and falls back to a shuffle join when it is not.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def ngram_array(text: Column, n: int = 2) -> Column:
    """Positional word n-grams of a single-spaced text column (empty tokens
    dropped, same tokenization as the bigram/token queries)."""
    toks = F.filter(F.split(text, " "), lambda x: x != "")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def boilerplate_ngram_stats(docs: DataFrame, n: int = 2, min_docs: int = 3,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Per-document boilerplate exposure: ``(id, n_grams, n_boiler)`` where
    ``n_boiler`` counts gram POSITIONS whose gram occurs in ``min_docs``+
    distinct documents. Downstream policy (drop grams, drop docs over a
    threshold, reweight) composes on top; this operator only measures."""
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(ngram_array(F.col(text_col), n)).alias("g"))
    boiler = (
        base.distinct()
        .groupBy("g").agg(F.count("*").alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("g", F.lit(1).alias("_b")))
    per = (
        base.join(boiler, "g", "left")
        .groupBy("_id")
        .agg(F.count("*").alias("n_grams"),
             F.sum(F.coalesce(F.col("_b"), F.lit(0))).alias("n_boiler")))
    return (
        docs.select(F.col(id_col).alias("_id")).join(per, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"))
    )
