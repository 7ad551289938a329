"""IVF (inverted-file) approximate nearest neighbour over an embedding column.

The third rung of the similarity ladder (after brute-force and hyperplane LSH in
operators/embedding_dedup.py): partition the vector space into K cells around
centroids, assign every vector to its nearest centroid, and answer a query by
scanning only the ``nprobe`` cells whose centroids are nearest the query — the
classic IVF-Flat index (Johnson, Douze, Jégou 2017, "Billion-scale similarity
search with GPUs"), re-expressed as three DataFrame joins:

1. **centroid selection** — deterministic seeded sampling: the K vectors with
   the smallest Knuth multiplicative hash of their id. Sampling (instead of
   k-means iterations) keeps the index exactly SQL-replayable and is the
   standard warm-start; a k-means refinement would slot in behind the same
   (cid, cvec) contract.
2. **assignment** — broadcast the K centroids (K ≪ N always), score cosine
   against each, keep the argmax per vector via a partial-combining
   ``max(struct(cos, -cid))`` aggregate — one map-side-combined shuffle of
   (id, cell), never a window over the N×K cross product.
3. **probe** — each query ranks the same K broadcast centroids and searches its
   ``nprobe`` best cells: candidates = probes ⋈ assignments on cell. Every
   vector lives in exactly one cell, so candidate pairs are duplicate-free by
   construction (no distinct needed, unlike multi-table LSH).

At 100 TB nothing here is all-pairs: the only full-width shuffle carries
(id, cell) longs, and the verify join fans out to ~nprobe·N/K exact cosine
evaluations per query — the IVF contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from corpus_dedup_spark.operators.embedding_dedup import _cosine_expr

# Knuth multiplicative hash constant (2^32 / golden ratio) — also in the oracle
_KNUTH = 2654435761
_MOD = 4294967296


def select_centroids(vectors: DataFrame, n_centroids: int,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(cid, cvec): deterministic seeded sample of ``n_centroids`` vectors.

    Order by (knuth_hash(id), id) and take the head — a total order, so the
    centroid set is reproducible across engines and cluster sizes.
    TakeOrderedAndProject keeps this a single pass at any N.
    """
    h = (F.col(id_col).cast("long") * F.lit(_KNUTH)) % F.lit(_MOD)
    return (
        vectors.select(F.col(id_col).alias("cid"),
                       F.col(vec_col).alias("cvec"),
                       h.alias("_h"))
        .orderBy("_h", "cid")
        .limit(n_centroids)
        .drop("_h")
    )


def _centroid_scores(vectors: DataFrame, centroids: DataFrame,
                     id_col: str, vec_col: str) -> DataFrame:
    """(id, cid, _cos): every vector scored against every broadcast centroid."""
    return (
        vectors.select(id_col, vec_col)
        .join(F.broadcast(centroids))
        .withColumn("_cos", _cosine_expr(F.col(vec_col), F.col("cvec")))
        .select(id_col, "cid", "_cos")
    )


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, cell): nearest centroid per vector (ties → smallest cid).

    argmax as a partial-combining aggregate — ``max(struct(cos, -cid))`` —
    not a row_number window: the N×K scored stream collapses map-side to one
    row per vector before the exchange.
    """
    scored = _centroid_scores(vectors, centroids, id_col, vec_col)
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("_cos").alias("c"),
                       (-F.col("cid")).alias("nc"))).alias("m"))
    return best.select(id_col, (-F.col("m.nc")).alias("cell"))


def ivf_topk(vectors: DataFrame, probes: DataFrame, k: int = 10,
             n_centroids: int = 64, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(probe_id, neighbor_id, cosine, rank): IVF-Flat approximate top-k.

    ``probes`` is a subset of ``vectors`` (or any DataFrame with the same
    id/vec columns). Recall rises with nprobe (nprobe = n_centroids recovers
    exact brute force); candidate cost per probe is ~nprobe·N/n_centroids.
    """
    centroids = select_centroids(vectors, n_centroids, id_col, vec_col)
    cells = ivf_assign(vectors, centroids, id_col, vec_col)

    pw = Window.partitionBy("probe_id").orderBy(F.col("_cos").desc(),
                                                F.col("cid").asc())
    probe_cells = (
        _centroid_scores(probes, centroids, id_col, vec_col)
        .withColumnRenamed(id_col, "probe_id")
        .withColumn("_rn", F.row_number().over(pw))
        .filter(F.col("_rn") <= nprobe)
        .select("probe_id", F.col("cid").alias("cell"))
    )
    # each vector is in exactly one cell → the join below cannot duplicate a
    # (probe, neighbor) pair, so no distinct stage is needed
    cand = (
        probe_cells.join(cells.withColumnRenamed(id_col, "neighbor_id"), "cell")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id")
    )
    v = vectors.select(F.col(id_col), F.col(vec_col))
    scored = (
        cand.join(v.select(F.col(id_col).alias("probe_id"),
                           F.col(vec_col).alias("pv")), "probe_id")
        .join(v.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("nv")), "neighbor_id")
        .withColumn("cosine", _cosine_expr(F.col("pv"), F.col("nv")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )
