"""semantic_dedup (SemDeDup within IVF cells): keep rules, cluster locality."""

import math

import pytest
from pyspark.sql import functions as F

from corpus_dedup_spark.operators.semantic_dedup import semantic_dedup


def _vdf(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# Two well-separated directions in 4-d so every id lands in a predictable cell
E1 = [1.0, 0.0, 0.0, 0.0]
E2 = [0.0, 1.0, 0.0, 0.0]


def _mix(a, b, t):
    """Unit vector t of the way from direction a to direction b."""
    v = [ai * (1 - t) + bi * t for ai, bi in zip(a, b)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


class TestSemanticDedup:
    def test_exact_copy_dropped_first_wins(self, spark):
        df = _vdf(spark, [(1, E1), (2, E1), (3, E2)])
        out = {r["vec_id"]: r["kept"]
               for r in semantic_dedup(df, 0.9, n_centroids=2).collect()}
        assert out == {1: 1, 2: 0, 3: 1}

    def test_opposite_direction_kept(self, spark):
        df = _vdf(spark, [(1, E1), (2, [-x for x in E1])])
        out = {r["vec_id"]: r["kept"]
               for r in semantic_dedup(df, 0.9, n_centroids=2).collect()}
        assert out[1] == 1 and out[2] == 1

    def test_triple_keeps_only_smallest(self, spark):
        df = _vdf(spark, [(1, E1), (2, E1), (3, E1)])
        out = {r["vec_id"]: r["kept"]
               for r in semantic_dedup(df, 0.9, n_centroids=1).collect()}
        assert out == {1: 1, 2: 0, 3: 0}

    def test_drop_on_any_earlier_mate(self, spark):
        """Documented variant: z is dropped by its >τ neighbor y even though
        y itself was dropped by x (x–z stays below τ)."""
        th = math.radians(20)
        ang = lambda t: [math.cos(t), math.sin(t), 0.0, 0.0]
        x, y, z = ang(0), ang(th), ang(2 * th)
        df = _vdf(spark, [(1, x), (2, y), (3, z)])
        cos = lambda a, b: sum(p * q for p, q in zip(a, b))
        tau = 0.9  # cos 20° ≈ 0.94 > τ > cos 40° ≈ 0.77
        assert cos(x, y) > tau and cos(y, z) > tau and cos(x, z) < tau
        out = {r["vec_id"]: r["kept"]
               for r in semantic_dedup(df, tau, n_centroids=1).collect()}
        assert out == {1: 1, 2: 0, 3: 0}

    def test_cells_isolate_comparisons(self, spark):
        """Identical vectors in DIFFERENT cells are both kept — the SemDeDup
        approximation is exactly 'compare within a cluster only'."""
        df = _vdf(spark, [(1, E1), (2, E2), (3, E1), (4, E2),
                          (5, E1), (6, E2)])
        out = semantic_dedup(df, 0.9, n_centroids=2)
        rows = {r["vec_id"]: (r["cell"], r["kept"]) for r in out.collect()}
        cells = {v: c for v, (c, _) in rows.items()}
        # E1-ids share a cell; E2-ids share the other
        assert cells[1] == cells[3] == cells[5] != cells[2] == cells[4] == cells[6]
        # within each cell, only the smallest id survives
        assert [rows[i][1] for i in range(1, 7)] == [1, 1, 0, 0, 0, 0]

    def test_every_input_row_appears(self, spark):
        df = _vdf(spark, [(i, _mix(E1, E2, (i % 10) / 10.0))
                          for i in range(40)])
        out = semantic_dedup(df, 0.999, n_centroids=4)
        assert out.count() == 40
        assert out.select("vec_id").distinct().count() == 40

    def test_plan_broadcasts_centroids_no_cartesian(self, spark):
        df = _vdf(spark, [(i, _mix(E1, E2, (i % 10) / 10.0))
                          for i in range(40)])
        plan = semantic_dedup(df, 0.9, n_centroids=4) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


class TestCellSizeContract:
    def test_default_k_grows_with_n(self, spark):
        """r6: n_centroids=None derives K = ceil(N / TARGET_CELL_SIZE)
        (clamped to >= 16) from a count, enforcing the SemDeDup K-grows-with-N
        contract instead of the r5 flat default of 64."""
        from corpus_dedup_spark.operators import semantic_dedup as sd

        n = 5 * sd.TARGET_CELL_SIZE
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(F.rand(seed=7), F.rand(seed=11), F.rand(seed=13),
                    F.rand(seed=17)).alias("embedding"))
        out = sd.semantic_dedup(df, threshold=0.999)
        # K cells actually materialize: the largest observed cell stays near
        # TARGET_CELL_SIZE, nowhere near the N-sized cells a flat K allows
        sizes = (out.groupBy("cell").count().agg(F.max("count")).collect()[0][0])
        assert out.count() == n
        assert sizes < 4 * sd.TARGET_CELL_SIZE

    def test_explicit_k_untouched(self, spark):
        """An explicit n_centroids must behave exactly as before (the oracle
        replay pins one)."""
        df = _vdf(spark, [(1, E1), (2, E1), (3, E2)])
        out = {r["vec_id"]: r["kept"]
               for r in semantic_dedup(df, 0.9, n_centroids=64).collect()}
        assert out == {1: 1, 2: 0, 3: 1}
