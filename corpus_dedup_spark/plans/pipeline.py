"""Checkpointed, lineage-tracked, resumable dedup pipeline (north rule: "each stage
checkpoints ... with per-partition lineage rows (partition id, input span, signature
config hash, counters) so runs resume mid-pipeline").

Locally stages persist as parquet directories under ``work_dir`` (an Iceberg catalog is
the production target — the layout below is Iceberg-shaped: one table per stage plus an
append-only ``lineage`` table; swapping ``_write``/``_read`` for ``writeTo(...)`` /
``spark.table(...)`` is the only change needed).

Resume contract: a stage directory with Spark's ``_SUCCESS`` marker AND a matching
``config_hash`` in its stage metadata is reused; anything else is recomputed. Stage
outputs are deterministic (keeper rule is orderBy(url, unit_idx); cluster ids are min —
SURVEY quirk Q3 made deterministic), so resumed and fresh runs are byte-equivalent.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corpus_dedup_spark.config import DedupConfig

STAGES = ("units", "deduped", "features", "edges", "clusters")


class DedupPipeline:
    """End-to-end: pages → exact unit dedup → near-dup LSH edges → clusters."""

    def __init__(self, spark: SparkSession, cfg: DedupConfig, work_dir: str,
                 run_id: str | None = None):
        self.spark = spark
        self.cfg = cfg
        self.work_dir = work_dir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(work_dir, exist_ok=True)

    # -- storage helpers (parquet locally; Iceberg writeTo in production) --

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.work_dir, stage)

    def _meta_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, f"{stage}.meta.json")

    def stage_is_complete(self, stage: str) -> bool:
        d = self._stage_dir(stage)
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            return False
        try:
            with open(self._meta_path(stage)) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return meta.get("config_hash") == self.cfg.config_hash()

    def _write(self, df: DataFrame, stage: str) -> DataFrame:
        t0 = time.time()
        d = self._stage_dir(stage)
        df.write.mode("overwrite").parquet(d)
        out = self.spark.read.parquet(d)
        self._record_lineage(out, stage, wall_ms=int((time.time() - t0) * 1000))
        with open(self._meta_path(stage), "w") as f:
            json.dump({"config_hash": self.cfg.config_hash(),
                       "run_id": self.run_id,
                       "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                       }, f)
        return out

    def _read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._stage_dir(stage))

    def _record_lineage(self, df: DataFrame, stage: str, wall_ms: int) -> None:
        """Per-partition lineage rows: (run_id, stage, partition_id, input_span,
        config_hash, counters, created_at)."""
        per_part = (
            df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.count("*").alias("rows_out"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.col("_pid").alias("partition_id"),
                F.lit(self._stage_dir(stage)).alias("input_span"),
                F.lit(self.cfg.config_hash()).alias("config_hash"),
                F.create_map(
                    F.lit("rows_out"), F.col("rows_out").cast("long"),
                    F.lit("wall_ms"), F.lit(wall_ms).cast("long"),
                ).alias("counters"),
                F.current_timestamp().alias("created_at"),
            )
        )
        per_part.write.mode("append").parquet(os.path.join(self.work_dir, "lineage"))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.work_dir, "lineage"))

    # -- stages --

    def run(self, pages: DataFrame, id_col: str = "url") -> dict[str, DataFrame]:
        from corpus_dedup_spark.operators.exact_dedup import (explode_units_arrow,
                                                              mark_duplicates,
                                                              reassemble)
        from corpus_dedup_spark.operators.connected_components import (
            attach_labels, connected_components)
        from corpus_dedup_spark.operators.minhash_lsh import (band_explode,
                                                              candidate_pairs,
                                                              doc_features,
                                                              verify_jaccard)

        out: dict[str, DataFrame] = {}

        if self.stage_is_complete("units"):
            out["units"] = self._read("units")
        else:
            marked = mark_duplicates(
                explode_units_arrow(pages, self.cfg.mode, self.cfg.max_length,
                              id_col=id_col), id_col)
            out["units"] = self._write(marked, "units")

        if self.stage_is_complete("deduped"):
            out["deduped"] = self._read("deduped")
        else:
            kept = out["units"].filter(~F.col("is_dup")).drop("is_dup")
            out["deduped"] = self._write(reassemble(kept, id_col), "deduped")

        if self.stage_is_complete("features"):
            out["features"] = self._read("features")
        else:
            out["features"] = self._write(
                doc_features(pages, self.cfg, id_col), "features")

        if self.stage_is_complete("edges"):
            out["edges"] = self._read("edges")
        else:
            pairs, _dropped = candidate_pairs(
                band_explode(out["features"], self.cfg, id_col), self.cfg, id_col)
            verified = verify_jaccard(pairs, out["features"], self.cfg, id_col)
            edges = verified.filter(
                F.col("jaccard") >= F.lit(self.cfg.jaccard_threshold))
            out["edges"] = self._write(edges, "edges")

        if self.stage_is_complete("clusters"):
            out["clusters"] = self._read("clusters")
        else:
            labels = connected_components(
                out["edges"].select(F.col("id_a").alias("src"),
                                    F.col("id_b").alias("dst")))
            clusters = attach_labels(pages.select(id_col), labels, id_col).select(
                id_col, "cluster_id")
            out["clusters"] = self._write(clusters, "clusters")

        return out
