"""Block-tree construction + rolling-hash substring machinery, as DataFrames.

Spark-first reformulation of the reference's Block Tree (ref: src/block_tree_core.c:
443-561; README.md:17-29): a per-level driver loop where each level is one DataFrame —
(url, level, start_pos, length, block_id, is_marked, target_pos) — built by

1. partitioning each marked node into s (level 1) / tau (deeper) children, last child
   absorbing the remainder (src/block_tree_core.c:473-527);
2. hashing all candidate blocks with the base-31 mod 2^64 polynomial rolling hash over
   UTF-32 codepoints via per-doc prefix tables (H2/H3, src/block_tree_core.c:90-201),
   vectorized in one pandas UDF per document;
3. leader election per (url, block_id, block_id2, length): min(start_pos) wins; later
   nodes become pointer nodes (is_marked=false, target_pos=leader.start_pos). Equality
   is verified under TWO independent 64-bit rolling hashes (~2^-128 collision odds)
   instead of the reference's content compare (quirk Q6, src/block_tree_core.c:
   320-349,411) — a per-level join against the text column would shuffle the whole
   corpus text once per level, which cannot scale; documented deviation;
4. recurse on marked nodes until every node has length <= 1 or no candidates remain
   (src/block_tree_core.c:530-554). Each level is persisted.

Positions are per-document codepoint offsets (the reference's search mode concatenates
files into one global array — src/search_mode.c:98-112 — which cannot scale; per-doc
offsets shard naturally).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from corpus_dedup_spark import kernel

DEFAULT_S = 2    # level-1 divisor (both reference call sites: src/dedup.c:526)
DEFAULT_TAU = 2  # deeper-level divisor


def _doc_lengths(pages: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_cps): codepoint count per squashed document."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def n_codepoints(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(kernel.utf8_decode_buffer(
                kernel.squash_newlines((t or "").encode("utf-8"))))
        )

    return pages.select(id_col, text_col).withColumn(
        "n_cps", n_codepoints(F.col(text_col))
    )


_HASH_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("start_pos", LongType()),
    StructField("length", LongType()),
    StructField("block_id", LongType()),
    StructField("block_id2", LongType()),
])

# second, independent rolling-hash base for the double-hash verify (odd ⇒ valid
# polynomial base mod 2^64; golden-ratio constant, unrelated to base 31)
VERIFY_HASH_BASE = 0x9E3779B97F4A7C15


def _hash_blocks(nodes: DataFrame, texts: DataFrame, id_col: str,
                 text_col: str) -> DataFrame:
    """Compute (block_id, block_id2) for (url, start_pos, length) nodes: group nodes
    per doc, build BOTH prefix tables once per doc, hash every node O(1) (H2).

    The second hash replaces the reference's content-compare verify (quirk Q6,
    src/block_tree_core.c:320-349): comparing under two independent 64-bit
    polynomial hashes (combined collision odds ~2^-128 per pair) instead of joining
    every level back to the full text column — which would shuffle the whole corpus
    text once per tree level. Documented deviation; reconstruction correctness is
    still asserted end-to-end by tests/test_blocktree.py::query_access."""
    grouped = (
        nodes.groupBy(id_col)
        .agg(F.collect_list(F.struct("start_pos", "length")).alias("spans"))
        .join(texts, id_col)
    )

    def hash_partition(batches):
        for pdf in batches:
            out_url: list = []
            starts_l, lens_l, h1_l, h2_l = [], [], [], []
            for url, spans, text in zip(pdf[id_col], pdf["spans"], pdf[text_col]):
                cps = kernel.utf8_decode_buffer(
                    kernel.squash_newlines((text or "").encode("utf-8")))
                prefix, pow_ = kernel.rolling_prefix(cps, kernel.BLOCK_HASH_BASE)
                prefix2, pow2 = kernel.rolling_prefix(cps, VERIFY_HASH_BASE)
                starts = np.fromiter((s["start_pos"] for s in spans), dtype=np.int64)
                lens = np.fromiter((s["length"] for s in spans), dtype=np.int64)
                out_url.extend([url] * len(spans))
                starts_l.append(starts)
                lens_l.append(lens)
                h1_l.append(kernel.window_hashes(prefix, pow_, starts, lens))
                h2_l.append(kernel.window_hashes(prefix2, pow2, starts, lens))
            if not out_url:
                continue
            yield pd.DataFrame({
                "url": out_url,
                "start_pos": np.concatenate(starts_l),
                "length": np.concatenate(lens_l),
                "block_id": np.concatenate(h1_l).view(np.int64),
                "block_id2": np.concatenate(h2_l).view(np.int64),
            })

    return grouped.mapInPandas(hash_partition, schema=_HASH_SCHEMA).withColumnRenamed(
        "url", id_col
    )


def build_block_tree(pages: DataFrame, s: int = DEFAULT_S, tau: int = DEFAULT_TAU,
                     id_col: str = "url", text_col: str = "text",
                     max_levels: int = 40) -> DataFrame:
    """Returns the full tree table:
    (url, level, start_pos, length, block_id, is_marked, target_pos)."""
    texts = pages.select(id_col, text_col).persist()
    lengths = _doc_lengths(texts, id_col, text_col)
    roots = lengths.filter(F.col("n_cps") > 0).select(
        F.col(id_col),
        F.lit(0).alias("level"),
        F.lit(0).cast("long").alias("start_pos"),
        F.col("n_cps").alias("length"),
        F.lit(None).cast("long").alias("block_id"),
        F.lit(True).alias("is_marked"),
        F.lit(None).cast("long").alias("target_pos"),
    ).persist()

    all_levels = [roots]
    frontier = roots
    level = 0
    while level < max_levels:
        level += 1
        divisor = s if level == 1 else tau
        # candidates: children of marked nodes with length > 1
        parents = frontier.filter(F.col("is_marked") & (F.col("length") > 1))
        if parents.isEmpty():
            break
        base = (F.col("length") / divisor).cast("long")  # floor for positive lengths
        children = parents.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.lit(divisor - 1))).alias("ci"),
            F.col("start_pos"), F.col("length"),
        ).select(
            F.col(id_col),
            (F.col("start_pos") + F.col("ci") * base).alias("start_pos"),
            F.when(F.col("ci") < divisor - 1, base)
             .otherwise(F.col("length") - (divisor - 1) * base).alias("length"),
        ).filter(F.col("length") > 0)

        hashed = _hash_blocks(children, texts, id_col, text_col)

        # leader election per (url, block_id, block_id2, length): min(start_pos)
        # wins; equality under BOTH independent 64-bit hashes replaces the content
        # compare (no per-level join against the text column — see _hash_blocks)
        win_min = F.min("start_pos").over(
            Window.partitionBy(id_col, "block_id", "block_id2", "length")
        )
        resolved = hashed.withColumn("leader_pos", win_min).select(
            F.col(id_col),
            F.lit(level).alias("level"),
            "start_pos", "length", "block_id",
            (F.col("start_pos") == F.col("leader_pos")).alias("is_marked"),
            F.when(F.col("start_pos") != F.col("leader_pos"), F.col("leader_pos"))
             .otherwise(F.lit(None).cast("long")).alias("target_pos"),
        ).persist()

        all_levels.append(resolved)
        frontier = resolved
        # stop when no marked node is divisible further
        if resolved.filter(F.col("is_marked") & (F.col("length") > 1)).isEmpty():
            break

    out = all_levels[0]
    for lv in all_levels[1:]:
        out = out.unionByName(lv)
    return out


def query_access(tree_rows: list, text: str, pos: int) -> str:
    """Driver-side reconstruction check (ref: src/block_tree_core.c:583-601): resolve
    position through pointer nodes and read the original text. Used by tests to assert
    the tree is a consistent index (the reference's dead verify path — quirk Q7 — made
    live here)."""
    by_level: dict[int, list] = {}
    for r in tree_rows:
        by_level.setdefault(r["level"], []).append(r)
    max_level = max(by_level)
    p = pos
    level = 1
    while level <= max_level:
        node = next(
            (n for n in by_level[level]
             if n["start_pos"] <= p < n["start_pos"] + n["length"]), None)
        if node is None:
            break
        if not node["is_marked"]:
            p = node["target_pos"] + (p - node["start_pos"])
            level = 1  # re-resolve from the top at the new position
            continue
        if node["length"] <= 1:
            break
        level += 1
    return text[p]


def tree_stats(tree: DataFrame) -> DataFrame:
    """Per-level marked/pointer counts — the compression signal."""
    return tree.groupBy("level").agg(
        F.count("*").alias("n_nodes"),
        F.count_if(F.col("is_marked")).alias("n_marked"),
        F.count_if(~F.col("is_marked")).alias("n_pointers"),
    ).orderBy("level")
