"""JSONL corpus ingestion — the other ubiquitous LLM-corpus interchange format.

Maps a directory of ``.jsonl`` / ``.jsonl.gz`` files (one JSON document per
line, arbitrary field names) onto the engine's pages schema
``(url, warc_ts, html, text, lang)`` so every operator runs unchanged.

Spark-first: ``spark.read.json`` is the native, fully distributed line reader
(uncompressed files split by range; gzip files fall back to whole-file grain,
same as WARC). No Python touches a row — the column mapping is pure Catalyst
projection, and lang-ID (when the corpus has no lang field) is the JVM-side
expression.

Scale note (100 TB): pass ``schema`` explicitly — without it Spark runs a
full inference pass over the data before the real scan (2× I/O). The mapping
projection prunes unmapped fields at the scan when the source is columnar-ish
(json scan still reads full lines; convert hot corpora to parquet once via
``df.write`` and the cost disappears — the point of this source is ingest,
not steady-state storage).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from corpus_dedup_spark.functions.text import lang_id_expr


def read_jsonl(spark: SparkSession, path: str, url_col: str = "url",
               text_col: str = "text", ts_col: str | None = None,
               html_col: str | None = None, lang_col: str | None = None,
               schema: str | None = None) -> DataFrame:
    """Read JSONL docs and normalize to ``(url, warc_ts, html, text, lang)``.

    Missing optional fields become typed NULLs (``warc_ts``, ``html``) or are
    derived (``lang`` via the built-in heuristic when ``lang_col`` is None or
    absent). ``url_col``/``text_col`` must exist — they are the identity and
    payload of every downstream operator.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    have = set(df.columns)
    if url_col not in have or text_col not in have:
        raise ValueError(
            f"jsonl source needs url_col={url_col!r} and text_col={text_col!r}; "
            f"found {sorted(have)}")

    def opt(name: str | None, typ: str) -> F.Column:
        if name and name in have:
            return F.col(name).cast(typ)
        return F.lit(None).cast(typ)

    text = F.col(text_col).cast("string")
    lang = (F.col(lang_col).cast("string") if lang_col and lang_col in have
            else lang_id_expr(text))
    return df.select(
        F.col(url_col).cast("string").alias("url"),
        opt(ts_col, "timestamp").alias("warc_ts"),
        (F.col(html_col).cast("binary") if html_col and html_col in have
         else F.lit(None).cast("binary")).alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
