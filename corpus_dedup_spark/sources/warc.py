"""WARC (Web ARChive) ingestion source — raw Common-Crawl-style input.

The engine's tables carry ``(url, warc_ts, html, text, lang)`` (the input
hint); real Common Crawl delivers ISO-28500 WARC files. This source turns a
directory of ``.warc`` / ``.warc.gz`` files into exactly that table,
Spark-first:

- ``spark.read.format("binaryFile")`` lists and reads the files distributed —
  one task per file. A WARC gzip stream is a concatenation of per-record gzip
  members that must be decoded sequentially within a file, so the FILE is the
  natural parallel grain; Common Crawl ships ~1 GB files, tens of thousands
  per crawl, so a 1000-executor cluster has ample grains to balance (and AQE
  coalesces the small tail). ``binaryFile`` never splits a file mid-record.
- ONE ``mapInPandas`` pass per file parses records (Content-Length-framed
  blocks per the WARC spec), strips the HTTP response envelope, and derives
  ``text`` from ``html`` with a vectorized pandas ``.str`` regex chain —
  per-DOCUMENT string ops, never per-unit row-at-a-time Python. Container
  parsing is inherently sequential per file; everything after it is batched.
- ``lang`` comes from the existing JVM-side expression
  (:func:`corpus_dedup_spark.functions.text.lang_id_expr`) — zero Python.

Reference parity: the reference ingests by directory walk + whole-file read
(src/main.c dir scan, S1/S2 in SURVEY.md §2); WARC is the web-corpus analog
of that ingest stage. All dedup semantics (newline squash Q1, splitting,
normalization) stay downstream in the kernel — this source only materializes
the table.

Memory at scale: a task materializes one decompressed file (~1-4 GB) plus its
record list; executors sized per BENCH.md hold that comfortably, and the
per-file ``yield`` keeps only one file's frame alive per Arrow flush. For
100 TB the knob is files-per-task (spark.sql.files.maxPartitionBytes caps
bin-packing of small files; big files are one task each regardless).
"""

from __future__ import annotations

import gzip
from typing import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from corpus_dedup_spark.functions.text import lang_id_expr

_SCHEMA = "url string, warc_ts timestamp, html binary, text string"


def _parse_warc_bytes(data: bytes) -> list[tuple[str, str, bytes]]:
    """Sequentially parse one decompressed WARC stream into
    ``(target_uri, warc_date, payload)`` rows.

    Only ``response`` and ``resource`` records yield rows (warcinfo / request /
    metadata records are framing, not content). For responses the HTTP
    envelope (status line + headers) is stripped; the payload is the raw body
    bytes. A truncated or corrupt tail ends the parse at the last whole
    record — partial files degrade to partial data, never to a task failure.
    """
    out: list[tuple[str, str, bytes]] = []
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            break
        fields: dict[str, str] = {}
        for line in lines[1:]:
            key, _, val = line.partition(":")
            fields[key.strip().lower()] = val.strip()
        try:
            length = int(fields.get("content-length", "0"))
        except ValueError:
            break
        block_start = hdr_end + 4
        if block_start + length > n:
            break  # truncated record
        block = data[block_start:block_start + length]
        pos = block_start + length
        rtype = fields.get("warc-type", "")
        if rtype in ("response", "resource"):
            if rtype == "response":
                env_end = block.find(b"\r\n\r\n")
                body = block[env_end + 4:] if env_end >= 0 else block
            else:
                body = block
            out.append((fields.get("warc-target-uri", ""),
                        fields.get("warc-date", ""), body))
    return out


def html_to_text_series(html: pd.Series) -> pd.Series:
    """Vectorized heuristic html→text: drop script/style/comments, turn
    block-closing tags into newlines, strip remaining tags, unescape the five
    predefined entities + nbsp, squash intra-line whitespace. Deterministic and
    dependency-free; production tables usually ship an upstream-extracted
    ``text`` column, in which case this never runs (``text_from_html=False``).
    """
    s = html.map(lambda b: b.decode("utf-8", "replace") if b is not None else "")
    s = s.str.replace(r"(?is)<(script|style)\b.*?</\1\s*>", " ", regex=True)
    s = s.str.replace(r"(?s)<!--.*?-->", " ", regex=True)
    s = s.str.replace(r"(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/title)[^>]*>",
                      "\n", regex=True)
    s = s.str.replace(r"(?s)<[^>]*>", " ", regex=True)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(r"[ \t\f\v]+", " ", regex=True)
    s = s.str.replace(r" ?\n ?", "\n", regex=True)
    s = s.str.replace(r"\n{2,}", "\n", regex=True)
    return s.str.strip()


def read_warc(spark: SparkSession, path: str, recursive: bool = False,
              text_from_html: bool = True) -> DataFrame:
    """Directory/glob of ``.warc`` / ``.warc.gz`` files → pages DataFrame
    ``(url, warc_ts, html, text, lang)`` matching the synthetic table's schema,
    so every downstream operator (``run_exact_dedup``, the near-dup pipeline,
    text analysis) runs on it unchanged."""
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path).select("content")

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for raw in pdf["content"]:
                data = bytes(raw)
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)  # multi-member per spec
                recs = _parse_warc_bytes(data)
                if not recs:
                    continue
                html = pd.Series([r[2] for r in recs], dtype=object)
                ts = pd.to_datetime(
                    pd.Series([r[1] for r in recs]), errors="coerce",
                    utc=True, format="ISO8601").dt.tz_convert(None)
                text = (html_to_text_series(html) if text_from_html
                        else pd.Series([""] * len(recs), dtype=object))
                yield pd.DataFrame({
                    "url": pd.Series([r[0] for r in recs], dtype=object),
                    "warc_ts": ts, "html": html, "text": text})

    pages = files.mapInPandas(parse, schema=_SCHEMA)
    return pages.withColumn("lang", lang_id_expr(F.col("text")))


def write_warc(path: str, records: Iterable[tuple[str, str, bytes]],
               compress: bool = False) -> None:
    """Write ``(url, iso_ts, html_bytes)`` rows as a spec-shaped WARC file
    (warcinfo header record + one response record each; per-record gzip
    members when ``compress``). Test/fixture helper — deterministic bytes
    (gzip mtime pinned to 0)."""
    def record(headers: list[tuple[str, str]], block: bytes) -> bytes:
        head = "".join(f"{k}: {v}\r\n" for k, v in headers)
        return (f"WARC/1.0\r\n{head}Content-Length: {len(block)}\r\n\r\n"
                ).encode() + block + b"\r\n\r\n"

    info = b"software: corpus-dedup-spark test fixture\r\n"
    chunks = [record([("WARC-Type", "warcinfo"),
                      ("Content-Type", "application/warc-fields")], info)]
    for i, (url, ts, body) in enumerate(records):
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
                b"\r\n\r\n" + body)
        chunks.append(record(
            [("WARC-Type", "response"), ("WARC-Target-URI", url),
             ("WARC-Date", ts),
             ("WARC-Record-ID", f"<urn:test:{i}>"),
             ("Content-Type", "application/http; msgtype=response")], http))
    blob = (b"".join(gzip.compress(c, mtime=0) for c in chunks)
            if compress else b"".join(chunks))
    with open(path, "wb") as f:
        f.write(blob)
