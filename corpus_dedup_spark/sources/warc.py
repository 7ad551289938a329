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

Memory at scale: ``binaryFile`` holds one COMPRESSED file per task (~1 GB for
Common Crawl; the format hard-caps at 2 GB per file — shard bigger archives
upstream). The DECOMPRESSED side is streamed: gzip members are inflated
incrementally (``zlib.decompressobj``, never a whole-file ``gzip.decompress``
— a 1 GB CC file is 4-5 GB inflated) through a rolling record parser whose
buffer is O(one record), with a per-record size cap (over-cap records are
skipped byte-by-byte, not buffered), and rows flush to Arrow every
``flush_rows`` records. Peak task memory ≈ compressed file + one flush frame.
For 100 TB the knob is files-per-task (spark.sql.files.maxPartitionBytes caps
bin-packing of small files; big files are one task each regardless).
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from corpus_dedup_spark.functions.text import lang_id_expr

_SCHEMA = "url string, warc_ts timestamp, html binary, text string"
_GZ_CHUNK = 4 << 20  # compressed bytes per inflate step
_MAX_HEADER_BYTES = 1 << 20  # a WARC header block beyond 1 MiB is corrupt


def _iter_decompressed(data: bytes, chunk: int = _GZ_CHUNK) -> Iterator[bytes]:
    """Yield decompressed chunks of a (possibly multi-member) gzip buffer
    WITHOUT materializing the whole stream — the spec puts each record in its
    own member, but this loop is member-agnostic: it inflates ``chunk``
    compressed bytes at a time and starts a fresh decompressor at each member
    boundary (``obj.eof`` + ``unused_data`` rewind). Plain (uncompressed)
    input yields itself. A corrupt tail ends the stream at the last good
    byte — partial data, never a task failure."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    mv = memoryview(data)
    pos, n = 0, len(data)
    obj = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
    while pos < n:
        hi = min(pos + chunk, n)
        try:
            # max_length bounds the OUTPUT too: without it, one compressed
            # chunk of a pathological member (zlib inflates up to ~1032:1)
            # could materialize gigabytes in a single call — the exact
            # unbounded allocation this streaming loop exists to prevent.
            # Input the call didn't consume stays in unconsumed_tail (not
            # yet at member end) or unused_data (past member end); both are
            # re-fed by rewinding pos, so alignment stays in the original
            # buffer and a member header split across chunks is impossible.
            out = obj.decompress(mv[pos:hi], chunk)
        except zlib.error:
            return  # corrupt member: stop at the last whole chunk
        pos = hi - len(obj.unconsumed_tail) - len(obj.unused_data)
        if out:
            yield out
        if obj.eof:
            if pos >= n or data[pos:pos + 2] != b"\x1f\x8b":
                return  # trailing garbage after the last member: tolerate
            obj = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
    tail = obj.flush()
    if tail:
        yield tail


class _WarcStreamParser:
    """Incremental WARC record parser over a rolling buffer.

    ``feed()`` arbitrary decompressed chunks; complete ``(target_uri,
    warc_date, payload)`` rows accumulate in ``rows`` (drain with
    ``take_rows()``). Only ``response`` / ``resource`` records yield rows
    (warcinfo / request / metadata are framing); response HTTP envelopes are
    stripped. Memory is O(one record): consumed bytes are deleted from the
    buffer, and a record whose Content-Length exceeds ``max_record_bytes``
    is discarded as it streams past (counted in ``skipped_over_cap``), never
    buffered. Corrupt framing or a truncated tail ends the parse at the last
    whole record — partial data, never a task failure."""

    def __init__(self, max_record_bytes: int = 128 << 20) -> None:
        self.buf = bytearray()
        self.rows: list[tuple[str, str, bytes]] = []
        self.max = max_record_bytes
        self.skip = 0  # bytes of an over-cap record still to discard
        self.skipped_over_cap = 0
        self.dead = False  # corrupt framing: ignore the rest of the file
        self.peak_buf = 0  # high-water mark, for the memory-bound tests

    def feed(self, chunk: bytes) -> None:
        if self.dead:
            return
        if self.skip:
            k = min(self.skip, len(chunk))
            self.skip -= k
            if k == len(chunk):
                return
            chunk = chunk[k:]
        self.buf += chunk
        self.peak_buf = max(self.peak_buf, len(self.buf))
        self._drain()

    def take_rows(self) -> list[tuple[str, str, bytes]]:
        rows, self.rows = self.rows, []
        return rows

    def _drain(self) -> None:
        buf = self.buf
        pos, n = 0, len(buf)
        while pos < n:
            while buf.startswith(b"\r\n", pos):
                pos += 2
            if pos >= n:
                break
            hdr_end = buf.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                if n - pos > _MAX_HEADER_BYTES:
                    self.dead = True
                    pos = n
                break
            lines = bytes(buf[pos:hdr_end]).decode(
                "utf-8", "replace").split("\r\n")
            if not lines[0].startswith("WARC/"):
                self.dead = True
                pos = n
                break
            fields: dict[str, str] = {}
            for line in lines[1:]:
                key, _, val = line.partition(":")
                fields[key.strip().lower()] = val.strip()
            try:
                length = int(fields.get("content-length", "0"))
            except ValueError:
                self.dead = True
                pos = n
                break
            block_start = hdr_end + 4
            if length > self.max:
                self.skipped_over_cap += 1
                have = n - block_start
                if have >= length:
                    pos = block_start + length
                    continue
                self.skip = length - have  # discard the rest as it streams by
                pos = n
                break
            if block_start + length > n:
                break  # need more bytes for this record
            block = bytes(buf[block_start:block_start + length])
            pos = block_start + length
            rtype = fields.get("warc-type", "")
            if rtype in ("response", "resource"):
                if rtype == "response":
                    env_end = block.find(b"\r\n\r\n")
                    body = block[env_end + 4:] if env_end >= 0 else block
                else:
                    body = block
                self.rows.append((fields.get("warc-target-uri", ""),
                                  fields.get("warc-date", ""), body))
        if pos:
            del buf[:pos]


def _parse_warc_bytes(data: bytes) -> list[tuple[str, str, bytes]]:
    """One-shot convenience over :class:`_WarcStreamParser` (DECOMPRESSED
    input): parse a whole WARC byte string into rows. Test/fixture surface;
    the Spark source streams instead."""
    p = _WarcStreamParser()
    p.feed(data)
    return p.take_rows()


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
              text_from_html: bool = True, flush_rows: int = 2000,
              max_record_bytes: int = 128 << 20) -> DataFrame:
    """Directory/glob of ``.warc`` / ``.warc.gz`` files → pages DataFrame
    ``(url, warc_ts, html, text, lang)`` matching the synthetic table's schema,
    so every downstream operator (``run_exact_dedup``, the near-dup pipeline,
    text analysis) runs on it unchanged.

    Decompression and record parsing are STREAMED (see module doc): the
    decompressed stream is never whole in memory; rows flush to Arrow every
    ``flush_rows`` records and a record over ``max_record_bytes`` is skipped,
    not buffered. ``binaryFile`` itself holds one compressed file per task
    and caps files at 2 GB (Spark's binary source limit) — shard larger
    archives upstream."""
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path).select("content")

    def frame(recs: list[tuple[str, str, bytes]]) -> pd.DataFrame:
        html = pd.Series([r[2] for r in recs], dtype=object)
        ts = pd.to_datetime(
            pd.Series([r[1] for r in recs]), errors="coerce",
            utc=True, format="ISO8601").dt.tz_convert(None)
        text = (html_to_text_series(html) if text_from_html
                else pd.Series([""] * len(recs), dtype=object))
        return pd.DataFrame({
            "url": pd.Series([r[0] for r in recs], dtype=object),
            "warc_ts": ts, "html": html, "text": text})

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for raw in pdf["content"]:
                p = _WarcStreamParser(max_record_bytes)
                for chunk in _iter_decompressed(bytes(raw)):
                    p.feed(chunk)
                    if len(p.rows) >= flush_rows:
                        yield frame(p.take_rows())
                if p.rows:
                    yield frame(p.take_rows())

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
