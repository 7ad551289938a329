"""WARC ingestion source: round-trip, envelope stripping, robustness, and
pipeline composition over raw Common-Crawl-style files."""

import gzip

import pandas as pd
import pytest

from corpus_dedup_spark.sources.warc import (
    _parse_warc_bytes, html_to_text_series, read_warc, write_warc)

_RECS = [
    ("http://a.example/page1", "2024-03-01T12:00:00Z",
     "<html><head><title>T1</title><script>var x=1;</script></head>"
     "<body><p>First sentence. Second sentence.</p>"
     "<div>Shared footer line.</div></body></html>".encode()),
    ("http://b.example/page2", "2024-03-01T12:05:00Z",
     "<html><body><p>Unique b content here. And more!</p>"
     "<div>Shared footer line.</div></body></html>".encode()),
    ("http://c.example/ünïcode", "2024-03-02T09:30:00Z",
     "<html><body>café &amp; crème &lt;tag&gt;.</body></html>"
     .encode()),
]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(spark, tmp_path, compress):
    ext = "warc.gz" if compress else "warc"
    p = tmp_path / f"crawl.{ext}"
    write_warc(str(p), _RECS, compress=compress)
    df = read_warc(spark, str(p)).orderBy("url")
    rows = df.collect()
    assert [r["url"] for r in rows] == sorted(u for u, _, _ in _RECS)
    by_url = {r["url"]: r for r in rows}
    for url, ts, html in _RECS:
        r = by_url[url]
        assert bytes(r["html"]) == html  # HTTP envelope stripped exactly
        assert r["warc_ts"] == pd.Timestamp(ts).tz_convert(None)
        assert r["lang"] is not None
    # script dropped, entities unescaped, block tags newline'd
    t1 = by_url["http://a.example/page1"]["text"]
    assert "var x=1" not in t1 and "<" not in t1
    assert "First sentence. Second sentence." in t1
    assert "café & crème <tag>." in by_url["http://c.example/ünïcode"]["text"]


def test_parser_skips_framing_and_truncation(tmp_path):
    p = tmp_path / "t.warc"
    write_warc(str(p), _RECS[:2])
    data = p.read_bytes()
    recs = _parse_warc_bytes(data)
    assert [r[0] for r in recs] == [u for u, _, _ in _RECS[:2]]  # warcinfo skipped
    # truncated tail: chop mid-record — prefix still parses, no exception
    recs2 = _parse_warc_bytes(data[:-60])
    assert [r[0] for r in recs2] == [_RECS[0][0]]
    assert _parse_warc_bytes(b"") == []
    assert _parse_warc_bytes(b"garbage not warc") == []


def test_multi_file_dedup_pipeline(spark, tmp_path):
    """Two WARC files with a cross-file duplicate sentence: the standard exact
    dedup pipeline runs unchanged on read_warc output and collapses it."""
    from corpus_dedup_spark.operators.exact_dedup import run_exact_dedup

    write_warc(str(tmp_path / "a.warc"), _RECS[:1])
    write_warc(str(tmp_path / "b.warc.gz"), _RECS[1:], compress=True)
    pages = read_warc(spark, str(tmp_path))
    marked, docs, stats = run_exact_dedup(pages)
    srow = stats.collect()[0]
    # "Shared footer line." appears in page1 and page2 -> exactly 1 duplicate
    assert srow["duplicate_units"] == 1
    assert docs.count() == 3
    kept_texts = {r["url"]: r["dedup_text"] for r in docs.collect()}
    keeper_url = min("http://a.example/page1", "http://b.example/page2")
    loser_url = max("http://a.example/page1", "http://b.example/page2")
    assert "Shared footer line." in kept_texts[keeper_url]
    assert "Shared footer line." not in kept_texts[loser_url]


def test_html_to_text_vectorized_nulls():
    s = html_to_text_series(pd.Series([None, b"<p>x</p>", b""], dtype=object))
    assert list(s) == ["", "x", ""]


def test_gz_streaming_bounded_memory(tmp_path):
    """A multi-member .warc.gz much larger than any single record must parse
    with a rolling buffer ≪ the decompressed size: the whole-file
    gzip.decompress path would hold all of it at once (a 1 GB Common Crawl
    file is 4-5 GB inflated), the streaming path holds O(one record)."""
    from corpus_dedup_spark.sources.warc import (_iter_decompressed,
                                                 _WarcStreamParser)

    body = (b"<html><body>" + b"Filler sentence here. " * 2000 + b"</body>")
    recs = [(f"http://s.example/{i}", "2024-03-01T00:00:00Z", body)
            for i in range(120)]
    p = tmp_path / "big.warc.gz"
    write_warc(str(p), recs, compress=True)
    raw = p.read_bytes()
    decompressed_size = len(gzip.decompress(raw))
    assert decompressed_size > 5_000_000  # the test is non-vacuous

    parser = _WarcStreamParser()
    n_rows = 0
    for chunk in _iter_decompressed(raw, chunk=64 << 10):
        parser.feed(chunk)
        n_rows += len(parser.take_rows())  # drain like the Spark source does
    n_rows += len(parser.take_rows())
    assert n_rows == len(recs)
    # peak rolling buffer stays within a few records, not the whole stream
    assert parser.peak_buf < 4 * (len(body) + 4096)
    assert parser.peak_buf * 10 < decompressed_size


def test_gz_streaming_matches_whole_file_decompress(tmp_path):
    """Chunked multi-member inflate ≡ gzip.decompress, byte for byte, at
    several chunk sizes (member boundaries land anywhere in a chunk)."""
    from corpus_dedup_spark.sources.warc import _iter_decompressed

    p = tmp_path / "c.warc.gz"
    write_warc(str(p), _RECS, compress=True)
    raw = p.read_bytes()
    want = gzip.decompress(raw)
    for chunk in (7, 1 << 10, 1 << 30):
        assert b"".join(_iter_decompressed(raw, chunk=chunk)) == want
    # truncated tail: stops cleanly at the last whole byte, no exception
    got = b"".join(_iter_decompressed(raw[:-20], chunk=1 << 10))
    assert want.startswith(got)


def test_over_cap_record_skipped_not_buffered():
    """A record whose Content-Length exceeds the cap is discarded as it
    streams past — later records still parse, and the buffer never holds the
    big block."""
    from corpus_dedup_spark.sources.warc import _WarcStreamParser

    def rec(url: str, body: bytes) -> bytes:
        return (f"WARC/1.0\r\nWARC-Type: resource\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() \
            + body + b"\r\n\r\n"

    big = b"x" * 500_000
    data = rec("http://ok.example/1", b"small one") + \
        rec("http://big.example/2", big) + \
        rec("http://ok.example/3", b"small two")
    parser = _WarcStreamParser(max_record_bytes=10_000)
    for i in range(0, len(data), 8192):
        parser.feed(data[i:i + 8192])
    rows = parser.take_rows()
    assert [r[0] for r in rows] == ["http://ok.example/1",
                                    "http://ok.example/3"]
    assert parser.skipped_over_cap == 1
    assert parser.peak_buf < 50_000  # the 500 kB block never accumulated


def test_read_warc_flush_rows(spark, tmp_path):
    """The Spark source flushes frames every flush_rows records (bounding the
    per-task pandas frame) without changing the result."""
    recs = [(f"http://f.example/{i}", "2024-03-01T00:00:00Z",
             f"<p>Doc {i} body sentence.</p>".encode()) for i in range(25)]
    write_warc(str(tmp_path / "f.warc.gz"), recs, compress=True)
    df = read_warc(spark, str(tmp_path / "f.warc.gz"), flush_rows=4)
    rows = df.orderBy("url").collect()
    assert len(rows) == 25
    assert rows[0]["text"] == "Doc 0 body sentence."
