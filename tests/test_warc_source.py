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
