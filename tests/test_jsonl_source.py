"""JSONL source: field mapping, typed nulls, gzip, pipeline composition."""

import gzip
import json

import pytest

from corpus_dedup_spark.sources.jsonl import read_jsonl

_DOCS = [
    {"id": "d1", "content": "First sentence. Shared footer line.",
     "fetched": "2024-03-01T12:00:00Z", "language": "en"},
    {"id": "d2", "content": "Unique content two. Shared footer line."},
    {"id": "d3", "content": "Третье предложение по-русски. Ещё одно."},
]


def _write(path, docs, compress=False):
    data = "\n".join(json.dumps(d, ensure_ascii=False) for d in docs).encode()
    path.write_bytes(gzip.compress(data, mtime=0) if compress else data)


@pytest.mark.parametrize("compress", [False, True])
def test_mapping_and_nulls(spark, tmp_path, compress):
    name = "c.jsonl.gz" if compress else "c.jsonl"
    _write(tmp_path / name, _DOCS, compress)
    df = read_jsonl(spark, str(tmp_path / name), url_col="id",
                    text_col="content", ts_col="fetched", lang_col="language")
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    rows = {r["url"]: r for r in df.collect()}
    assert rows["d1"]["lang"] == "en"          # mapped through
    assert rows["d1"]["warc_ts"] is not None
    assert rows["d2"]["warc_ts"] is None       # absent field -> typed null
    assert rows["d2"]["lang"] is None          # lang_col named but missing row
    assert rows["d3"]["html"] is None


def test_lang_derived_when_unmapped(spark, tmp_path):
    _write(tmp_path / "c.jsonl", _DOCS)
    df = read_jsonl(spark, str(tmp_path / "c.jsonl"), url_col="id",
                    text_col="content")
    langs = {r["url"]: r["lang"] for r in df.collect()}
    # heuristic-grade lang-ID: Cyrillic family for d3 (too short to pin ru/uk)
    assert langs["d3"] in ("ru", "uk")
    assert all(v is not None for v in langs.values())


def test_missing_required_column(spark, tmp_path):
    _write(tmp_path / "c.jsonl", _DOCS)
    with pytest.raises(ValueError, match="url_col"):
        read_jsonl(spark, str(tmp_path / "c.jsonl"))


def test_dedup_pipeline_over_jsonl(spark, tmp_path):
    from corpus_dedup_spark.operators.exact_dedup import run_exact_dedup

    _write(tmp_path / "c.jsonl", _DOCS)
    pages = read_jsonl(spark, str(tmp_path / "c.jsonl"), url_col="id",
                       text_col="content")
    _, docs, stats = run_exact_dedup(pages)
    assert stats.collect()[0]["duplicate_units"] == 1  # the shared footer
    assert docs.count() == 3
