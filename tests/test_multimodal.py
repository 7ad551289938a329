"""Multimodal plumbing: schema, mapInPandas batching, fingerprint dedup, stubs."""

import pytest

from corpus_dedup_spark.multimodal.ops import (MEDIA_SCHEMA,
                                               extract_media_features,
                                               media_exact_dup_pairs,
                                               sample_frames)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", "image/png", b"\x89PNG-fake-bytes-1", 64, 64, None),
        ("m2", "image", "image/png", b"\x89PNG-fake-bytes-1", 64, 64, None),  # dup of m1
        ("m3", "image", "image/jpeg", b"\xff\xd8-other", 32, 32, None),
        ("m4", "audio", "audio/wav", b"RIFF-fake", None, None, 5000),
        ("m5", "video", "video/mp4", b"mp4-fake", 640, 480, 3500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_decode_guarded(spark, media):
    """fake=False behavior depends on executor codecs BY DESIGN: without Pillow
    it raises the honest NotImplementedError; with Pillow, undecodable payloads
    yield NULL features (bad media rows are data, not job failures)."""
    try:
        import PIL  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(Exception, match="NotImplementedError|codec"):
            extract_media_features(media, fake=False).collect()
    else:
        rows = {r["media_id"]: r for r in
                extract_media_features(media, fake=False).collect()}
        # fake PNG bytes fail Image.open → NULL features; fingerprints still real
        assert rows["m1"]["features"] is None
        assert rows["m1"]["content_hash"] == rows["m2"]["content_hash"]


def test_fake_features_deterministic(spark, media):
    f1 = {r["media_id"]: r["features"]
          for r in extract_media_features(media, fake=True).collect()}
    f2 = {r["media_id"]: r["features"]
          for r in extract_media_features(media, fake=True).collect()}
    assert f1 == f2
    assert len(f1["m1"]) == 32
    assert f1["m1"] == f1["m2"]  # identical payload → identical features
    assert f1["m1"] != f1["m3"]


def test_media_exact_dup_pairs(spark, media):
    feats = extract_media_features(media, fake=True)
    pairs = {(r["id_a"], r["id_b"]) for r in media_exact_dup_pairs(feats).collect()}
    assert pairs == {("m1", "m2")}


def test_sample_frames(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in frames)
    assert got == [("m5", 0), ("m5", 1000), ("m5", 2000), ("m5", 3000)]
