"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata. The Spark-side machinery —
schemas, mapInPandas batch shapes, partition sizing — is real and tested; the actual
codec work is stubbed (no image/audio libraries in this container): ``decode_media``
raises NotImplementedError unless ``fake=True``, in which case a deterministic fake
decoder produces stable feature vectors so downstream operators (dedup on media
fingerprints, embedding similarity) can be exercised end-to-end.

Scale notes: media rows are large — mapInPandas with a small
``spark.sql.execution.arrow.maxRecordsPerBatch`` keeps Arrow batches bounded; binary
payload columns must be pruned before any wide shuffle (fingerprint first, shuffle the
fingerprint, never the bytes).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("mime", StringType(), True),
    StructField("payload", BinaryType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("content_hash", LongType(), False),
    StructField("features", ArrayType(FloatType()), True),
])

FEATURE_DIM = 32


def _fake_decode(payload: bytes, kind: str) -> np.ndarray | None:
    """Deterministic fake feature extractor: a stable pseudo-embedding derived from the
    payload bytes. REAL decode (PIL/ffmpeg/torchaudio) goes here in production."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def _pil_decode(payload: bytes, kind: str) -> np.ndarray | None:
    """Real image decode via Pillow: grayscale 8×4 thumbnail → L2-normalized
    FEATURE_DIM vector (the classic tiny-thumbnail perceptual feature). Rows that
    cannot be decoded (corrupt payload, non-image kind — audio/video need
    ffmpeg-class codecs that stay stubbed) yield NULL features instead of failing
    the job: at corpus scale a bad media row is data, not an error."""
    if kind != "image":
        return None
    from io import BytesIO

    from PIL import Image

    try:
        img = Image.open(BytesIO(payload or b"")).convert("L").resize((8, 4))
    except Exception:
        return None
    v = np.asarray(img, dtype=np.float32).ravel()[:FEATURE_DIM]
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def _resolve_decoder(fake: bool):
    """Pick the decoder INSIDE the worker (codec availability is a property of the
    executor image): fake stub when asked, Pillow when importable, else None —
    the caller raises the honest NotImplementedError."""
    if fake:
        return _fake_decode
    try:
        import PIL  # noqa: F401
    except ImportError:
        return None
    return _pil_decode


def extract_media_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """media table → (media_id, kind, n_bytes, content_hash, features).

    The mapInPandas batch shape, schema and fingerprinting are production-real.
    Decoding: with ``fake=True`` the deterministic stub runs everywhere; with
    ``fake=False`` images decode for REAL where Pillow is importable on the
    executors (guarded import, resolved worker-side), and the call raises an
    honest NotImplementedError where no codec exists. content_hash is CRC-based
    and decode-free, so exact-dup media detection works even without codecs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _resolve_decoder(fake)
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if decoder is None:
                    raise NotImplementedError(
                        "media decoding requires codec libraries (Pillow) not "
                        "present in this environment; pass fake=True for the "
                        "deterministic stub")
                v = decoder(bytes(payload or b""), kind)
                feats.append(v.tolist() if v is not None else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "content_hash": [
                    np.int64(np.uint64(zlib.crc32(bytes(p or b""))
                                       | (len(p or b"") << 32)).view(np.int64))
                    for p in pdf["payload"]],
                "features": feats,
            })

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(run, schema=FEATURES_SCHEMA)


def media_exact_dup_pairs(features: DataFrame) -> DataFrame:
    """Exact media dup pairs: group on (content_hash, n_bytes) — never the payload
    bytes (binary never shuffles)."""
    g = features.select("media_id", "content_hash", "n_bytes")
    a = g.withColumnRenamed("media_id", "id_a")
    b = g.withColumnRenamed("media_id", "id_b")
    return (
        a.join(b, ["content_hash", "n_bytes"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled timestamp (decode stubbed —
    returns frame offsets only). Real impl would yield frame payloads per row."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0),
                           F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0))
                                      - 1, F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
