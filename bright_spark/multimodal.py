"""Multimodal columns for training-data pipelines.

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; the decode / feature-extract /
resize / frame-sample kernels are ``mapInPandas`` Arrow-batch
operators. The container has no image/audio libraries, so the actual
byte -> pixels/samples step is stubbed behind ``decoder=`` hooks with
a deterministic fake (documented NotImplementedError for real codecs);
everything Spark-side — schema, batch shape, partition sizing,
metadata propagation — is real and tested.

Scale notes: binary payloads dominate partition size, so operators
repartition by ``bytes`` budget, not row count; feature outputs are
small and separate from payloads so downstream joins don't reshuffle
blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, mime STRING, payload BINARY, "
    "width INT, height INT, duration_ms INT"
)


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derives an
    (h, w, 3) uint8 array from the payload's sha256 keystream. Real
    codecs (PIL/libjpeg) are not in this container:
    a production deployment swaps this hook."""
    if payload is None:
        raise NotImplementedError("real image decode requires PIL/libjpeg")
    need = width * height * 3
    out = bytearray()
    seed = hashlib.sha256(payload).digest()
    block = seed
    while len(out) < need:
        block = hashlib.sha256(block).digest()
        out.extend(block)
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(height, width, 3)


def image_features(
    df: DataFrame,
    decoder: Callable[[bytes, int, int], np.ndarray] = fake_decode_image,
    target: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode -> resize(target) -> channel-mean feature vector.
    Output: (media_id, feature ARRAY<FLOAT>, mean_luma DOUBLE)."""
    th, tw = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, lumas = [], [], []
            for row in pdf.itertuples(index=False):
                img = decoder(bytes(row.payload), int(row.width), int(row.height))
                # nearest-neighbor resize (pure numpy)
                ys = (np.arange(th) * img.shape[0] // th)
                xs = (np.arange(tw) * img.shape[1] // tw)
                small = img[np.ix_(ys, xs)].astype(np.float64) / 255.0
                ids.append(row.media_id)
                feats.append(small.mean(axis=(0, 1)).astype(np.float32))
                lumas.append(float(small.mean()))
            yield pd.DataFrame({"media_id": ids, "feature": feats,
                                "mean_luma": lumas})

    payload = df.select("media_id", "payload", "width", "height")
    return payload.mapInPandas(
        kernel, "media_id BIGINT, feature ARRAY<FLOAT>, mean_luma DOUBLE")


def fake_decode_audio(payload: bytes, duration_ms: int,
                      sample_rate: int = 8000) -> np.ndarray:
    """Deterministic stand-in for an audio decoder: float32 PCM in
    [-1, 1) derived from the payload's sha256 keystream. Real codecs
    (soundfile/ffmpeg) are not in this container; production swaps
    this hook."""
    if payload is None:
        raise NotImplementedError("real audio decode requires soundfile/ffmpeg")
    n = max(1, int(duration_ms * sample_rate / 1000))
    need = n * 2
    out = bytearray()
    block = hashlib.sha256(payload).digest()
    while len(out) < need:
        block = hashlib.sha256(block).digest()
        out.extend(block)
    raw = np.frombuffer(bytes(out[:need]), dtype=np.uint16)
    return (raw.astype(np.float32) / 32768.0) - 1.0


def audio_features(
    df: DataFrame,
    decoder: Callable[[bytes, int], np.ndarray] = fake_decode_audio,
    n_windows: int = 8,
) -> DataFrame:
    """Decode -> fixed-window RMS energy profile + overall stats.
    Output: (media_id, rms ARRAY<FLOAT>, peak DOUBLE, duration_ms INT).
    Same Arrow-batch shape as image_features; only the decode hook is
    environment-specific."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rms_out, peaks, durs = [], [], [], []
            for row in pdf.itertuples(index=False):
                pcm = decoder(bytes(row.payload), int(row.duration_ms))
                bounds = (np.arange(n_windows + 1) * pcm.size) // n_windows
                rms = np.array([
                    float(np.sqrt(np.mean(np.square(
                        pcm[bounds[i]:max(bounds[i + 1], bounds[i] + 1)]))))
                    for i in range(n_windows)], dtype=np.float32)
                ids.append(row.media_id)
                rms_out.append(rms)
                peaks.append(float(np.abs(pcm).max()))
                durs.append(int(row.duration_ms))
            yield pd.DataFrame({"media_id": ids, "rms": rms_out,
                                "peak": peaks, "duration_ms": durs})

    payload = df.select("media_id", "payload", "duration_ms")
    return payload.mapInPandas(
        kernel, "media_id BIGINT, rms ARRAY<FLOAT>, peak DOUBLE, duration_ms INT")


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled
    timestamp (payload decode stubbed — emits frame offsets only).
    Output: (media_id, frame_idx, ts_ms)."""
    frames = df.select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0),
            F.greatest((F.col("duration_ms") - 1) / every_ms, F.lit(0)).cast("int")
        )).alias("frame_idx"))
    return frames.select("media_id", "frame_idx",
                         (F.col("frame_idx") * every_ms).alias("ts_ms"))


def repartition_by_bytes(df: DataFrame, target_bytes: int = 128 * 1024 * 1024,
                         payload_col: str = "payload") -> DataFrame:
    """Size partitions by payload volume, not row count: blobs are the
    unit that must fit executor memory at 100 TB."""
    total = df.select(F.sum(F.length(payload_col))).collect()[0][0] or 1
    n = max(1, int(total // target_bytes) + 1)
    return df.repartition(n)


def make_media_fixture(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table for tests."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        kind = rng.choice(["image", "audio", "video"])
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * rng.randint(2, 9)
        rows.append((i, kind,
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind],
                     bytearray(payload),
                     rng.randint(4, 64), rng.randint(4, 64),
                     rng.randint(500, 10_000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
