"""Multimodal columns for training-data pipelines.

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; the decode / feature-extract /
resize / frame-sample kernels are ``mapInPandas`` Arrow-batch
operators.

Decoding: self-contained formats decode FOR REAL with stdlib + numpy
— PPM/PGM images (:func:`decode_ppm`), uncompressed 24/32-bit BMP
(:func:`decode_bmp`), PCM WAV audio (:func:`decode_wav`, stdlib
``wave``). The default hooks (:func:`auto_decode_image`,
:func:`auto_decode_audio`) sniff magic bytes and use those; payloads
in compressed containers (JPEG/PNG/FLAC/MP4...) fall back to a
deterministic sha256-keystream fake, because this container has no
codec libraries — a production deployment swaps the hook for
PIL/soundfile/ffmpeg. Everything Spark-side — schema, batch shape,
partition sizing, metadata propagation — is identical either way.

Scale notes: binary payloads dominate partition size, so operators
repartition by ``bytes`` budget, not row count; feature outputs are
small and separate from payloads so downstream joins don't reshuffle
blobs.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
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
    """Deterministic stand-in for a compressed-image decoder: derives
    an (h, w, 3) uint8 array from the payload's sha256 keystream.
    Used by :func:`auto_decode_image` for containers this environment
    cannot decode (JPEG/PNG need libjpeg/zlib codec bindings);
    a production deployment swaps the hook for PIL."""
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


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decode of binary PPM (P6, RGB) / PGM (P5, grayscale) —
    the netpbm formats are raw samples behind an ASCII header, so
    numpy alone decodes them. Returns (h, w, 3) uint8 (grayscale is
    broadcast to 3 channels). maxval <= 255 supported."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header = magic + 3 ints (w, h, maxval), '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8,
                        count=w * h * ch, offset=pos)
    arr = arr.reshape(h, w, ch)
    return np.repeat(arr, 3, axis=2) if ch == 1 else arr


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decode of uncompressed 24/32-bit BMP (BITMAPINFOHEADER,
    BI_RGB): fixed-offset header fields + row-padded BGR(A) samples —
    struct + numpy suffice. Returns (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, "
                         f"compression={compression})")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * nb].reshape(h, w, nb)
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    return rgb[::-1] if flip else rgb


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """REAL decode of 8-bit non-interlaced PNG (grayscale / gray+alpha
    / RGB / RGBA): chunk walk -> IDAT zlib inflate -> per-row filter
    reconstruction (spec filters 0-4), stdlib zlib + numpy only.
    Returns (h, w, 3) uint8 RGB (alpha dropped, grayscale broadcast).

    Filters Sub/Up are vectorized (Sub is a mod-256 prefix sum per
    byte lane); Average/Paeth fall back to a per-byte loop — fine for
    a decode hook that runs inside an Arrow-batched kernel and is
    swappable for PIL where installed (see auto_decode_image)."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,), ctype = (struct.unpack_from(">I", payload, pos),
                            payload[pos + 4:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); install PIL for full coverage")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    bpp = channels
    for y in range(h):
        cur, f = data[y].copy(), int(filters[y])
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            pass
        elif f == 1:  # Sub: mod-256 prefix sum per byte lane
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average (left-sequential)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth (left-sequential)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
    img = out.astype(np.uint8).reshape(h, w, channels)
    if color == 0:
        return np.repeat(img, 3, axis=2)
    if color == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGB / RGBA->RGB


def _pil_decode(payload: bytes) -> np.ndarray | None:
    """Extras path: full-coverage decode when PIL is installed (it is
    NOT in this container); returns None when unavailable so the
    caller falls through to the built-in/fake decoders."""
    try:
        from PIL import Image
    except ImportError:
        return None
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img)


def auto_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Default image hook: sniff the container. Netpbm, uncompressed
    BMP, and 8-bit PNG decode for real with stdlib+numpy; with PIL
    installed every container decodes for real; otherwise the
    remaining ones (JPEG/...) use the deterministic fake."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(bytes(payload))
    if payload[:2] == b"BM":
        return decode_bmp(bytes(payload))
    if payload[:8] == _PNG_MAGIC:
        try:
            return decode_png(bytes(payload))
        except ValueError:
            decoded = _pil_decode(bytes(payload))
            if decoded is not None:
                return decoded
            # no PIL in this environment: an unsupported-but-valid PNG
            # variant (palette, 16-bit, interlaced — all common in web
            # corpora) must not kill the whole featurization job; fall
            # back to the deterministic fake like other undecodable
            # formats do
            return fake_decode_image(payload, width, height)
    decoded = _pil_decode(bytes(payload))
    if decoded is not None:
        return decoded
    return fake_decode_image(payload, width, height)


def image_features(
    df: DataFrame,
    decoder: Callable[[bytes, int, int], np.ndarray] = auto_decode_image,
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
    """Deterministic stand-in for a compressed-audio decoder: float32
    PCM in [-1, 1) derived from the payload's sha256 keystream. Used
    by :func:`auto_decode_audio` for containers this environment
    cannot decode (MP3/FLAC/...); production swaps the hook for
    soundfile/ffmpeg."""
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


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL decode of PCM WAV via the stdlib ``wave`` module + numpy:
    8/16/32-bit integer PCM -> mono float32 in [-1, 1] (channels
    averaged)."""
    with wave_module().open(io.BytesIO(payload), "rb") as w:
        nch, sw, _rate, nframes = (w.getnchannels(), w.getsampwidth(),
                                   w.getframerate(), w.getnframes())
        raw = w.readframes(nframes)
    if sw == 1:  # 8-bit WAV is unsigned
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
               - 128.0) / 128.0
    elif sw == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        pcm = (np.frombuffer(raw, dtype="<i4").astype(np.float32)
               / 2147483648.0)
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm


def wave_module():
    import wave
    return wave


def auto_decode_audio(payload: bytes, duration_ms: int) -> np.ndarray:
    """Default audio hook: RIFF/WAVE magic decodes for real; anything
    else uses the deterministic fake."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(bytes(payload))
    return fake_decode_audio(payload, duration_ms)


def audio_features(
    df: DataFrame,
    decoder: Callable[[bytes, int], np.ndarray] = auto_decode_audio,
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


def _mel_filterbank(n_mels: int, n_fft: int, sample_rate: float) -> np.ndarray:
    """Triangular mel filterbank (n_mels, n_fft//2 + 1) — the standard
    HTK construction (mel = 2595·log10(1 + f/700)), pure numpy."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    fft_hz = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = mel_to_hz(np.linspace(0.0, float(hz_to_mel(sample_rate / 2.0)),
                                    n_mels + 2))
    fb = np.zeros((n_mels, n_bins), dtype=np.float64)
    for m in range(n_mels):
        lo, mid, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fft_hz - lo) / max(mid - lo, 1e-9)
        down = (hi - fft_hz) / max(hi - mid, 1e-9)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def audio_spectrogram(
    df: DataFrame,
    decoder: Callable[[bytes, int], np.ndarray] = auto_decode_audio,
    n_fft: int = 256,
    hop: int = 128,
    n_mels: int = 16,
    sample_rate: float = 16000.0,
) -> DataFrame:
    """REAL log-mel spectrogram summary, pure numpy (Hann window →
    rFFT power frames → mel filterbank → log) — the canonical audio
    featurization for training-data pipelines (speech quality gates,
    audio dedup keys, silence filtering), with no codec/DSP libs.

    Output per media row: fixed-size arrays so the schema is static at
    any corpus size — ``mel_mean``/``mel_std`` (per-band log-energy
    mean/stddev over frames, ARRAY<FLOAT> of n_mels), ``n_frames``,
    and ``spectral_centroid`` (Hz, energy-weighted). 100 TB shape:
    same Arrow-batched mapInPandas contract as image/audio_features —
    the only data movement is the payload scan itself; pair with
    :func:`repartition_by_bytes` for even task sizing."""
    fb = None  # built once per worker from the first batch

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nonlocal fb
        if fb is None:
            fb = _mel_filterbank(n_mels, n_fft, sample_rate)
        window = np.hanning(n_fft)
        n_bins = n_fft // 2 + 1
        centroid_hz = np.linspace(0.0, sample_rate / 2.0, n_bins)
        for pdf in batches:
            ids, means, stds, frames, cents = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                pcm = decoder(bytes(row.payload), int(row.duration_ms))
                if pcm.size < n_fft:
                    pcm = np.pad(pcm, (0, n_fft - pcm.size))
                n_frames = 1 + (pcm.size - n_fft) // hop
                idx = (np.arange(n_fft)[None, :]
                       + hop * np.arange(n_frames)[:, None])
                spec = np.abs(np.fft.rfft(pcm[idx] * window, axis=1)) ** 2
                mel = np.log(spec @ fb.T + 1e-10)  # (frames, mels)
                tot = spec.sum()
                cent = (float((spec.sum(axis=0) * centroid_hz).sum() / tot)
                        if tot > 0 else 0.0)
                ids.append(row.media_id)
                means.append(mel.mean(axis=0).astype(np.float32))
                stds.append(mel.std(axis=0).astype(np.float32))
                frames.append(int(n_frames))
                cents.append(cent)
            yield pd.DataFrame({"media_id": ids, "mel_mean": means,
                                "mel_std": stds, "n_frames": frames,
                                "spectral_centroid": cents})

    payload = df.select("media_id", "payload", "duration_ms")
    return payload.mapInPandas(
        kernel, "media_id BIGINT, mel_mean ARRAY<FLOAT>, "
                "mel_std ARRAY<FLOAT>, n_frames INT, "
                "spectral_centroid DOUBLE")


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
