"""Multimodal plumbing: binary payload columns, Arrow-batch decode
kernel shape, deterministic fake decoder, frame sampling."""

import numpy as np
import pytest

from bright_spark.multimodal import (
    fake_decode_image,
    frame_sample,
    image_features,
    make_media_fixture,
    repartition_by_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_media_fixture(spark, 48, seed=42).cache()


def test_fixture_shape(media):
    rows = media.collect()
    assert len(rows) == 48
    assert all(isinstance(bytes(r["payload"]), bytes) and len(r["payload"]) > 0
               for r in rows)


def test_fake_decoder_deterministic():
    a = fake_decode_image(b"payload", 6, 4)
    b = fake_decode_image(b"payload", 6, 4)
    assert a.shape == (4, 6, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, fake_decode_image(b"other", 6, 4))


def test_image_features(media):
    imgs = media.filter("kind = 'image'")
    feats = {r["media_id"]: r for r in image_features(imgs).collect()}
    assert len(feats) == imgs.count()
    for r in feats.values():
        assert len(r["feature"]) == 3
        assert 0.0 <= r["mean_luma"] <= 1.0
    # determinism across runs
    again = {r["media_id"]: r for r in image_features(imgs).collect()}
    for k in feats:
        assert feats[k]["feature"] == again[k]["feature"]


def test_frame_sample(media):
    vids = media.filter("kind = 'video'")
    frames = frame_sample(vids, every_ms=1000)
    by_id = {}
    for r in frames.collect():
        by_id.setdefault(r["media_id"], []).append(r["ts_ms"])
    durs = {r["media_id"]: r["duration_ms"] for r in vids.collect()}
    for mid, ts in by_id.items():
        assert ts == sorted(ts)
        assert len(ts) == (durs[mid] - 1) // 1000 + 1


def test_repartition_by_bytes(media):
    out = repartition_by_bytes(media, target_bytes=2048)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 48


def test_audio_features_deterministic_shape(spark):
    from bright_spark.multimodal import audio_features, make_media_fixture
    media = make_media_fixture(spark, 24, seed=3).filter("kind = 'audio'")
    out = audio_features(media, n_windows=8).collect()
    assert len(out) == media.count() > 0
    for r in out:
        assert len(r["rms"]) == 8
        assert all(0.0 <= x <= 1.01 for x in r["rms"])
        assert 0.0 <= r["peak"] <= 1.0
    # determinism: same payload -> same features
    again = audio_features(media, n_windows=8).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def _ppm_bytes(arr):
    h, w, _ = arr.shape
    return (f"P6\n# test\n{w} {h}\n255\n".encode() + arr.tobytes())


def _bmp_bytes(arr):
    import struct
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][:, [2, 1, 0]].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(rows), 2835, 2835, 0, 0))
    return bytes(header + rows)


def _wav_bytes(pcm16, rate=8000):
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def test_real_image_decode_roundtrip():
    """PPM/PGM/BMP decode with stdlib+numpy, byte-exact."""
    import numpy as np
    from bright_spark.multimodal import (auto_decode_image, decode_bmp,
                                         decode_ppm)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert (decode_ppm(_ppm_bytes(img)) == img).all()
    assert (decode_bmp(_bmp_bytes(img)) == img).all()
    # the auto hook sniffs containers; unknown magic -> fake, same shape
    assert (auto_decode_image(_ppm_bytes(img), 5, 6) == img).all()
    fake = auto_decode_image(b"\x89PNG fake payload", 5, 6)
    assert fake.shape == (6, 5, 3)
    # grayscale PGM broadcasts to 3 channels
    g = rng.integers(0, 256, (4, 7, 1), dtype=np.uint8)
    ppm5 = b"P5\n7 4\n255\n" + g.tobytes()
    got = decode_ppm(ppm5)
    assert got.shape == (4, 7, 3) and (got[:, :, 0] == g[:, :, 0]).all()


def _png_bytes(arr, filters=None, color=2):
    """Minimal PNG encoder for the round-trip test: 8-bit depth,
    chosen color type, one explicit filter byte per row (default 0) —
    exercises the decoder's full filter reconstruction."""
    import struct
    import zlib

    import numpy as np
    h, w = arr.shape[:2]
    ch = arr.shape[2] if arr.ndim == 3 else 1
    flat = arr.reshape(h, w * ch).astype(np.int64)
    filters = filters or [0] * h
    raw = bytearray()
    recon_prev = np.zeros(w * ch, dtype=np.int64)
    for y, f in enumerate(filters):
        cur = flat[y]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - recon_prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - (left + recon_prev) // 2) & 0xFF
        elif f == 4:
            enc = np.zeros_like(cur)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = recon_prev[x]
                c = recon_prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc.astype(np.uint8))
        recon_prev = cur

    def chunk(ctype, data):
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_real_png_decode_roundtrip():
    """PNG decode with stdlib zlib+numpy, byte-exact across ALL five
    spec filters and the four 8-bit color types."""
    import numpy as np
    import pytest as _pytest
    from bright_spark.multimodal import auto_decode_image, decode_png
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (7, 6, 3), dtype=np.uint8)
    # every filter type, mixed within one image
    png = _png_bytes(img, filters=[0, 1, 2, 3, 4, 2, 1])
    assert (decode_png(png) == img).all()
    assert (auto_decode_image(png, 6, 7) == img).all()
    # RGBA: alpha dropped
    rgba = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
    png = _png_bytes(rgba, filters=[4, 3, 2, 1, 0], color=6)
    assert (decode_png(png) == rgba[:, :, :3]).all()
    # grayscale + gray-alpha broadcast to 3 channels
    gray = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    got = decode_png(_png_bytes(gray, color=0))
    assert got.shape == (4, 5, 3) and (got[:, :, 1] == gray).all()
    ga = rng.integers(0, 256, (3, 4, 2), dtype=np.uint8)
    got = decode_png(_png_bytes(ga, filters=[1, 2, 4], color=4))
    assert (got[:, :, 0] == ga[:, :, 0]).all()
    # unsupported shapes raise (16-bit / palette) rather than garble
    bad = _png_bytes(img)
    bad = bad[:24] + bytes([16]) + bad[25:]  # depth byte inside IHDR
    with _pytest.raises(ValueError):
        decode_png(bad)


def test_real_wav_decode_roundtrip():
    import numpy as np
    from bright_spark.multimodal import auto_decode_audio, decode_wav
    pcm = (np.sin(np.linspace(0, 40, 4000)) * 20000).astype("<i2")
    wav = _wav_bytes(pcm)
    got = decode_wav(wav)
    assert got.dtype == np.float32 and got.size == 4000
    assert np.allclose(got, pcm.astype(np.float32) / 32768.0, atol=1e-6)
    assert (auto_decode_audio(wav, 500) == got).all()
    # non-RIFF payloads fall back to the deterministic fake
    fake = auto_decode_audio(b"\xffILLEGAL", 250)
    assert fake.size == 2000  # 250ms at the fake's 8kHz


def test_media_operators_decode_real_formats(spark):
    """End-to-end through the Spark operators: REAL containers in the
    payload column produce features derived from the true pixels and
    samples (checked against a direct numpy computation), side by side
    with fake-decoded compressed payloads in the same batch."""
    import numpy as np
    from bright_spark.multimodal import audio_features, image_features
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    pcm = (np.sin(np.linspace(0, 80, 8000)) * 15000).astype("<i2")
    rows = [
        (1, "image", "image/x-portable-pixmap",
         bytearray(_ppm_bytes(img)), 16, 16, 0),
        (2, "image", "image/png", bytearray(b"\x89PNG not real"), 8, 8, 0),
        (3, "audio", "audio/wav", bytearray(_wav_bytes(pcm)), 0, 0, 1000),
    ]
    media = spark.createDataFrame(
        rows, "media_id BIGINT, kind STRING, mime STRING, payload BINARY, "
              "width INT, height INT, duration_ms INT")
    feats = {r["media_id"]: r for r in
             image_features(media.filter("kind = 'image'"),
                            target=(4, 4)).collect()}
    # real PPM: mean luma equals the true downsampled pixel mean
    ys = (np.arange(4) * 16 // 4)
    xs = (np.arange(4) * 16 // 4)
    want = float((img[np.ix_(ys, xs)].astype(np.float64) / 255.0).mean())
    assert abs(feats[1]["mean_luma"] - want) < 1e-9
    assert 0.0 <= feats[2]["mean_luma"] <= 1.0  # fake path still flows
    a = audio_features(media.filter("kind = 'audio'"),
                       n_windows=4).collect()[0]
    want_peak = float(np.abs(pcm.astype(np.float32) / 32768.0).max())
    assert abs(a["peak"] - want_peak) < 1e-6


def test_audio_spectrogram_tone_localization(spark):
    """A pure sine at f0 must put its energy in the mel band containing
    f0, and the spectral centroid must sit near f0 — physics check of
    the pure-numpy log-mel kernel, end-to-end through Spark."""
    import numpy as np
    import pandas as pd
    from bright_spark.multimodal import _mel_filterbank, audio_spectrogram
    rate, n_mels, n_fft = 16000.0, 16, 256
    rows = []
    tones = {1: 500.0, 2: 3000.0}
    for mid, f0 in tones.items():
        t = np.arange(int(rate * 0.2)) / rate
        pcm16 = (np.sin(2 * np.pi * f0 * t) * 20000).astype("<i2")
        rows.append((mid, _wav_bytes(pcm16, rate=int(rate)), 200))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload", "duration_ms"]))
    got = {r["media_id"]: r for r in audio_spectrogram(
        media, n_fft=n_fft, hop=128, n_mels=n_mels,
        sample_rate=rate).collect()}
    fb = _mel_filterbank(n_mels, n_fft, rate)
    freqs = np.linspace(0, rate / 2, n_fft // 2 + 1)
    for mid, f0 in tones.items():
        r = got[mid]
        assert len(r["mel_mean"]) == n_mels and len(r["mel_std"]) == n_mels
        assert r["n_frames"] > 10
        # the argmax mel band's filter must cover f0
        band = int(np.argmax(r["mel_mean"]))
        covered = freqs[fb[band] > 0]
        assert covered.min() - 300 <= f0 <= covered.max() + 300, (f0, band)
        assert abs(r["spectral_centroid"] - f0) < 150.0
    # determinism
    again = {r["media_id"]: r for r in audio_spectrogram(
        media, n_fft=n_fft, hop=128, n_mels=n_mels,
        sample_rate=rate).collect()}
    for mid in tones:
        assert again[mid]["mel_mean"] == got[mid]["mel_mean"]


def test_audio_spectrogram_short_and_fake_payloads(spark):
    """Sub-window clips pad to one frame; non-WAV payloads route
    through the deterministic fake decoder without error."""
    import numpy as np
    import pandas as pd
    from bright_spark.multimodal import audio_spectrogram
    pcm16 = (np.ones(40) * 1000).astype("<i2")  # 40 samples << n_fft
    rows = [(1, _wav_bytes(pcm16, rate=8000), 5),
            (2, b"\xff\xfbOGGish-not-wav-payload", 100)]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload", "duration_ms"]))
    got = {r["media_id"]: r for r in
           audio_spectrogram(media, n_fft=64, hop=32, n_mels=4).collect()}
    assert got[1]["n_frames"] == 1
    assert got[2]["n_frames"] >= 1
    assert all(np.isfinite(got[m]["mel_mean"]).all() for m in (1, 2))
