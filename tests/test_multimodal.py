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
