"""Multimodal plumbing tests: schema, batching, fan-out, stub behavior."""

import pytest


@pytest.fixture(scope="module")
def media(spark):
    from qurious_spark.operators.multimodal import synthetic_media

    return synthetic_media(spark, n=32, kind="image").cache()


def test_decode_image_features_fake(spark, media):
    from qurious_spark.operators.multimodal import decode_image_features

    feats = decode_image_features(media, deterministic_fake=True, batch_partitions=4)
    rows = feats.collect()
    assert len(rows) == 32
    r = rows[0]
    assert r.width == 64 and r.height == 48
    assert 0.0 <= r.mean_luma <= 255.0
    assert len(r.feature) == 8
    # deterministic: same input → same features on re-run
    again = {x.media_id: x.feature for x in decode_image_features(media, True).collect()}
    assert again[r.media_id] == r.feature


def test_decode_real_is_stubbed(spark, media):
    from qurious_spark.operators.multimodal import decode_image_features

    with pytest.raises(Exception) as exc_info:
        decode_image_features(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sampling_fanout(spark):
    from qurious_spark.operators.multimodal import sample_frames, synthetic_media

    vids = synthetic_media(spark, n=8, kind="video")
    frames = sample_frames(vids, every_nth=4)
    rows = frames.collect()
    # 16 frames per video, every 4th → 4 frames each
    assert len(rows) == 8 * 4
    assert {r.frame_idx for r in rows} == {0, 4, 8, 12}
    assert all(len(bytes(r.frame_blob)) > 0 for r in rows)


def test_media_stats_prunes_blob(spark, media):
    from qurious_spark.operators.multimodal import media_stats

    stats = media_stats(media).collect()
    assert stats[0].n == 32
    assert stats[0].total_bytes == 32 * 128


def test_audio_features_fake_decode(spark):
    from qurious_spark.operators.multimodal import (
        decode_audio_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=8, kind="audio")
    out = decode_audio_features(media, deterministic_fake=True).collect()
    assert len(out) == 8
    assert all(r.n_samples == 128 and r.sample_rate == 16000 for r in out)
    assert all(r.rms > 0 for r in out)
    # deterministic: same input -> same features
    again = decode_audio_features(media, deterministic_fake=True).collect()
    assert sorted(r.rms for r in out) == sorted(r.rms for r in again)


def test_audio_decode_stub_raises_without_fake(spark):
    import pytest as _pytest

    from qurious_spark.operators.multimodal import (
        decode_audio_features,
        synthetic_media,
    )

    with _pytest.raises(Exception, match="NotImplementedError|audio"):
        decode_audio_features(synthetic_media(spark, n=2, kind="audio")).collect()


def test_resize_images_fake_decode(spark):
    from qurious_spark.operators.multimodal import resize_images, synthetic_media

    media = synthetic_media(spark, n=4, kind="image")
    out = resize_images(media, out_width=16, out_height=12, deterministic_fake=True).collect()
    assert len(out) == 4
    assert all(r.width == 16 and r.height == 12 for r in out)
    assert all(len(bytes(r.pixels)) == 16 * 12 for r in out)
