"""Multimodal plumbing: mapInPandas schemas, batching, frame sampling.
The decode kernels are deterministic stubs (no codecs in container);
the Spark-side shape is what's under test."""

import pytest

from big_data_hdfs_ray_vs_spark_spark.operators import multimodal


def test_synthetic_media_schema(spark):
    m = multimodal.synthetic_media(spark, n=30)
    assert m.count() == 30
    kinds = {r["kind"] for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_shape(spark):
    m = multimodal.synthetic_media(spark, n=30)
    feats = multimodal.image_features(m)
    rows = feats.collect()
    n_images = m.filter("kind = 'image'").count()
    assert len(rows) == n_images
    for r in rows:
        assert len(r["feat"]) == 8
        assert 0.0 <= r["mean_byte"] <= 255.0
        assert r["width"] >= 1 and r["height"] >= 1


def test_image_features_deterministic(spark):
    m = multimodal.synthetic_media(spark, n=24, partitions=2)
    a = sorted(map(str, multimodal.image_features(m).collect()))
    m2 = multimodal.synthetic_media(spark, n=24, partitions=5)
    b = sorted(map(str, multimodal.image_features(m2).collect()))
    assert a == b  # partition layout must not change results


def test_frame_sample_counts(spark):
    m = multimodal.synthetic_media(spark, n=30)
    frames = multimodal.frame_sample(m, every_n=30)
    got = {r["media_id"]: 0 for r in frames.collect()}
    for r in frames.collect():
        got[r["media_id"]] += 1
    vids = {r["media_id"]: r["meta"]["n_frames"]
            for r in m.filter("kind = 'video'").collect()}
    assert set(got) == set(vids)
    for mid, n_frames in vids.items():
        assert got[mid] == (n_frames + 29) // 30  # ceil(n/30) sampled


def test_audio_features_honest_stub(spark):
    m = multimodal.synthetic_media(spark, n=6)
    with pytest.raises(NotImplementedError):
        multimodal.audio_features(m)


# ------------------------------------------------- kernel dispatch
def test_decode_dispatch_default_is_stub_even_with_pil(monkeypatch):
    # the default kernel must stay the oracle-pinned stub EVEN when
    # PIL is importable — a PIL install must not flip gate outputs
    monkeypatch.setattr(multimodal, "_HAS_PIL", True)
    payload = b"media-payload-0000000000000042"
    assert multimodal._decode_image(payload, 4, 4) == multimodal._decode_image_stub(
        payload, 4, 4
    )


def test_decode_dispatch_real_requires_pil(monkeypatch):
    monkeypatch.setattr(multimodal, "_HAS_PIL", False)
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal._decode_image(b"xx", 4, 4, use_real=True)


def test_decode_dispatch_real_selects_real_kernel(monkeypatch):
    monkeypatch.setattr(multimodal, "_HAS_PIL", True)
    monkeypatch.setattr(
        multimodal, "_decode_image_real", lambda p, w, h: [42.0] * 8
    )
    assert multimodal._decode_image(b"xx", 4, 4, use_real=True) == [42.0] * 8


def test_image_features_real_decode_fails_cleanly_without_pil(spark):
    if multimodal._HAS_PIL:  # pragma: no cover - container has no PIL
        pytest.skip("PIL present: the driver-side guard does not apply")
    m = multimodal.synthetic_media(spark, n=6)
    # driver-side check — no Spark job may start before the refusal
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.image_features(m, use_real_decode=True)
