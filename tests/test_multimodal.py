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
