"""Multimodal plumbing: opaque binary columns, mapInPandas decode/resize,
frame sampling, metadata aggregation. The decode/resample bodies are
deterministic fakes (no media libs in the container); the Spark-side
schemas, batch iteration, and output shapes are the real contract."""

import pytest


@pytest.fixture(scope="module")
def media(spark):
    from yckg_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        ("m1", "image", "image/png", b"\x89PNG-fake-1", 1024, 768, None),
        ("m2", "image", "image/jpeg", b"\xff\xd8-fake-2", 100, 50, None),
        ("m3", "image", "image/png", None, None, None, None),
        ("m4", "video", "video/mp4", b"\x00mp4-fake", 1920, 1080, 3500),
        ("m5", "audio", "audio/wav", b"RIFF-fake", None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(spark, media):
    from yckg_spark.operators.multimodal import FEATURE_DIM, extract_features

    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(out) == 5
    assert out["m1"]["n_bytes"] == len(b"\x89PNG-fake-1")
    assert len(out["m1"]["feature"]) == FEATURE_DIM
    assert out["m3"]["feature"] is None and out["m3"]["n_bytes"] == 0
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again["m1"] == out["m1"]["feature"]


def test_resize_images_aspect_and_nulls(spark, media):
    from yckg_spark.operators.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(media, max_side=256).collect()}
    assert set(out) == {"m1", "m2", "m3"}          # images only
    assert (out["m1"]["width"], out["m1"]["height"]) == (256, 192)  # 4:3 kept
    assert len(out["m1"]["payload"]) == 256 * 192 * 3
    assert (out["m2"]["width"], out["m2"]["height"]) == (100, 50)   # under max: untouched
    assert out["m3"]["payload"] is None            # no dims -> null row


def test_resize_real_path_raises(spark, media):
    from yckg_spark.operators.multimodal import resize_images

    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        resize_images(media, fake=False).collect()


def test_sample_frames(spark, media):
    from yckg_spark.operators.multimodal import sample_frames

    rows = sample_frames(media, every_ms=1000).collect()
    assert {r["media_id"] for r in rows} == {"m4"}
    assert sorted(r["frame_ts_ms"] for r in rows) == [0, 1000, 2000, 3000]


def test_media_stats(spark, media):
    from yckg_spark.operators.multimodal import media_stats

    s = {r["kind"]: r for r in media_stats(media).collect()}
    assert s["image"]["n"] == 3
    assert s["video"]["avg_duration_ms"] == 3500.0
