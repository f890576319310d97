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


def _make_bmp(width, height, pixel_rows, top_down=False):
    """Hand-assembled uncompressed 24-bit BMP: ``pixel_rows`` is
    height rows (top to bottom) of (r, g, b) tuples."""
    import struct

    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    data = bytearray()
    storage_rows = pixel_rows if top_down else list(reversed(pixel_rows))
    for row in storage_rows:
        for (r, g, b) in row:
            data += bytes([b, g, r])
        data += b"\x00" * (stride - row_bytes)
    offset = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", offset + len(data), 0, 0, offset)
    h = -height if top_down else height
    info = struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return bytes(hdr + info + data)


_PX = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(0, 0, 0), (255, 255, 255), (128, 64, 32)],
]


def test_decode_bmp_real_no_fake(spark):
    """The one codec-free raster format decodes FOR REAL: a hand-assembled
    3×2 24-bit BMP (odd width ⇒ row padding exercised) through
    ``decode_bmp`` and through the full mapInPandas pipeline with
    ``fake=False`` yields the hand-computed channel statistics."""
    import pytest as _pytest

    from yckg_spark.operators.multimodal import (
        FEATURE_DIM,
        MEDIA_SCHEMA,
        decode_bmp,
        extract_features,
        is_bmp,
    )

    payload = _make_bmp(3, 2, _PX)
    assert is_bmp(payload)
    w, h, feat = decode_bmp(payload)
    assert (w, h) == (3, 2) and len(feat) == FEATURE_DIM

    flat = [p for row in _PX for p in row]
    n = len(flat)
    mean_b = sum(p[2] for p in flat) / n / 255.0
    mean_g = sum(p[1] for p in flat) / n / 255.0
    mean_r = sum(p[0] for p in flat) / n / 255.0
    lumas = [0.299 * r + 0.587 * g + 0.114 * b for (r, g, b) in flat]
    expect = [mean_b, mean_g, mean_r, sum(lumas) / n / 255.0,
              min(lumas) / 255.0, max(lumas) / 255.0, 3 / 65536.0, 2 / 65536.0]
    assert feat == _pytest.approx(expect, rel=1e-12)

    media = spark.createDataFrame(
        [("b1", "image", "image/bmp", payload, 3, 2, None)], MEDIA_SCHEMA
    )
    row = extract_features(media, fake=False).collect()[0]
    assert row["n_bytes"] == len(payload)
    # feature column is float32 — compare at float32 precision
    assert list(row["feature"]) == _pytest.approx(expect, rel=1e-6)


def test_decode_bmp_top_down_same_stats(spark):
    """Negative-height (top-down) BMPs decode to the same statistics —
    row order can't change channel means/extrema."""
    from yckg_spark.operators.multimodal import decode_bmp

    bu = decode_bmp(_make_bmp(3, 2, _PX))
    td = decode_bmp(_make_bmp(3, 2, _PX, top_down=True))
    assert bu == td


def test_extract_features_non_bmp_still_raises(spark, media):
    """fake=False remains a declared stub for compressed formats: the PNG/
    JPEG fixture payloads are not decodable BMPs and must raise."""
    import pytest as _pytest

    from yckg_spark.operators.multimodal import extract_features

    with _pytest.raises(Exception, match="NotImplementedError|Pillow|BMP"):
        extract_features(media, fake=False).collect()


def test_decode_bmp_truncated_payload_raises(spark):
    from yckg_spark.operators.multimodal import decode_bmp, is_bmp

    payload = _make_bmp(3, 2, _PX)[:-4]
    assert is_bmp(payload)  # header intact — the pixel data is short
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(payload)
