"""Multimodal binary-column plumbing tests: schema, batching, UDF
signature, deterministic fake decode (real codecs stubbed per brief)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from zhtml_spark.multimodal import (
    extract_media_features,
    frame_sample_refs,
    resize_dims,
)


@pytest.fixture()
def media(spark):
    rows = [
        ("m-1", "image", b"\x89PNG fake bytes", 800, 600, None),
        ("m-2", "video", b"\x00\x00ftyp fake", 1920, 1080, 8000),
        ("m-3", "audio", b"RIFF fake wav", None, None, 2500),
    ]
    return spark.createDataFrame(
        rows,
        "media_ref string, media_kind string, payload binary, "
        "width int, height int, duration_ms long",
    )


def test_feature_extraction_deterministic(spark, media):
    out = {r["media_ref"]: r for r in
           extract_media_features(media, n_features=8).collect()}
    assert set(out) == {"m-1", "m-2", "m-3"}
    want = hashlib.md5(b"\x89PNG fake bytes").hexdigest()
    assert out["m-1"]["checksum"] == want
    feats = out["m-1"]["features"]
    assert len(feats) == 8
    assert all(0.0 <= f <= 1.0 for f in feats)
    # derived from the digest, reproducible
    assert feats[0] == round(int(want[0:4], 16) / 65535.0, 6)


def test_real_decode_raises_at_integration_point(spark, media):
    with pytest.raises(Exception) as exc_info:
        extract_media_features(media, real=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_resize_dims_aspect_ratio(spark, media):
    out = {r["media_ref"]: r for r in resize_dims(media, 512).collect()}
    assert (out["m-1"]["target_width"], out["m-1"]["target_height"]) == (
        512, 384)
    assert (out["m-2"]["target_width"], out["m-2"]["target_height"]) == (
        512, 288)


def test_frame_sample_even_spacing(spark, media):
    rows = frame_sample_refs(media, n_frames=4).collect()
    assert {r["media_ref"] for r in rows} == {"m-2"}  # only video
    by_idx = sorted((r["frame_idx"], r["frame_ms"], r["frame_ref"])
                    for r in rows)
    assert by_idx == [
        (0, 1000, "m-2#f0"),
        (1, 3000, "m-2#f1"),
        (2, 5000, "m-2#f2"),
        (3, 7000, "m-2#f3"),
    ]
