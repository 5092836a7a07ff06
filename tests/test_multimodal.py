"""Multimodal plumbing tests (schema, batching, UDF signature — decode is stubbed)."""

from __future__ import annotations

import hashlib

import pytest

from econdatapipeline_spark.operators import multimodal as M


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"\x89PNG fake bytes 1", "image", (640, 480, None, "png")),
        (2, b"\x89PNG fake bytes 22", "image", (1920, 1080, None, "png")),
        (3, b"RIFF fake wav", "audio", (None, None, 5000, "pcm")),
        (4, None, "image", (100, 50, None, "png")),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_features_shape(spark, media):
    out = M.extract_features(media, dim=8).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == len(b"\x89PNG fake bytes 1")
    assert by_id[4]["n_bytes"] == 0  # null payload handled
    assert all(len(r["feature"]) == 8 for r in out)
    # Deterministic digest matches local hashlib.
    assert by_id[3]["digest"] == hashlib.sha256(b"RIFF fake wav").hexdigest()


def test_feature_determinism(spark, media):
    a = {r["media_id"]: r["feature"] for r in M.extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in M.extract_features(media).collect()}
    assert a == b


def test_frame_sample_plan(spark, media):
    frames = M.frame_sample_plan(media, every_ms=1000).collect()
    audio_frames = [r for r in frames if r["media_id"] == 3]
    assert len(audio_frames) == 6  # 0..5000 step 1000
    img_frames = [r for r in frames if r["media_id"] == 1]
    assert len(img_frames) == 1  # no duration -> single frame at 0


def test_resize_meta(spark, media):
    out = {r["media_id"]: (r["out_width"], r["out_height"])
           for r in M.resize_meta(media, max_side=256).collect()}
    assert out[1] == (256, 192)       # 640x480 scaled by 256/640
    assert out[2] == (256, 144)       # 1920x1080
    assert out[4] == (100, 50)        # under max: untouched
