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


# -- real PNG decode path (stdlib zlib + unfilter) ----------------------

def _encode_png(pixels, width, height, channels, filters):
    """Minimal PNG writer for the tests: applies the given per-row
    filter types (the inverse transform of decoding) and emits real
    chunks with CRCs — an independent implementation of the spec the
    decoder is checked against."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    raw = bytearray()
    prev = bytes(stride)
    for y, f in zip(range(height), filters):
        line = bytes(pixels[y * stride:(y + 1) * stride])
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, channels - 1, -1):
                enc[i] = (enc[i] - line[i - channels]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                enc[i] = (enc[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (enc[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_roundtrip_all_filters(spark):
    """Every PNG scanline filter (None/Sub/Up/Average/Paeth) must undo
    to the original pixels."""
    import random

    rng = random.Random(42)
    w, h, ch = 6, 5, 3
    pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
    for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h,
                    [0, 1, 2, 3, 4]):
        png = _encode_png(pixels, w, h, ch, filters)
        got = M._png_pixels(png)
        assert got is not None, filters
        gw, gh, gch, gpx = got
        assert (gw, gh, gch) == (w, h, ch)
        assert gpx == pixels, f"filters {filters}"


def test_png_features_are_pixel_statistics(spark):
    """extract_features emits REAL pixel stats for a PNG payload —
    checked against an independently computed reference — and the
    digest fallback for a non-PNG payload."""
    w, h, ch = 4, 3, 1
    pixels = bytes([0, 51, 102, 153, 204, 255, 0, 51, 102, 153, 204, 255])
    png = _encode_png(pixels, w, h, ch, [0, 2, 4])
    rows = [(1, png, "image", (w, h, None, "png")),
            (2, b"JFIF not a png", "image", (9, 9, None, "jpeg"))]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    feats = {r["media_id"]: r["feature"]
             for r in M.extract_features(media, dim=8).collect()}

    n = len(pixels)
    mean = sum(pixels) / n
    var = sum(b * b for b in pixels) / n - mean * mean
    expect = [float(w), float(h), float(ch), mean / 255.0,
              var ** 0.5 / 255.0, mean / 255.0, mean / 255.0,
              sum(1 for b in pixels if b) / n]
    assert feats[1] == pytest.approx(expect, abs=1e-12)
    assert feats[2] == M._decode_image_stub(b"JFIF not a png", 8)


def test_png_decoder_rejects_unsupported_shapes(spark):
    """Palette/16-bit/interlaced/truncated payloads route to the digest
    fallback (None), never crash."""
    import struct
    import zlib

    w, h = 2, 2
    pixels = bytes(range(w * h))
    good = _encode_png(pixels, w, h, 1, [0, 0])
    assert M._png_pixels(good) is not None
    assert M._png_pixels(good[:20]) is None          # truncated
    assert M._png_pixels(b"") is None                # empty
    assert M._png_pixels(None) is None               # null payload
    assert M._png_pixels(b"\x89PNG fake bytes") is None  # bad magic tail
    # palette color type (3) unsupported
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    body = b"IHDR" + ihdr
    pal = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + body
           + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))
    assert M._png_pixels(pal) is None


def test_wav_roundtrip_stats(spark):
    from econdatapipeline_spark.operators.multimodal import (
        encode_wav,
        extract_audio_features,
    )
    import math

    samples = [0, 100, -100, 32767, -32768, 50]
    payload = encode_wav(samples, sample_rate=8000, n_channels=2)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "media_id long, payload binary")
    r = extract_audio_features(df).collect()[0]
    assert r["sample_rate"] == 8000 and r["n_channels"] == 2
    assert r["n_frames"] == 3  # 6 samples / 2 channels
    assert r["peak"] == 32768
    expected_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert abs(r["rms"] - round(expected_rms, 6)) < 1e-9
    assert r["duration_ms"] == 3 * 1000 // 8000


def test_wav_parser_handles_extra_chunks(spark):
    """RIFF chunks may appear in any order with padding; a LIST chunk
    before fmt/data must not break the walk."""
    from econdatapipeline_spark.operators.multimodal import (
        _wav_pcm,
        encode_wav,
    )
    import struct

    base = encode_wav([1, 2, 3], 16000, 1)
    # splice an odd-sized LIST chunk right after the WAVE tag
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    patched = base[:12] + junk + base[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    got = _wav_pcm(patched)
    assert got == (1, 16000, [1, 2, 3])


def test_wav_fallback_on_garbage(spark):
    from econdatapipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not a wav")), (2, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert rows[1]["sample_rate"] is None and rows[1]["n_bytes"] == 9
    assert rows[2]["rms"] is None and rows[2]["n_bytes"] == 0


def test_wav_truncated_data_rejected(spark):
    from econdatapipeline_spark.operators.multimodal import (
        _wav_pcm,
        encode_wav,
    )

    payload = encode_wav([1, 2, 3, 4], 8000, 1)
    assert _wav_pcm(payload[:-3]) is None  # truncated data chunk
