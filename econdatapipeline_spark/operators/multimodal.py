"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature steps run as Arrow-batched Pandas UDFs
over ``mapInPandas`` so each task processes a columnar batch (the only
sane shape for 100 TB of media: bytes stay in the executor, Python sees
zero-copy Arrow buffers, batch size bounds peak memory).

PNG images decode for REAL via a pure-stdlib path (zlib inflate +
per-scanline unfilter, written from the public PNG specification,
RFC 2083 / W3C PNG): ``extract_features`` emits actual pixel
statistics for any 8-bit non-interlaced grayscale/RGB(A) PNG payload.
Other formats (JPEG/audio/video — codecs not in this container) fall
back to the deterministic byte-digest stub, clearly marked; the
Spark-side plumbing (schema, batching, partition behavior, UDF
signatures) is identical on both paths, so swapping a stub for a real
codec changes one function body and nothing in the plan.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_image_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decoder: deterministic pseudo-feature from the byte digest.

    The fallback for formats whose codecs are absent in this container
    (JPEG/WebP/...). A real deployment replaces this body with
    PIL/torchvision decode + model features. NotImplementedError
    intentionally NOT raised here so the distributed plumbing is
    exercisable end-to-end; raise instead if silent fakes are
    unacceptable in your deployment:

        raise NotImplementedError("image codec not available in this env")
    """
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _png_pixels(payload: bytes):
    """Pure-stdlib PNG decode -> (width, height, channels, pixels).

    Written from the public PNG specification (RFC 2083 / W3C
    PNG 1.2): chunk walk, IDAT concat + zlib inflate, then the five
    scanline filters (None/Sub/Up/Average/Paeth) undone in place.
    Handles 8-bit-depth, non-interlaced grayscale / RGB / gray+alpha /
    RGBA — the shapes a training corpus's thumbnail/sprite columns
    actually contain. Returns None for anything else (palette,
    16-bit, interlaced, truncated, or non-PNG payloads), which routes
    the row to the digest fallback rather than crashing a 100 TB scan
    over one bad file.
    """
    if not payload or not payload.startswith(_PNG_MAGIC):
        return None
    pos, width, idat = 8, None, bytearray()
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos:pos + 4])
            ctype = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            if len(data) != length:
                return None  # truncated chunk
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                (width, height, bit_depth, color_type,
                 _comp, _filt, interlace) = struct.unpack(">IIBBBBB", data)
                if (bit_depth != 8 or interlace != 0
                        or color_type not in _PNG_CHANNELS):
                    return None
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
        if width is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error):
        return None
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        return None
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        f = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if f == 1:  # Sub: left neighbor
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up: pixel above
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average of left and above (floor)
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            return None  # invalid filter byte
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, ch, bytes(out)


def _decode_image(payload: bytes, dim: int = 8) -> list[float]:
    """Feature vector: REAL pixel statistics for PNG, digest otherwise.

    PNG features (first 8 slots, zero-padded/truncated to ``dim``):
    [width, height, channels, mean/255, std/255, first-channel
    mean/255, last-channel mean/255, nonzero-byte fraction]. Integer
    sums + one final division keep the values engine- and
    batch-order-independent (exactly reproducible for parity hashing).
    """
    decoded = _png_pixels(payload)
    if decoded is None:
        return _decode_image_stub(payload, dim)
    width, height, ch, px = decoded
    n = len(px)
    s = sum(px)
    s2 = sum(b * b for b in px)
    mean = s / n
    var = max(s2 / n - mean * mean, 0.0)
    c0 = sum(px[0::ch]) / (n // ch)
    cl = sum(px[ch - 1::ch]) / (n // ch)
    nz = sum(1 for b in px if b) / n
    feats = [
        float(width), float(height), float(ch),
        mean / 255.0, var ** 0.5 / 255.0, c0 / 255.0, cl / 255.0, nz,
    ]
    return (feats + [0.0] * dim)[:dim]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """binary payloads -> fixed-width feature vectors via mapInPandas.

    Arrow-batched: each Python invocation receives a pandas chunk of a
    partition, emits one row per input row. Partitioning is preserved —
    no shuffle is introduced by feature extraction itself. PNG payloads
    decode for real (pixel-statistics features via the stdlib decoder);
    other formats take the digest fallback. When decode cost dominates
    (real images, not byte digests), fan_out the input first.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "digest": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _decode_image(b, dim)),
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame.

    Uses the metadata duration to synthesize frame timestamps with
    ``sequence`` + ``explode`` (pure column ops); the per-frame decode
    would attach via extract_features on the exploded rows. This is the
    Spark-shaped version of 'sample every Nth frame' — the expensive
    explode happens before the codec so frames parallelize across the
    cluster, not inside one task.
    """
    frames = media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Typed-metadata resize arithmetic (aspect-preserving), no decode.

    Demonstrates that geometry planning is metadata math — pure column
    expressions; only the pixel work needs the (stubbed) codec.
    """
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, max_side / F.greatest(w, h).cast("double")
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "media_type",
        (F.round(w * scale)).cast("int").alias("out_width"),
        (F.round(h * scale)).cast("int").alias("out_height"),
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — real stdlib codec, written from the public RIFF/WAVE
# format specification (Microsoft/IBM Multimedia Programming Interface
# and Data Specifications 1.0; the canonical 44-byte PCM layout).
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)


def encode_wav(samples: list[int], sample_rate: int, n_channels: int) -> bytes:
    """16-bit little-endian PCM WAV bytes from interleaved samples."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, block_align, 16
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def _wav_pcm(payload: bytes):
    """RIFF chunk walk -> (n_channels, sample_rate, samples) for 16-bit
    PCM WAV; None for anything else (truncated, compressed, non-WAV),
    which routes to the caller's fallback. Chunks may appear in any
    order and carry odd-length padding per the RIFF spec."""
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF":
        return None
    if payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            return None  # truncated chunk
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # odd chunks pad to word boundary
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        return None
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return n_ch, rate, samples


def extract_audio_features(media: DataFrame) -> DataFrame:
    """binary WAV payloads -> real audio statistics via mapInPandas.

    For 16-bit PCM WAV: sample rate, channel count, frame count,
    duration, RMS amplitude and absolute peak — integer sums + one
    final sqrt, so values are batch-order-independent and exactly
    reproducible (parity-hashable). Non-WAV payloads emit null stats
    with the byte count only (the honest fallback — no audio codecs
    beyond PCM exist in this container). Partitioning is preserved;
    decode parallelizes per Arrow batch.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "n_bytes": [], "sample_rate": [],
                "n_channels": [], "n_frames": [], "duration_ms": [],
                "rms": [], "peak": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["n_bytes"].append(len(b))
                decoded = _wav_pcm(b)
                if decoded is None:
                    for k in ("sample_rate", "n_channels", "n_frames",
                              "duration_ms", "rms", "peak"):
                        out[k].append(None)
                    continue
                n_ch, rate, samples = decoded
                n_frames = len(samples) // n_ch
                s2 = sum(s * s for s in samples)
                rms = round(math.sqrt(s2 / len(samples)), 6) if samples else 0.0
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["n_frames"].append(n_frames)
                out["duration_ms"].append(n_frames * 1000 // rate)
                out["rms"].append(rms)
                out["peak"].append(max(abs(s) for s in samples) if samples else 0)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        kernel, AUDIO_FEATURE_SCHEMA
    )


def synth_wav_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM test corpus: one WAV payload per input row,
    samples defined by the integer formula

        s_i = ((id * 7919 + i * 104729) mod 65536) − 32768

    over n_frames = 100 + id % 50 frames, 1 + id % 2 channels,
    8000 + (id % 3) * 4000 Hz. Because the waveform IS a formula, an
    SQL oracle can recompute every statistic the real decoder emits —
    certifying the full encode -> RIFF parse -> aggregate path, not a
    fixture hash."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf[id_col]:
                i = int(did)
                n_ch = 1 + i % 2
                rate = 8000 + (i % 3) * 4000
                n = (100 + i % 50) * n_ch
                samples = [
                    ((i * 7919 + j * 104729) % 65536) - 32768 for j in range(n)
                ]
                ids.append(i)
                payloads.append(encode_wav(samples, rate, n_ch))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    return df.select(id_col).mapInPandas(kernel, schema)
