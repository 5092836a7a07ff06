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
