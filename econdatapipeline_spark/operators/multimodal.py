"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature steps run as Arrow-batched Pandas UDFs
over ``mapInPandas`` so each task processes a columnar batch (the only
sane shape for 100 TB of media: bytes stay in the executor, Python sees
zero-copy Arrow buffers, batch size bounds peak memory).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are deterministic fakes behind ``_decode_image_stub``
— clearly marked; the Spark-side plumbing (schema, batching, partition
behavior, UDF signatures) is real and tested. Swapping a stub for a real
codec changes one function body and nothing in the plan.
"""

from __future__ import annotations

import hashlib
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

    A real deployment replaces this body with PIL/torchvision decode +
    model features. NotImplementedError intentionally NOT raised here so
    the distributed plumbing is exercisable end-to-end; raise instead if
    silent fakes are unacceptable in your deployment:

        raise NotImplementedError("image codec not available in this env")
    """
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """binary payloads -> fixed-width feature vectors via mapInPandas.

    Arrow-batched: each Python invocation receives a pandas chunk of a
    partition, emits one row per input row. Partitioning is preserved —
    no shuffle is introduced by feature extraction itself. When the
    decode kernel is a real codec (expensive per row), fan_out the input
    first; the stub digest is too cheap to justify the extra shuffle.
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
                    "feature": payloads.map(lambda b: _decode_image_stub(b, dim)),
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
