"""Embedding-vector math as built-in array expressions.

``zip_with`` + ``aggregate`` keep dot products and norms inside the
JVM (no Python). Arithmetic is done in double even when the stored
column is array<float>, so results agree with any double-precision
oracle to ~1e-12 relative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, dims: tuple[int, ...] = (0, 7, 19, 33, 51)) -> Column:
    """Coordinate-sign LSH bucket: concat of sign bits at fixed dims.

    The simplest random-hyperplane LSH family (hyperplanes = coordinate
    axes). Vectors in the same bucket agree on the signs of the probed
    coordinates, so near (cosine) neighbors usually collide. At cluster
    scale, replace the axes with seeded random hyperplanes and more
    bits; the bucketing/join topology is identical.
    """
    bits = [
        F.when(F.element_at(a, d + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)


def quantize_scale(a: Column) -> Column:
    """Per-vector int8 quantization scale: max(|x_i|) / 127.

    Order-independent (max), so identical on any engine/partitioning.
    """
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))) / 127.0


def quantize(a: Column, scale: Column) -> Column:
    """Symmetric int8 quantization: q_i = floor(x_i / scale + 0.5).

    floor(x + 0.5) is round-half-up toward +inf — a single IEEE
    operation chain (cast, divide, add, floor) that any engine
    reproduces bit-for-bit, unlike round() whose half-way rule differs
    between implementations. Emitted as long for portable comparison;
    the storage cast to tinyint is the writer's concern.
    """
    return F.transform(a, lambda x: F.floor(x.cast("double") / scale + 0.5))
