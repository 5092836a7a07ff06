"""Power-iteration PCA tests (operators/pca)."""

from __future__ import annotations

import math

import pytest

from econdatapipeline_spark.operators.pca import pca_power


def test_pca_recovers_dominant_direction(spark):
    # variance 25 along (1,1)/sqrt(2) in dims 1-2, tiny in dim 3:
    # loadings must align with the diagonal and explain ~all variance
    rows = []
    for i in range(-10, 11):
        rows.append(([float(i), float(i), 0.01 * (i % 3)],))
    df = spark.createDataFrame(rows, "embedding array<float>")
    out = {r["dim"]: r for r in pca_power(df, dims=3, rounds=12).collect()}
    v = [out[k]["loading"] for k in (1, 2, 3)]
    assert abs(abs(v[0]) - 1 / math.sqrt(2)) < 1e-3
    assert abs(v[0] - v[1]) < 1e-6  # equal loadings on the diagonal
    assert abs(v[2]) < 0.01
    assert out[1]["explained"] > 0.99
    # unit norm (9-dec quantized)
    assert abs(sum(x * x for x in v) - 1.0) < 1e-6


def test_pca_eigenvalue_matches_variance(spark):
    # data on a single axis: eigenvalue == population variance of dim 1
    vals = [2.0, 4.0, 6.0, 8.0]
    df = spark.createDataFrame(
        [([v, 0.0],) for v in vals], "embedding array<float>"
    )
    out = pca_power(df, dims=2, rounds=8).collect()
    lam = out[0]["eigenvalue"]
    mean = sum(vals) / len(vals)
    pop_var = sum((v - mean) ** 2 for v in vals) / len(vals)
    assert abs(lam - pop_var) < 1e-6
    assert out[0]["explained"] == 1.0
    with pytest.raises(ValueError):
        pca_power(df, rounds=0)
