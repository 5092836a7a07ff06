"""Round-8 operator tests: kmeans arithmetic auto-select + decimal
fold domain, k-means++ seeding, multivariate Cox, multi-lag Granger,
editdist double blocking, stream/batch sessionize twin."""

from __future__ import annotations

import math

import pytest


def _blob_df(spark, centers, n_per=20, dim=4, spread=0.05):
    """Deterministic separated blobs: point j of blob c is
    center_c + (j * spread / n_per) on every coordinate."""
    rows = []
    vid = 0
    for c, center in enumerate(centers):
        for j in range(n_per):
            off = j * spread / n_per
            rows.append((vid, [float(x) + off for x in center]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_auto_select_small_input_is_exact(spark):
    """exact=None at certification size must equal exact=True
    bit-for-bit (the auto-select resolves to the certified path)."""
    from econdatapipeline_spark.operators.kmeans import kmeans_lloyd

    df = _blob_df(spark, [[0.0] * 4, [1.0] * 4, [2.0] * 4])
    auto = kmeans_lloyd(df, k=3, rounds=2, seed_ids=[0, 20, 40]).collect()
    exact = kmeans_lloyd(
        df, k=3, rounds=2, seed_ids=[0, 20, 40], exact=True
    ).collect()
    assert [tuple(r) for r in auto] == [tuple(r) for r in exact]


def test_kmeans_auto_select_gate_picks_double_above_threshold(spark):
    """Above the gate the double path engages and yields the same
    clustering on separated data (twin-path identity, VERDICT r7 #3)."""
    from econdatapipeline_spark.operators import kmeans as km

    df = _blob_df(spark, [[0.0] * 4, [5.0] * 4])
    fin_fast, _ = km._fit(
        df, "embedding", "vec_id", 2, 2, [0, 20], None, False,
        exact_threshold=1,
    )
    fin_exact, _ = km._fit(
        df, "embedding", "vec_id", 2, 2, [0, 20], True, False
    )
    fast = {r["id"]: r["cluster"] for r in fin_fast.collect()}
    ex = {r["id"]: r["cluster"] for r in fin_exact.collect()}
    assert fast == ex
    # the gate actually selected the double path: dl is a double there
    assert dict(fin_fast.dtypes)["dl"] == "double"
    assert dict(fin_exact.dtypes)["dl"].startswith("decimal")


def test_kmeans_exact_fold_survives_large_magnitudes(spark):
    """Squared deviations past ~9.2e6 overflowed the old 1e12-scaled
    long fold to NULL (silently corrupting assignments via array_min's
    NULL-first sort, ADVICE r7 medium); the decimal(28,12) accumulator
    must cluster magnitude-1e5 blobs correctly."""
    from econdatapipeline_spark.operators.kmeans import kmeans_lloyd

    df = _blob_df(
        spark, [[0.0] * 4, [100000.0] * 4], n_per=10, spread=1.0
    )
    out = {
        r["cluster"]: r["n_vecs"]
        for r in kmeans_lloyd(
            df, k=2, rounds=2, seed_ids=[0, 10], exact=True
        ).collect()
    }
    assert out == {1: 10, 2: 10}
