"""Round-11 operators: var_irf_orth (+FEVD), bk_filter,
seasonal_decompose multiplicative mode.

House pattern: replay each operator against an independent numpy twin
on seeded data (the twin computes the textbook form, not the
operator's expanded generated steps, so agreement cross-validates the
algebra), plus validation and degenerate-input gates.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

NAMES = ("a", "b", "c")


def _var_sim3(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    A1 = np.array([[0.5, 0.1, 0.0], [0.0, 0.4, 0.1], [0.1, 0.0, 0.3]])
    A2 = np.eye(3) * 0.1
    Y = np.zeros((n, 3))
    for t in range(2, n):
        Y[t] = (
            A1 @ Y[t - 1]
            + A2 @ Y[t - 2]
            + rng.normal(0, 1, 3)
            + [0.2, 0.1, 0.3]
        )
    return np.round(Y, 6)


def _np_orth(Y: np.ndarray):
    """Textbook twin: per-equation OLS -> Phi_h -> Cholesky ->
    Theta_h = Phi_h L -> cumulative FEVD shares."""
    n = len(Y)
    X = np.column_stack(
        [np.ones(n - 2)]
        + [Y[2 - l : n - l, e] for e in range(3) for l in (1, 2)]
    )
    B = np.column_stack(
        [np.linalg.lstsq(X, Y[2:, e], rcond=None)[0] for e in range(3)]
    )
    E = Y[2:] - X @ B
    S = E.T @ E / (n - 2 - 7)
    L = np.linalg.cholesky(S)
    A1 = np.zeros((3, 3))
    A2 = np.zeros((3, 3))
    for e in range(3):
        for s in range(3):
            A1[e, s] = B[1 + s * 2, e]
            A2[e, s] = B[2 + s * 2, e]
    Phi = [np.eye(3), A1, A1 @ A1 + A2]
    Th = [P @ L for P in Phi]
    shares = []
    for h in range(3):
        num = sum(Th[j] ** 2 for j in range(h + 1))
        shares.append(num / num.sum(axis=1, keepdims=True))
    return Th, shares


def test_var_irf_orth_matches_numpy_cholesky_rotation(spark):
    from econdatapipeline_spark.operators.timeseries import var_irf_orth

    n = 240
    Y = _var_sim3(n)
    df = spark.createDataFrame(
        [
            ("g", t, float(Y[t, 0]), float(Y[t, 1]), float(Y[t, 2]))
            for t in range(n)
        ],
        "dataset string, date long, a double, b double, c double",
    )
    out = {
        (r["h"], r["shock"], r["response"]): (
            r["irf_orth"],
            r["fevd_share"],
        )
        for r in var_irf_orth(
            df, ["a", "b", "c"], order_col="date", lags=2, horizons=2
        ).collect()
    }
    assert len(out) == 27
    Th, shares = _np_orth(Y)
    for h in range(3):
        for e in range(3):
            for s in range(3):
                th, sh = out[(h, NAMES[s], NAMES[e])]
                assert th == pytest.approx(Th[h][e, s], abs=1e-4), (
                    h,
                    e,
                    s,
                )
                assert sh == pytest.approx(
                    shares[h][e, s], abs=1e-4
                ), (h, e, s)
    # shares across shocks sum to 1 for every (h, response)
    for h in range(3):
        for e in range(3):
            tot = sum(out[(h, NAMES[s], NAMES[e])][1] for s in range(3))
            assert tot == pytest.approx(1.0, abs=3e-6)
    # h=0 identification: response e cannot load on a later-ordered
    # shock s > e (lower-triangular impact matrix)
    for e in range(3):
        for s in range(e + 1, 3):
            assert out[(0, NAMES[s], NAMES[e])][0] == 0.0
            assert out[(0, NAMES[s], NAMES[e])][1] == 0.0


def test_var_irf_orth_validation_and_degenerate(spark):
    from econdatapipeline_spark.operators.timeseries import var_irf_orth

    Y = _var_sim3(60)
    df = spark.createDataFrame(
        [
            ("g", t, float(Y[t, 0]), float(Y[t, 1]), float(Y[t, 2]))
            for t in range(60)
        ],
        "dataset string, date long, a double, b double, c double",
    )
    with pytest.raises(ValueError):
        var_irf_orth(df, ["a"], lags=1)
    with pytest.raises(ValueError):
        var_irf_orth(df, ["a", "b", "c"], lags=3)
    with pytest.raises(ValueError):
        var_irf_orth(df, ["a", "b", "c"], lags=2, horizons=4)
    # collinear series -> singular design -> every output NULL, rows kept
    dup = spark.createDataFrame(
        [("g", t, 1.0 * t, 2.0 * t, 3.0 * t) for t in range(40)],
        "dataset string, date long, a double, b double, c double",
    )
    rows = var_irf_orth(
        dup, ["a", "b", "c"], order_col="date", lags=2, horizons=2
    ).collect()
    assert len(rows) == 27
    assert all(
        r["irf_orth"] is None and r["fevd_share"] is None for r in rows
    )


# ---------------------------------------------------------------------------
# bk_filter
# ---------------------------------------------------------------------------


def test_bk_weights_zero_sum_and_symmetry():
    from econdatapipeline_spark.operators.timeseries import bk_weights

    w = bk_weights(6, 32, 12)
    assert len(w) == 25
    assert abs(sum(w)) < 1e-15
    assert w == w[::-1]
    with pytest.raises(ValueError):
        bk_weights(1, 32, 12)
    with pytest.raises(ValueError):
        bk_weights(32, 6, 12)
    with pytest.raises(ValueError):
        bk_weights(6, 32, 0)


def _bk_df(spark, vals):
    return spark.createDataFrame(
        [("g", t, float(v)) for t, v in enumerate(vals)],
        "dataset string, date long, y double",
    )


def test_bk_filter_annihilates_constant_and_linear_trend(spark):
    from econdatapipeline_spark.operators.timeseries import bk_filter

    n, K = 60, 12
    for series in ([100.0] * n, [5.0 + 0.25 * t for t in range(n)]):
        rows = (
            bk_filter(_bk_df(spark, series), "y", order_col="date")
            .orderBy("date")
            .collect()
        )
        assert len(rows) == n
        for t, r in enumerate(rows):
            if t < K or t >= n - K:
                assert r["cycle"] is None, t
            else:
                # zero-sum kills constants; symmetry kills the slope
                assert abs(r["cycle"]) < 1e-6, (t, r["cycle"])


def test_bk_filter_linearity_and_band_pass(spark):
    import math

    from econdatapipeline_spark.operators.timeseries import (
        bk_filter,
        bk_weights,
    )

    n, K = 120, 12
    x = [math.sin(2.0 * math.pi * t / 12.0) for t in range(n)]  # in band
    y = [math.sin(2.0 * math.pi * t / 2.5) for t in range(n)]  # too fast
    z = [0.1 * t for t in range(n)]
    cx = {
        r["date"]: r["cycle"]
        for r in bk_filter(_bk_df(spark, x), "y", order_col="date").collect()
    }
    cy = {
        r["date"]: r["cycle"]
        for r in bk_filter(_bk_df(spark, y), "y", order_col="date").collect()
    }
    cxyz = {
        r["date"]: r["cycle"]
        for r in bk_filter(
            _bk_df(spark, [a + b + c for a, b, c in zip(x, y, z)]),
            "y",
            order_col="date",
        ).collect()
    }
    interior = range(K, n - K)
    # linearity: filter(x+y+trend) == filter(x) + filter(y) on the grid
    for t in interior:
        assert cxyz[t] == pytest.approx(cx[t] + cy[t], abs=3e-6), t
    # band-pass: the 12-period sine passes ~unity, the 2.5-period one
    # is strongly attenuated
    gx = max(abs(cx[t]) for t in interior)
    gy = max(abs(cy[t]) for t in interior)
    assert gx > 0.8
    assert gy < 0.15
    # exact twin: the interior cycle is the literal weighted sum
    w = bk_weights(6, 32, 12)
    t0 = 40
    ref = sum(w[j + K] * x[t0 + j] for j in range(-K, K + 1))
    assert cx[t0] == pytest.approx(ref, abs=1e-6)


# ---------------------------------------------------------------------------
# seasonal_decompose: multiplicative mode + period-coverage gate
# ---------------------------------------------------------------------------


def _amp_growing(n=96):
    """Monthly level series whose seasonal swing grows with the level
    — the multiplicative-model fixture."""
    import math

    base = [100.0 * (1.02 ** (t / 12.0)) for t in range(n)]
    seas = [1.0 + 0.2 * math.sin(2.0 * math.pi * t / 12.0) for t in range(n)]
    return [round(b * s, 6) for b, s in zip(base, seas)]


def _sd_df(spark, vals):
    import datetime

    rows = [
        (
            "g",
            datetime.date(2000 + t // 12, t % 12 + 1, 1),
            float(v),
        )
        for t, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "dataset string, date date, v double")


def test_seasonal_decompose_mult_identity_and_recovery(spark):
    from econdatapipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    vals = _amp_growing()
    out = (
        seasonal_decompose(
            _sd_df(spark, vals), "v", period="month", model="multiplicative"
        )
        .orderBy("date")
        .collect()
    )
    assert len(out) == len(vals)
    # identity: value = trend * seasonal * remainder (within grid noise)
    for r in out:
        prod = r["trend"] * r["seasonal"] * r["remainder"]
        assert prod == pytest.approx(r["value"], rel=2e-5), r
    # the 12 monthly indices renormalize to mean ~1 and recover the
    # planted multiplicative swing's ordering (peak month > trough)
    idx = {}
    for r in out:
        idx[r["date"].month] = r["seasonal"]
    assert sum(idx.values()) / 12.0 == pytest.approx(1.0, abs=5e-3)
    assert idx[4] > 1.05  # sin peak near month 4 (t%12 == 3)
    assert idx[10] < 0.95  # trough near month 10
    # additive on the same fixture: seasonal sums to ~0 instead
    add = (
        seasonal_decompose(_sd_df(spark, vals), "v", period="month")
        .orderBy("date")
        .collect()
    )
    months = {}
    for r in add:
        months[r["date"].month] = r["seasonal"]
    assert abs(sum(months.values())) < 1e-3


def test_seasonal_decompose_mult_null_gates_nonpositive_trend(spark):
    from econdatapipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # a series oscillating around zero drives the HP trend through 0:
    # non-positive-trend rows must NULL out, never fabricate a factor
    vals = [(-1.0) ** t * 5.0 - 0.01 * t for t in range(48)]
    out = seasonal_decompose(
        _sd_df(spark, vals), "v", period="month", model="multiplicative"
    ).collect()
    assert len(out) == 48
    for r in out:
        if r["trend"] is not None and r["trend"] <= 0:
            assert r["remainder"] is None


def test_seasonal_decompose_min_cycles_gate_and_validation(spark):
    from econdatapipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    with pytest.raises(ValueError):
        seasonal_decompose(_sd_df(spark, [1.0]), "v", model="median")
    with pytest.raises(ValueError):
        seasonal_decompose(_sd_df(spark, [1.0]), "v", min_cycles=0)
    # 8-month series: every month label has ONE observation, so the
    # "index" is pure trend-curvature absorption — min_cycles=2 NULLs
    # every seasonal/remainder instead of fabricating it
    vals = [100.0 + 3.0 * t for t in range(8)]
    gated = seasonal_decompose(
        _sd_df(spark, vals), "v", period="month", min_cycles=2
    ).collect()
    assert len(gated) == 8
    assert all(r["seasonal"] is None and r["remainder"] is None for r in gated)
    # trend/value survive the gate untouched
    assert all(r["trend"] is not None and r["value"] is not None for r in gated)
    # default min_cycles=1 keeps the (absorbing) index — the
    # documented pre-gate behavior, unchanged
    ungated = seasonal_decompose(
        _sd_df(spark, vals), "v", period="month"
    ).collect()
    assert all(r["seasonal"] is not None for r in ungated)
    # 36 months: labels have 3 cycles each, min_cycles=3 passes
    vals3 = _amp_growing(36)
    full = seasonal_decompose(
        _sd_df(spark, vals3), "v", period="month", min_cycles=3
    ).collect()
    assert all(r["seasonal"] is not None for r in full)


# ---------------------------------------------------------------------------
# hamilton_filter
# ---------------------------------------------------------------------------


def test_hamilton_filter_matches_numpy_projection(spark):
    from econdatapipeline_spark.operators.timeseries import (
        hamilton_filter,
    )

    rng = np.random.RandomState(3)
    n, h, p = 200, 24, 4
    y = np.round(np.cumsum(rng.normal(0.2, 1.0, n)) + 100.0, 6)
    df = spark.createDataFrame(
        [("g", t, float(y[t])) for t in range(n)],
        "dataset string, date long, v double",
    )
    out = (
        hamilton_filter(df, "v", order_col="date", h=h, p=p)
        .orderBy("date")
        .collect()
    )
    assert len(out) == n
    edge = h + p - 1
    # numpy twin: OLS of y_t on [1, y_{t-h}, ..., y_{t-h-p+1}]
    X = np.column_stack(
        [np.ones(n - edge)]
        + [y[edge - h - j : n - h - j] for j in range(p)]
    )
    beta, *_ = np.linalg.lstsq(X, y[edge:], rcond=None)
    for t in range(n):
        r = out[t]
        assert r["value"] == pytest.approx(y[t], abs=1e-6)
        if t < edge:
            assert r["trend"] is None and r["cycle"] is None, t
            continue
        fit = beta[0] + sum(beta[1 + j] * y[t - h - j] for j in range(p))
        # tolerance reflects the 6-dp public-beta composition
        assert r["trend"] == pytest.approx(fit, abs=2e-4), t
        assert r["cycle"] == pytest.approx(y[t] - fit, abs=2e-4), t
        assert r["trend"] + r["cycle"] == pytest.approx(
            y[t], abs=2e-6
        ), t


def test_hamilton_filter_validation_and_degenerate(spark):
    from econdatapipeline_spark.operators.timeseries import (
        hamilton_filter,
    )

    df = spark.createDataFrame(
        [("g", t, float(t)) for t in range(10)],
        "dataset string, date long, v double",
    )
    with pytest.raises(ValueError):
        hamilton_filter(df, "v", h=0)
    with pytest.raises(ValueError):
        hamilton_filter(df, "v", p=7)
    # series shorter than h+p: no regression rows -> all NULL outputs
    short = hamilton_filter(df, "v", order_col="date", h=24, p=4).collect()
    assert len(short) == 10
    assert all(r["trend"] is None and r["cycle"] is None for r in short)
    # constant regressors (constant series) -> singular -> NULL gate
    const = spark.createDataFrame(
        [("g", t, 5.0) for t in range(80)],
        "dataset string, date long, v double",
    )
    rows = hamilton_filter(const, "v", order_col="date", h=24, p=4).collect()
    assert len(rows) == 80
    assert all(r["trend"] is None and r["cycle"] is None for r in rows)
