"""Property tests for the round-10 operators (the r9 property-test
discipline): invariances and exact identities that hold by the MATH,
not by the fixture — each failure mode here is a class of bug a
point-fixture replay can miss.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HP / Whittaker smoothers
# ---------------------------------------------------------------------------


def _series_df(spark, y, name="g"):
    return spark.createDataFrame(
        [(name, i, float(v)) for i, v in enumerate(y)],
        "dataset string, date long, v double",
    )


def test_hp_filter_is_linear_in_the_input(spark):
    """(I + lam D'D)^-1 is a LINEAR operator: hp(a*y1 + b*y2) =
    a*hp(y1) + b*hp(y2). Catches any accidental nonlinearity
    (clamping, per-point branching on values) in kernel or plumbing."""
    from econdatapipeline_spark.operators.timeseries import (
        _hp_pentadiag_solve,
    )

    rng = np.random.RandomState(17)
    n = 60
    y1 = np.round(rng.normal(10, 2, n), 6)
    y2 = np.round(rng.normal(-3, 1, n), 6)
    a, b = 2.5, -1.25
    lhs = np.array(_hp_pentadiag_solve((a * y1 + b * y2).tolist(), 1600.0))
    rhs = a * np.array(_hp_pentadiag_solve(y1.tolist(), 1600.0)) + b * np.array(
        _hp_pentadiag_solve(y2.tolist(), 1600.0)
    )
    assert np.max(np.abs(lhs - rhs)) < 1e-8


def test_hp_filter_reproduces_linear_series_exactly(spark):
    """A linear series has zero second differences, so the penalty is
    zero at tau = y and the HP trend IS the series (cycle == 0) at any
    lambda — an exact fixed point, not an approximation."""
    from econdatapipeline_spark.operators.timeseries import hp_filter

    y = [5.0 + 0.75 * i for i in range(50)]
    df = _series_df(spark, y)
    out = hp_filter(df, "v", lam=1600.0).collect()
    for r in out:
        assert r["cycle"] == pytest.approx(0.0, abs=1e-6)
        assert r["trend"] == pytest.approx(r["value"], abs=1e-6)


def test_smoothers_preserve_the_mean(spark):
    """Both penalties only see DIFFERENCES, so the constant direction
    is unpenalized and the smoother preserves sum(y) = sum(trend)
    (equivalently mean) exactly — the classic 'no level distortion'
    property of Whittaker smoothers."""
    from econdatapipeline_spark.operators.timeseries import (
        _hp_pentadiag_solve,
    )

    rng = np.random.RandomState(23)
    y = np.round(rng.normal(100, 5, 80), 6)
    for order, lam in ((1, 16.0), (2, 1600.0)):
        x = np.array(_hp_pentadiag_solve(y.tolist(), lam, order))
        assert float(x.sum()) == pytest.approx(float(y.sum()), abs=1e-6)


def test_whittaker_lambda_limits(spark):
    """lam -> 0 returns the series; lam -> inf flattens toward the
    best unpenalized fit (order 1: the mean; order 2: the OLS line)."""
    from econdatapipeline_spark.operators.timeseries import (
        _hp_pentadiag_solve,
    )

    rng = np.random.RandomState(29)
    n = 60
    y = np.round(10 + 0.3 * np.arange(n) + rng.normal(0, 1, n), 6)
    near = np.array(_hp_pentadiag_solve(y.tolist(), 1e-9, 2))
    assert np.max(np.abs(near - y)) < 1e-6
    # lambda is bounded above by conditioning (kappa ~ 16*lambda in
    # doubles), so the "infinite" limits are probed at the largest
    # numerically honest values, with tolerances matching kappa*eps.
    flat1 = np.array(_hp_pentadiag_solve(y.tolist(), 1e10, 1))
    assert np.max(np.abs(flat1 - y.mean())) < 1e-3
    flat2 = np.array(_hp_pentadiag_solve(y.tolist(), 1e12, 2))
    t = np.arange(n)
    b1, b0 = np.polyfit(t, y, 1)
    assert np.max(np.abs(flat2 - (b0 + b1 * t))) < 5e-3


def test_hp_filter_shift_equivariance(spark):
    """Adding a constant shifts the trend by the constant and leaves
    the cycle untouched (the constant lives in D's null space)."""
    from econdatapipeline_spark.operators.timeseries import hp_filter

    rng = np.random.RandomState(37)
    y = np.round(rng.normal(0, 3, 40), 4)
    base = {
        r["date"]: r
        for r in hp_filter(_series_df(spark, y), "v").collect()
    }
    shifted = {
        r["date"]: r
        for r in hp_filter(_series_df(spark, y + 50.0), "v").collect()
    }
    for i in base:
        assert shifted[i]["cycle"] == pytest.approx(
            base[i]["cycle"], abs=2e-6
        )
        assert shifted[i]["trend"] == pytest.approx(
            base[i]["trend"] + 50.0, abs=2e-6
        )


# ---------------------------------------------------------------------------
# Cochrane-Orcutt
# ---------------------------------------------------------------------------


def test_cochrane_orcutt_white_noise_collapses_to_ols(spark):
    """With serially independent errors, rho ~ 0 and the GLS slope
    sits on top of OLS — the correction must not manufacture a
    difference where none exists."""
    from econdatapipeline_spark.operators.timeseries import (
        cochrane_orcutt,
    )

    rng = np.random.RandomState(41)
    n = 400
    x = np.round(rng.uniform(0, 10, n), 4)
    y = np.round(1.0 + 2.0 * x + rng.normal(0, 1, n), 4)
    df = spark.createDataFrame(
        [("g", t, float(y[t]), float(x[t])) for t in range(n)],
        "dataset string, date long, y double, x double",
    )
    r = cochrane_orcutt(df, "y", "x", order_col="date").collect()[0]
    assert abs(r["rho"]) < 0.12
    assert r["beta_gls"] == pytest.approx(r["beta_ols"], abs=0.02)


def test_cochrane_orcutt_groups_are_independent(spark):
    """Two groups fit in one job must equal the same groups fit in
    separate jobs — no cross-group leakage through the shared
    aggregate."""
    from econdatapipeline_spark.operators.timeseries import (
        cochrane_orcutt,
    )

    rng = np.random.RandomState(43)
    rows = []
    for g, (a, b, rho) in (("p", (1.0, 2.0, 0.5)), ("q", (-3.0, 0.5, 0.8))):
        u = 0.0
        for t in range(150):
            x = float(np.round(rng.uniform(0, 5), 4))
            u = rho * u + float(rng.normal(0, 1))
            rows.append((g, t, round(a + b * x + u, 4), x))
    df = spark.createDataFrame(
        rows, "dataset string, date long, y double, x double"
    )
    joint = {r["dataset"]: r for r in cochrane_orcutt(df, "y", "x", order_col="date").collect()}
    for g in ("p", "q"):
        solo = cochrane_orcutt(
            df.filter(F.col("dataset") == g), "y", "x", order_col="date"
        ).collect()[0]
        assert joint[g]["rho"] == solo["rho"]
        assert joint[g]["beta_gls"] == solo["beta_gls"]


# ---------------------------------------------------------------------------
# VAR
# ---------------------------------------------------------------------------


def test_var_fit_on_independent_ar_series_recovers_block_diagonal(spark):
    """Three INDEPENDENT AR(1) series: the VAR coefficient matrix
    must concentrate on the own-lag diagonal (cross coefficients ~ 0)
    and the residual covariance must be near-diagonal — the system
    fit degenerating correctly to the univariate case."""
    from econdatapipeline_spark.operators.timeseries import var_fit

    rng = np.random.RandomState(47)
    n = 2000
    phis = (0.6, -0.4, 0.25)
    Y = np.zeros((n, 3))
    for t in range(1, n):
        for e in range(3):
            Y[t, e] = phis[e] * Y[t - 1, e] + rng.normal(0, 1)
    Y = np.round(Y, 4)
    df = spark.createDataFrame(
        [("g", t, float(Y[t, 0]), float(Y[t, 1]), float(Y[t, 2])) for t in range(n)],
        "dataset string, date long, a double, b double, c double",
    )
    out = {
        r["equation"]: r
        for r in var_fit(df, ["a", "b", "c"], order_col="date", lags=1).collect()
    }
    names = ("a", "b", "c")
    for e, nm in enumerate(names):
        for s_, nm2 in enumerate(names):
            coef = out[nm][f"{nm2}_l1"]
            if e == s_:
                assert coef == pytest.approx(phis[e], abs=0.08)
            else:
                assert abs(coef) < 0.08
        for nm2 in names:
            if nm2 != nm:
                assert abs(out[nm][f"resid_cov_{nm2}"]) < 0.1 * out[nm]["sigma2"]


def test_var_irf_matches_simulation_propagation(spark):
    """The reduced-form IRF at h equals the coefficient response of
    the DETERMINISTIC system: feed the fitted VAR a unit impulse in
    one series and iterate the companion recursion — var_irf's h=2
    must equal that roll-forward exactly (same matrices)."""
    from econdatapipeline_spark.operators.timeseries import (
        var_fit,
        var_irf,
    )

    rng = np.random.RandomState(53)
    n = 300
    A1 = np.array([[0.4, 0.2], [0.1, 0.3]])
    Y = np.zeros((n, 2))
    for t in range(1, n):
        Y[t] = A1 @ Y[t - 1] + rng.normal(0, 0.5, 2)
    Y = np.round(Y, 4)
    df = spark.createDataFrame(
        [("g", t, float(Y[t, 0]), float(Y[t, 1])) for t in range(n)],
        "dataset string, date long, a double, b double",
    )
    fit = {
        r["equation"]: r
        for r in var_fit(df, ["a", "b"], order_col="date", lags=1).collect()
    }
    A_hat = np.array(
        [[fit["a"]["a_l1"], fit["a"]["b_l1"]], [fit["b"]["a_l1"], fit["b"]["b_l1"]]]
    )
    irf = {
        (r["h"], r["shock"], r["response"]): r["irf"]
        for r in var_irf(df, ["a", "b"], order_col="date", lags=1, horizons=2).collect()
    }
    A2_hat = A_hat @ A_hat
    names = ("a", "b")
    for e in range(2):
        for s_ in range(2):
            assert irf[(1, names[s_], names[e])] == pytest.approx(
                A_hat[e, s_], abs=2e-6
            )
            assert irf[(2, names[s_], names[e])] == pytest.approx(
                A2_hat[e, s_], abs=5e-4
            )


# ---------------------------------------------------------------------------
# seasonal_decompose
# ---------------------------------------------------------------------------


def test_seasonal_decompose_no_seasonality_gives_zero_index(spark):
    """A pure trend + noise series has no stable month pattern: every
    seasonal index must be small relative to the noise scale, and the
    identity must still close."""
    import datetime as dt

    from econdatapipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    rng = np.random.RandomState(59)
    rows = []
    for i in range(120):
        d = dt.date(2010 + i // 12, 1 + i % 12, 1)
        rows.append(("g", d, round(50.0 + 0.2 * i + float(rng.normal(0, 0.5)), 4)))
    df = spark.createDataFrame(rows, "dataset string, date date, v double")
    out = seasonal_decompose(df, "v", lam=129600.0).collect()
    seasonals = {r["date"].month: r["seasonal"] for r in out}
    assert max(abs(v) for v in seasonals.values()) < 0.5
    for r in out:
        assert r["value"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["remainder"], abs=3e-6
        )
