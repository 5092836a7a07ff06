"""Round-10 operators: hp_filter, var_fit, cochrane_orcutt.

Each test replays the operator against an independent numpy twin on
seeded data (the house pattern: the twin computes the textbook form,
not the operator's expanded sums, so agreement cross-validates the
algebra), plus degenerate-input and validation gates.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# hp_filter
# ---------------------------------------------------------------------------


def _hp_dense(y: np.ndarray, lam: float) -> np.ndarray:
    n = len(y)
    D = np.zeros((max(n - 2, 0), n))
    for k in range(n - 2):
        D[k, k], D[k, k + 1], D[k, k + 2] = 1.0, -2.0, 1.0
    A = np.eye(n) + lam * (D.T @ D)
    return np.linalg.solve(A, y)


def test_hp_pentadiag_solve_matches_dense_solve():
    from econdatapipeline_spark.operators.timeseries import (
        _hp_pentadiag_solve,
    )

    rng = np.random.RandomState(5)
    for n in (1, 2, 3, 4, 5, 17, 28, 81, 200):
        y = np.round(np.cumsum(rng.normal(0, 1, n)) + 100.0, 6)
        for lam in (6.25, 1600.0, 129600.0):
            x = np.array(_hp_pentadiag_solve(y.tolist(), lam))
            ref = _hp_dense(y, lam)
            assert np.max(np.abs(x - ref)) < 1e-7, (n, lam)


def test_hp_filter_spark_trend_cycle(spark):
    from econdatapipeline_spark.operators.timeseries import hp_filter

    rng = np.random.RandomState(11)
    n = 60
    trend_true = 50.0 + 0.5 * np.arange(n)
    y = np.round(trend_true + rng.normal(0, 2.0, n), 4)
    rows = [("q", i, float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "dataset string, date long, v double")
    out = hp_filter(df, "v", lam=1600.0).orderBy("date").collect()
    assert len(out) == n
    got = np.array([r["trend"] for r in out])
    ref = _hp_dense(y, 1600.0)
    assert np.max(np.abs(got - ref)) < 1e-5
    # identity: value = trend + cycle (to the 6-dp output rounding)
    for r in out:
        assert r["value"] == pytest.approx(r["trend"] + r["cycle"], abs=2e-6)
    # HP at lam=1600 smooths hard: the trend's second differences are
    # tiny relative to the noisy input's
    d2 = np.diff(got, 2)
    d2y = np.diff(y, 2)
    assert np.abs(d2).max() < 0.05 * np.abs(d2y).max()


def test_hp_filter_degenerate_and_validation(spark):
    from econdatapipeline_spark.operators.timeseries import hp_filter

    tiny = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 9.0), ("b", 1, 3.0)],
        "dataset string, date long, v double",
    )
    out = {(r["dataset"], r["date"]): r for r in hp_filter(tiny, "v").collect()}
    # n <= 2: A = I exactly -> trend = value, cycle = 0
    assert out[("a", 1)]["trend"] == 5.0 and out[("a", 1)]["cycle"] == 0.0
    assert out[("a", 2)]["trend"] == 9.0
    assert out[("b", 1)]["trend"] == 3.0

    with pytest.raises(ValueError):
        hp_filter(tiny, "v", lam=0.0)
    with pytest.raises(ValueError):
        hp_filter(tiny, "v", max_len=2)
    # the series-sized contract fails LOUDLY, not silently
    import py4j.protocol

    big = spark.range(10).selectExpr(
        "'g' as dataset", "id as date", "cast(id as double) as v"
    )
    with pytest.raises(Exception, match="max_len|exceeds"):
        hp_filter(big, "v", max_len=5).collect()


# ---------------------------------------------------------------------------
# whittaker_level (order-1 sibling through the same kernel)
# ---------------------------------------------------------------------------


def _whittaker1_dense(y: np.ndarray, lam: float) -> np.ndarray:
    n = len(y)
    D = np.zeros((max(n - 1, 0), n))
    for k in range(n - 1):
        D[k, k], D[k, k + 1] = 1.0, -1.0
    A = np.eye(n) + lam * (D.T @ D)
    return np.linalg.solve(A, y)


def test_whittaker_level_matches_dense_and_tracks_level_shift(spark):
    from econdatapipeline_spark.operators.timeseries import (
        whittaker_level,
    )

    rng = np.random.RandomState(31)
    n = 80
    mu = np.where(np.arange(n) < 40, 10.0, 14.0)  # level relocation
    y = np.round(mu + rng.normal(0, 0.5, n), 4)
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate(y)],
        "dataset string, date long, v double",
    )
    out = whittaker_level(df, "v", lam=16.0).orderBy("date").collect()
    assert out[0].asDict().keys() >= {"value", "level", "noise"}
    got = np.array([r["level"] for r in out])
    ref = _whittaker1_dense(y, 16.0)
    assert np.max(np.abs(got - ref)) < 1e-5
    # the smoothed level finds both regimes
    assert abs(got[:30].mean() - 10.0) < 0.3
    assert abs(got[55:].mean() - 14.0) < 0.3
    for r in out:
        assert r["value"] == pytest.approx(r["level"] + r["noise"], abs=2e-6)


def test_seasonal_decompose_identity_and_recovery(spark):
    """Planted components: linear trend + fixed monthly pattern +
    noise. The decomposition must (a) close the additive identity on
    the 6-dp grid, (b) re-center the seasonal to ~zero mean, and
    (c) recover the planted month effects up to a constant."""
    import datetime as dt

    from econdatapipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    rng = np.random.RandomState(3)
    months = 96
    season = {m: float(np.round(4.0 * np.sin(2 * np.pi * m / 12), 3)) for m in range(12)}
    rows = []
    for i in range(months):
        d = dt.date(2015 + i // 12, 1 + i % 12, 1)
        v = 100.0 + 0.5 * i + season[i % 12] + float(rng.normal(0, 0.3))
        rows.append(("g", d, round(v, 4)))
    df = spark.createDataFrame(rows, "dataset string, date date, v double")
    out = seasonal_decompose(df, "v", lam=129600.0).orderBy("date").collect()
    assert len(out) == months
    for r in out:
        assert r["value"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["remainder"], abs=3e-6
        )
    # seasonal indexes sum to ~0 across the 12 months
    per_month = {}
    for r in out:
        per_month.setdefault(r["date"].month, r["seasonal"])
    assert sum(per_month.values()) == pytest.approx(0.0, abs=1e-4)
    # recovered pattern correlates with the planted one (up to level)
    planted = np.array([season[(m - 1) % 12] for m in sorted(per_month)])
    got = np.array([per_month[m] for m in sorted(per_month)])
    corr = np.corrcoef(planted - planted.mean(), got - got.mean())[0, 1]
    assert corr > 0.98
    with pytest.raises(ValueError):
        seasonal_decompose(df, "v", period="week")


# ---------------------------------------------------------------------------
# var_fit
# ---------------------------------------------------------------------------


def _var_sim(n: int, seed: int):
    rng = np.random.RandomState(seed)
    A1 = np.array([[0.5, 0.1, 0.0], [0.0, 0.4, 0.2], [0.1, 0.0, 0.3]])
    A2 = np.array([[-0.2, 0.0, 0.1], [0.05, -0.1, 0.0], [0.0, 0.1, -0.15]])
    c = np.array([1.0, -0.5, 2.0])
    Y = np.zeros((n, 3))
    for t in range(2, n):
        Y[t] = c + A1 @ Y[t - 1] + A2 @ Y[t - 2] + rng.normal(0, 0.5, 3)
    return np.round(Y, 4)


def test_var_fit_matches_numpy_ols_and_residual_cov(spark):
    from econdatapipeline_spark.operators.timeseries import var_fit

    n = 240
    Y = _var_sim(n, 7)
    rows = [
        ("g", t, float(Y[t, 0]), float(Y[t, 1]), float(Y[t, 2]))
        for t in range(n)
    ]
    df = spark.createDataFrame(
        rows, "dataset string, date long, a double, b double, c double"
    )
    out = {
        r["equation"]: r
        for r in var_fit(df, ["a", "b", "c"], order_col="date", lags=2).collect()
    }
    assert set(out) == {"a", "b", "c"}
    X = np.column_stack(
        [np.ones(n - 2)]
        + [Y[2 - l : n - l, e] for e in range(3) for l in (1, 2)]
    )
    B = {}
    for e, nm in enumerate(("a", "b", "c")):
        beta, *_ = np.linalg.lstsq(X, Y[2:, e], rcond=None)
        B[nm] = beta
        r = out[nm]
        assert r["n"] == n - 2
        assert r["const"] == pytest.approx(beta[0], abs=1e-4)
        coefs = [
            r[f"{s}_l{l}"] for s in ("a", "b", "c") for l in (1, 2)
        ]
        assert np.max(np.abs(np.array(coefs) - beta[1:])) < 1e-4
    # residual covariance twin (literal residual cross products)
    E = {nm: Y[2:, e] - X @ B[nm] for e, nm in enumerate(("a", "b", "c"))}
    m = 7
    for e, nm in enumerate(("a", "b", "c")):
        for f_, nm2 in enumerate(("a", "b", "c")):
            ref = float(E[nm] @ E[nm2]) / (n - 2 - m)
            assert out[nm][f"resid_cov_{nm2}"] == pytest.approx(
                ref, rel=1e-3, abs=1e-5
            ), (nm, nm2)
        assert out[nm]["sigma2"] == out[nm][f"resid_cov_{nm}"]
    # symmetry of the covariance readout across equations
    assert out["a"]["resid_cov_b"] == out["b"]["resid_cov_a"]
    assert out["a"]["resid_cov_c"] == out["c"]["resid_cov_a"]


def test_var_irf_matches_numpy_companion_powers(spark):
    from econdatapipeline_spark.operators.timeseries import var_irf

    n = 240
    Y = _var_sim(n, 7)
    df = spark.createDataFrame(
        [
            ("g", t, float(Y[t, 0]), float(Y[t, 1]), float(Y[t, 2]))
            for t in range(n)
        ],
        "dataset string, date long, a double, b double, c double",
    )
    out = {
        (r["h"], r["shock"], r["response"]): r["irf"]
        for r in var_irf(
            df, ["a", "b", "c"], order_col="date", lags=2, horizons=2
        ).collect()
    }
    assert len(out) == 27
    # numpy twin: per-equation OLS -> A1/A2 -> Phi_2 = A1 A1 + A2
    X = np.column_stack(
        [np.ones(n - 2)]
        + [Y[2 - l : n - l, e] for e in range(3) for l in (1, 2)]
    )
    A1 = np.zeros((3, 3))
    A2 = np.zeros((3, 3))
    for e in range(3):
        beta, *_ = np.linalg.lstsq(X, Y[2:, e], rcond=None)
        for s_ in range(3):
            A1[e, s_] = beta[1 + s_ * 2]
            A2[e, s_] = beta[2 + s_ * 2]
    names = ("a", "b", "c")
    for e in range(3):
        for s_ in range(3):
            assert out[(0, names[s_], names[e])] == (1.0 if e == s_ else 0.0)
            assert out[(1, names[s_], names[e])] == pytest.approx(
                A1[e, s_], abs=1e-4
            )
            assert out[(2, names[s_], names[e])] == pytest.approx(
                (A1 @ A1 + A2)[e, s_], abs=1e-4
            )
    with pytest.raises(ValueError):
        var_irf(df, ["a", "b", "c"], lags=2, horizons=4)


def test_var_fit_validation_and_degenerate(spark):
    from econdatapipeline_spark.operators.timeseries import var_fit

    df = spark.createDataFrame(
        [("g", 1, 1.0, 2.0)], "dataset string, date long, a double, b double"
    )
    with pytest.raises(ValueError):
        var_fit(df, ["a"], lags=1)
    with pytest.raises(ValueError):
        var_fit(df, ["a", "b"], lags=3)
    # n <= m + 1 -> ok-gate NULLs (never fabricates)
    short = spark.createDataFrame(
        [("g", t, float(t), float(t * t % 7)) for t in range(6)],
        "dataset string, date long, a double, b double",
    )
    rows = var_fit(short, ["a", "b"], order_col="date", lags=2).collect()
    assert rows and all(r["const"] is None for r in rows)


# ---------------------------------------------------------------------------
# cochrane_orcutt / prais_winsten
# ---------------------------------------------------------------------------


def _co_numpy(y: np.ndarray, x: np.ndarray, pw: bool):
    n = len(y)
    X = np.column_stack([np.ones(n), x])
    b = np.linalg.lstsq(X, y, rcond=None)[0]
    u = y - X @ b
    rho = float(u[1:] @ u[:-1]) / float(u[:-1] @ u[:-1])
    ys, xs = y[1:] - rho * y[:-1], x[1:] - rho * x[:-1]
    zs = np.full(n - 1, 1.0 - rho)
    if pw:
        w = np.sqrt(1.0 - rho * rho)
        ys = np.concatenate([[w * y[0]], ys])
        xs = np.concatenate([[w * x[0]], xs])
        zs = np.concatenate([[w], zs])
    Z = np.column_stack([zs, xs])
    beta = np.linalg.lstsq(Z, ys, rcond=None)[0]
    e = ys - Z @ beta
    s2 = float(e @ e) / (len(ys) - 2)
    XtX = Z.T @ Z
    se_b = np.sqrt(s2 * XtX[0, 0] / (XtX[0, 0] * XtX[1, 1] - XtX[0, 1] ** 2))
    return b[1], rho, beta[0], beta[1], se_b


@pytest.mark.parametrize("pw", [False, True])
def test_cochrane_orcutt_matches_numpy_twin(spark, pw):
    from econdatapipeline_spark.operators.timeseries import (
        cochrane_orcutt,
    )

    rng = np.random.RandomState(23)
    n = 180
    x = np.round(rng.uniform(0, 10, n), 4)
    u = np.zeros(n)
    for t in range(1, n):
        u[t] = 0.6 * u[t - 1] + rng.normal(0, 1)
    y = np.round(2.0 + 1.5 * x + u, 4)
    df = spark.createDataFrame(
        [("s", t, float(y[t]), float(x[t])) for t in range(n)],
        "dataset string, date long, y double, x double",
    )
    r = cochrane_orcutt(
        df, "y", "x", order_col="date", prais_winsten=pw
    ).collect()[0]
    b_ols, rho, a_gls, b_gls, se_b = _co_numpy(y, x, pw)
    assert r["n"] == n
    assert r["beta_ols"] == pytest.approx(b_ols, abs=1e-5)
    assert r["rho"] == pytest.approx(rho, abs=1e-5)
    assert r["alpha_gls"] == pytest.approx(a_gls, abs=1e-4)
    assert r["beta_gls"] == pytest.approx(b_gls, abs=1e-5)
    assert r["se_beta_gls"] == pytest.approx(se_b, abs=1e-5)
    # the GLS slope should sit nearer truth than OLS is required to;
    # at minimum both recover the structural 1.5 within noise
    assert abs(r["beta_gls"] - 1.5) < 0.1


def test_cochrane_orcutt_degenerate_gates(spark):
    from econdatapipeline_spark.operators.timeseries import (
        cochrane_orcutt,
    )

    # constant x -> det_o = 0 -> NULLs under the ok-gate
    df = spark.createDataFrame(
        [("g", t, float(t), 3.0) for t in range(10)],
        "dataset string, date long, y double, x double",
    )
    r = cochrane_orcutt(df, "y", "x", order_col="date").collect()[0]
    assert r["beta_ols"] is None and r["beta_gls"] is None
    # n <= 3 -> NULLs
    short = spark.createDataFrame(
        [("g", t, float(t * 2), float(t)) for t in range(3)],
        "dataset string, date long, y double, x double",
    )
    r2 = cochrane_orcutt(short, "y", "x", order_col="date").collect()[0]
    assert r2["rho"] is None
