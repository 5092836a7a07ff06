"""Calendar gap-fill + interpolation (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from econdatapipeline_spark.operators.timeseries import gap_fill_monthly


def _d(y, m):
    return dt.date(y, m, 1)


def test_gap_fill_interpolates_interior_and_edges(spark):
    df = spark.createDataFrame(
        [
            ("a", _d(2024, 1), 10.0),
            ("a", _d(2024, 4), 40.0),   # 2-month hole: feb, mar
            ("a", _d(2024, 5), 0.0),
            ("b", _d(2024, 1), 7.0),    # singleton series
        ],
        "dataset string, date date, value double",
    )
    out = {
        (r["dataset"], r["date"]): (r["is_observed"], r["ffill"], r["interpolated"])
        for r in gap_fill_monthly(df).collect()
    }
    assert len(out) == 6  # a: jan..may dense, b: jan
    assert out[("a", _d(2024, 2))] == (False, 10.0, 20.0)  # 10 + (40-10)*1/3
    assert out[("a", _d(2024, 3))] == (False, 10.0, 30.0)
    assert out[("a", _d(2024, 4))] == (True, 40.0, 40.0)
    assert out[("a", _d(2024, 5))] == (True, 0.0, 0.0)
    assert out[("b", _d(2024, 1))] == (True, 7.0, 7.0)


def test_gap_fill_leading_hole_backfills_from_next(spark):
    df = spark.createDataFrame(
        [("a", _d(2024, 1), None), ("a", _d(2024, 3), 9.0)],
        "dataset string, date date, value double",
    )
    # null observation behaves as a hole: ffill null at the head,
    # interpolation falls back to the next known value
    out = {
        r["date"]: (r["ffill"], r["interpolated"])
        for r in gap_fill_monthly(df).collect()
    }
    assert out[_d(2024, 1)] == (None, 9.0)
    assert out[_d(2024, 2)] == (None, 9.0)
    assert out[_d(2024, 3)] == (9.0, 9.0)


def test_rebase_index_base_100(spark):
    from econdatapipeline_spark.operators.timeseries import rebase_index

    df = spark.createDataFrame(
        [("a", _d(2024, 1), 50.0), ("a", _d(2024, 2), 75.0),
         ("b", _d(2024, 2), 9.0)],  # no base observation
        "dataset string, date date, value double",
    )
    out = {(r["dataset"], r["date"]): r["index_value"]
           for r in rebase_index(df, _d(2024, 1)).collect()}
    assert out[("a", _d(2024, 1))] == 100.0
    assert out[("a", _d(2024, 2))] == 150.0
    assert out[("b", _d(2024, 2))] is None


def test_seasonal_adjust_recovers_flat_trend(spark):
    """A series that is exactly flat x seasonal pattern: the adjusted
    series must recover the flat level and factors must mirror the
    pattern (normalized to mean 1)."""
    from econdatapipeline_spark.operators.timeseries import seasonal_adjust_monthly

    pattern = [1.2 if m % 2 == 0 else 0.8 for m in range(1, 13)]
    rows = []
    for year in (2022, 2023, 2024):
        for m in range(1, 13):
            rows.append(("a", _d(year, m), 100.0 * pattern[m - 1]))
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    out = {(r["date"].year, r["date"].month): r
           for r in seasonal_adjust_monthly(df).collect()}
    mid = out[(2023, 6)]
    assert mid["trend"] == 100.0          # alternating 0.8/1.2 averages out
    assert abs(mid["seasonal_factor"] - 1.2) < 1e-6
    assert abs(mid["adjusted"] - 100.0) < 0.01
    # edges: no full 13-tap window -> no trend, factor still applied
    assert out[(2022, 1)]["trend"] is None
    assert abs(out[(2022, 1)]["adjusted"] - 100.0) < 0.01


def test_holt_linear_hand_computed(spark):
    from econdatapipeline_spark.operators.timeseries import holt_linear

    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 12.0), ("g", 3, 14.0)],
        "grp string, t int, v double",
    )
    out = holt_linear(df, "grp", "t", "v").collect()[0]
    # l1=10, b1=0
    # l2 = .5*12 + .5*(10+0) = 11 ; b2 = .25*(11-10) + .75*0 = 0.25
    # l3 = .5*14 + .5*(11.25) = 12.625 ; b3 = .25*(12.625-11) + .75*.25 = 0.59375
    assert out["n_points"] == 3
    assert out["level"] == 12.625
    assert out["trend"] == 0.59375
    assert out["forecast_1"] == 12.625 + 0.59375


def test_holt_linear_single_point(spark):
    from econdatapipeline_spark.operators.timeseries import holt_linear

    df = spark.createDataFrame([("g", 1, 7.0)], "grp string, t int, v double")
    out = holt_linear(df, "grp", "t", "v").collect()[0]
    assert (out["level"], out["trend"], out["forecast_1"]) == (7.0, 0.0, 7.0)


def test_cusum_closed_form_matches_recursion(spark):
    """The prefix-sum/prefix-extreme closed form must equal Page's
    sequential recursion replayed in Python."""
    from econdatapipeline_spark.operators.timeseries import cusum_changepoint

    vals = [10.0, 10.0, 14.0, 15.0, 13.0, 6.0, 5.0, 12.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "grp string, t int, v double"
    )
    out = {
        r["t"]: (r["cusum_pos"], r["cusum_neg"], r["alarm"])
        for r in cusum_changepoint(df, "grp", "t", "v", threshold=5.0).collect()
    }
    base, sp, sn = vals[0], 0.0, 0.0
    for i, x in enumerate(vals):
        sp = max(0.0, sp + (x - base))
        sn = max(0.0, sn - (x - base))
        assert out[i] == (sp, sn, sp > 5.0 or sn > 5.0), i


def test_cusum_flat_series_never_alarms(spark):
    from econdatapipeline_spark.operators.timeseries import cusum_changepoint

    df = spark.createDataFrame(
        [("g", i, 7.5) for i in range(5)], "grp string, t int, v double"
    )
    rows = cusum_changepoint(df, "grp", "t", "v", threshold=0.001).collect()
    assert all(r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0 for r in rows)
    assert not any(r["alarm"] for r in rows)


def test_holt_backtest_perfect_linear_series(spark):
    from econdatapipeline_spark.operators.timeseries import holt_backtest

    # y = 10 + 2t: Holt with a long train window converges to
    # trend ~2, so short-horizon forecasts are near-exact
    rows = [("g", t, 10.0 + 2.0 * t) for t in range(1, 61)]
    df = spark.createDataFrame(rows, "grp string, t int, y double")
    out = holt_backtest(df, "grp", "t", "y", cutoff=50, horizon=5).collect()[0]
    assert out["n_eval"] == 5
    assert out["mape"] < 0.02
    assert abs(out["mean_err"]) < 3.0


def test_holt_backtest_horizon_caps_eval(spark):
    from econdatapipeline_spark.operators.timeseries import holt_backtest

    rows = [("g", t, float(t)) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "grp string, t int, y double")
    out = holt_backtest(df, "grp", "t", "y", cutoff=10, horizon=3).collect()[0]
    assert out["n_eval"] == 3  # 10 post-cutoff points, only 3 scored


def test_holt_backtest_validates(spark):
    import pytest as _pytest
    from econdatapipeline_spark.operators.timeseries import holt_backtest

    df = spark.createDataFrame([("g", 1, 1.0)], "grp string, t int, y double")
    with _pytest.raises(ValueError):
        holt_backtest(df, "grp", "t", "y", cutoff=0, horizon=0)


def test_acf_hand_computed_and_lag1_sign(spark):
    from econdatapipeline_spark.operators.timeseries import acf
    import datetime as dt

    # alternating series: strong negative lag-1, positive lag-2
    vals = [10.0, 0.0, 10.0, 0.0, 10.0, 0.0, 10.0, 0.0]
    rows = [
        ("s", dt.date(2024, 1 + i, 1), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    out = {r["lag"]: r for r in acf(df, max_lag=3).collect()}
    # xbar = 5, dev = +-5; lag1: 7 pairs all -25 -> -175/200
    assert out[1]["n_pairs"] == 7 and out[1]["acf"] == round(-175 / 200, 6)
    assert out[2]["n_pairs"] == 6 and out[2]["acf"] == round(150 / 200, 6)
    assert out[3]["acf"] == round(-125 / 200, 6)


def test_acf_constant_series_zero_denominator(spark):
    from econdatapipeline_spark.operators.timeseries import acf
    import datetime as dt

    rows = [("s", dt.date(2024, 1 + i, 1), 7.0) for i in range(5)]
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    out = acf(df, max_lag=2).collect()
    assert all(r["acf"] == 0.0 for r in out)  # degenerate guard


def test_ljung_box_white_noise_small_and_trend_large(spark):
    from econdatapipeline_spark.operators.timeseries import ljung_box
    import datetime as dt

    # strong alternating structure -> acf_1 ~ -0.875 -> big Q
    alt = [10.0, 0.0] * 6
    rows = [("alt", dt.date(2024, 1, 1) + dt.timedelta(days=31 * i), v)
            for i, v in enumerate(alt)]
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    out = {r["dataset"]: r for r in ljung_box(df, max_lag=3).collect()}
    assert out["alt"]["n"] == 12 and out["alt"]["h"] == 3
    # hand-computed: xbar=5, den=300; num1=-275, num2=250, num3=-225
    import math
    n = 12
    rhos = [round(-275 / 300, 6), round(250 / 300, 6), round(-225 / 300, 6)]
    q = n * (n + 2) * sum(r * r / (n - k) for k, r in enumerate(rhos, 1))
    assert math.isclose(out["alt"]["q_stat"], q, abs_tol=1e-4)


def test_ljung_box_constant_series_zero(spark):
    from econdatapipeline_spark.operators.timeseries import ljung_box
    import datetime as dt

    rows = [("c", dt.date(2024, 1 + i, 1), 3.0) for i in range(8)]
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    out = ljung_box(df, max_lag=2).collect()
    assert len(out) == 1 and out[0]["q_stat"] == 0.0


def test_theil_sen_exact_line_and_outlier_immunity(spark):
    from econdatapipeline_spark.operators.timeseries import theil_sen
    import datetime as dt

    # exact line y = 2x + 1 on positions 1..9, one wild outlier at pos 5
    vals = [2 * i + 1 for i in range(1, 10)]
    vals[4] = 1000.0  # OLS would be dragged; Theil-Sen must stay at 2
    rows = [("s", dt.date(2024, 1 + i, 1), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    out = theil_sen(df).collect()[0]
    assert out["n_pairs"] == 36
    assert out["slope"] == 2.0
    assert out["intercept"] == 1.0


def test_pacf_lag1_equals_acf_and_ar1_cutoff(spark):
    from econdatapipeline_spark.operators.timeseries import acf, pacf
    import datetime as dt

    # deterministic AR(1)-ish series: pacf(1) == acf(1) always, and for
    # a linear-recurrence-generated series pacf should collapse after
    # lag 1 relative to the acf tail.
    vals, x = [], 50.0
    for i in range(48):
        x = 0.8 * x + (7.0 if i % 2 == 0 else -5.0)
        vals.append(x)
    rows = [("s", dt.date(2020, 1, 1) + dt.timedelta(days=31 * i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    a = {r["lag"]: r["acf"] for r in acf(df, max_lag=4).collect()}
    p = {r["lag"]: r["pacf"] for r in pacf(df, max_lag=4).collect()}
    assert p[1] == a[1]
    assert sorted(p) == [1, 2, 3, 4]


def test_pacf_durbin_levinson_hand_recursion(spark):
    from econdatapipeline_spark.operators.timeseries import acf, pacf
    import datetime as dt, math

    vals = [3.0, 7.0, 4.0, 9.0, 2.0, 8.0, 5.0, 10.0, 1.0, 6.0]
    rows = [("s", dt.date(2021, 1 + i, 1) if i < 12 else None, v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    r = {row["lag"]: row["acf"] for row in acf(df, max_lag=3).collect()}
    # replay Durbin-Levinson in python on the same rounded acf values
    phi = {(1, 1): r[1]}
    for k in (2, 3):
        num = r[k] - sum(phi[(k - 1, j)] * r[k - j] for j in range(1, k))
        den = 1.0 - sum(phi[(k - 1, j)] * r[j] for j in range(1, k))
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    out = {row["lag"]: row["pacf"] for row in pacf(df, max_lag=3).collect()}
    for k in (1, 2, 3):
        assert math.isclose(out[k], round(phi[(k, k)], 6), abs_tol=1e-9), k


def test_pacf_constant_series_all_zero(spark):
    from econdatapipeline_spark.operators.timeseries import pacf
    import datetime as dt

    rows = [("c", dt.date(2024, 1 + i, 1), 2.0) for i in range(8)]
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    out = pacf(df, max_lag=3).collect()
    assert len(out) == 3 and all(r["pacf"] == 0.0 for r in out)


def test_ohlc_resample_hand_values(spark):
    from pyspark.sql import functions as F
    from econdatapipeline_spark.operators.timeseries import ohlc_resample

    rows = [
        ("2020-01-05", 2, 10.0),
        ("2020-01-05", 1, 11.0),  # same day: tiebreak id 1 first
        ("2020-01-20", 3, 7.0),
        ("2020-02-01", 4, 5.0),
    ]
    df = spark.createDataFrame(rows, "d string, k long, v double").select(
        F.to_date("d").alias("d"), "k", "v"
    )
    out = {r["period"]: r for r in ohlc_resample(df, "d", "v", "k").collect()}
    jan = out["2020-01"]
    assert jan["open"] == 11.0 and jan["close"] == 7.0
    assert jan["high"] == 11.0 and jan["low"] == 7.0
    assert jan["volume"] == 3 and abs(jan["total"] - 28.0) < 1e-9
    feb = out["2020-02"]
    assert feb["open"] == feb["close"] == 5.0 and feb["volume"] == 1
    import pytest
    with pytest.raises(ValueError):
        ohlc_resample(df, "d", "v", "k", freq="week")


def test_adf_test_matches_numpy_ols(spark):
    import numpy as np
    from econdatapipeline_spark.operators.timeseries import adf_test

    # deterministic mean-reverting series; expected stats from a
    # reference OLS on the same design matrix
    y = [10.0]
    for i in range(1, 40):
        y.append(round(0.5 * y[-1] + 5.0 + 3.0 * ((i * 7) % 5 - 2), 6))
    rows = [("s", f"2020-{1:02d}-01", v) for v in y]
    rows = [("s", i, v) for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "dataset string, date int, value double")
    out = adf_test(df).first()

    z = np.array([y[t] - y[t - 1] for t in range(2, len(y))])
    l = np.array([y[t - 1] for t in range(2, len(y))])
    d = np.array([y[t - 1] - y[t - 2] for t in range(2, len(y))])
    X = np.column_stack([np.ones_like(l), l, d])
    beta, *_ = np.linalg.lstsq(X, z, rcond=None)
    resid = z - X @ beta
    sigma2 = (resid @ resid) / (len(z) - 3)
    cov = sigma2 * np.linalg.inv(X.T @ X)
    se = float(np.sqrt(cov[1, 1]))
    assert out["n"] == len(z)
    assert abs(out["beta"] - beta[1]) < 1e-4
    assert abs(out["se"] - se) < 1e-4
    assert abs(out["adf_stat"] - beta[1] / se) < 1e-3
    # mean reversion: strongly negative DF statistic
    assert out["adf_stat"] < -2.86


def test_adf_random_walk_not_rejected(spark):
    import hashlib
    from econdatapipeline_spark.operators.timeseries import adf_test

    # md5-driven random walk (deterministic, aperiodic): the unit
    # root must NOT be rejected — reference stat -0.345 via numpy
    def inc(i, salt):
        return (hashlib.md5(f"{salt}:{i}".encode()).digest()[0] % 7) - 3

    y = [100.0]
    for i in range(1, 60):
        y.append(y[-1] + inc(i, "w"))
    df = spark.createDataFrame(
        [("w", i, v) for i, v in enumerate(y)],
        "dataset string, date int, value double",
    )
    out = adf_test(df).first()
    assert out["adf_stat"] > -2.86  # 5% DF critical value: not rejected
    assert abs(out["beta"]) < 0.2  # coefficient near zero on a walk


def test_engle_granger_cointegrated_vs_not(spark):
    from econdatapipeline_spark.operators.timeseries import engle_granger

    # x: a trending walk; y = 2x + 5 + bounded stationary wiggle ->
    # residuals mean-revert hard -> strongly negative ADF stat
    x = [100.0]
    for i in range(1, 50):
        x.append(x[-1] + ((i * 13) % 7 - 3) + 1.0)
    rows = [
        (i, x[i], round(2.0 * x[i] + 5.0 + ((i * 7) % 5 - 2) * 0.5, 6))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "date int, x double, y double")
    out = engle_granger(df, "x", "y", "date").first()
    assert abs(out["slope"] - 2.0) < 0.05
    assert out["adf_stat_resid"] < -3.34  # cointegrated at 5%
    # independent md5-driven walks -> residuals keep the unit root:
    # reference resid stat -3.304 via numpy (above the -3.34 critical
    # value, and far above the cointegrated pair's)
    import hashlib

    def inc(i, salt):
        return (hashlib.md5(f"{salt}:{i}".encode()).digest()[0] % 7) - 3

    x2, y2 = [100.0], [50.0]
    for i in range(1, 60):
        x2.append(x2[-1] + inc(i, "x") + 0.5)
        y2.append(y2[-1] + inc(i, "y") * 1.5)
    rows2 = [(i, x2[i], y2[i]) for i in range(60)]
    df2 = spark.createDataFrame(rows2, "date int, x double, y double")
    out2 = engle_granger(df2, "x", "y", "date").first()
    assert out2["adf_stat_resid"] > -3.34
    assert out2["adf_stat_resid"] > out["adf_stat_resid"] + 1.0


def test_seasonal_strength_separates_signal_from_noise(spark):
    import datetime as dtm
    from econdatapipeline_spark.operators.timeseries import seasonal_strength

    # strong 12-month cycle vs a flat series with tiny aperiodic noise
    import hashlib
    rows = []
    for i in range(48):
        d = dtm.date(2018 + i // 12, i % 12 + 1, 1)
        seasonal = 100.0 + 30.0 * (1 if (i % 12) in (0, 1, 2) else -1)
        noise = (hashlib.md5(f"n:{i}".encode()).digest()[0] % 7) - 3
        rows.append(("cyc", d, seasonal))
        rows.append(("flat", d, 100.0 + noise * 0.5))
    df = spark.createDataFrame(rows, "dataset string, date date, value double")
    out = {r["dataset"]: r for r in seasonal_strength(df).collect()}
    assert out["cyc"]["strength"] > 0.8
    assert out["flat"]["strength"] < out["cyc"]["strength"]
