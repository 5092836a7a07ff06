"""Randomized invariant tests for the round-9 session-3 operators —
the test_property_round4..7 style: fixed-seed scenario generators,
mathematical invariants rather than point values.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def _sdf(spark, v, g="s"):
    return spark.createDataFrame(
        [(g, i, float(x)) for i, x in enumerate(v)],
        "dataset string, date long, value double",
    )


def test_quantile_regression_median_beats_ols_on_pinball(spark):
    """At tau = 0.5 the fitted line's pinball loss must not exceed the
    OLS line's (the quantile fit optimizes exactly that loss)."""
    from econdatapipeline_spark.operators.timeseries import (
        quantile_regression,
    )

    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        n = 400
        x = np.round(rng.uniform(0, 10, n), 3)
        noise = rng.standard_t(3, n)  # heavy tails: OLS suffers
        y = np.round(1.0 + 0.7 * x + noise, 3)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double",
        )
        row = quantile_regression(df, "y", "x", tau=0.5).collect()[0]
        # OLS line pinball at tau 0.5 = mean |resid| / 2
        b = np.cov(x, y)[0, 1] / np.var(x)
        a = y.mean() - b * x.mean()
        ols_pin = 0.5 * np.abs(y - a - b * x).mean()
        assert row["pinball_loss"] <= ols_pin + 1e-6, seed


def test_price_index_bounds_and_rescaling(spark):
    """Fisher lies between Laspeyres and Paasche; scaling every
    period-1 price by c scales every index to exactly c."""
    from econdatapipeline_spark.operators.econ import price_index

    rng = np.random.RandomState(7)
    items = [f"i{k}" for k in range(30)]
    rows = []
    for it in items:
        p0 = float(np.round(rng.uniform(5, 50), 2))
        q0 = float(np.round(rng.uniform(1, 100), 2))
        p1 = float(np.round(p0 * rng.uniform(0.7, 1.5), 2))
        q1 = float(np.round(q0 * rng.uniform(0.5, 2.0), 2))
        rows += [(it, 0, p0, q0), (it, 1, p1, q1)]
    df = spark.createDataFrame(rows, "item string, t long, p double, q double")
    r = price_index(df, "item", "t", "p", "q", base_period=0).collect()[0]
    lo, hi = sorted([r["laspeyres"], r["paasche"]])
    assert lo - 1e-9 <= r["fisher"] <= hi + 1e-9
    assert lo - 1e-6 <= r["tornqvist"] <= hi + 0.02  # Tornqvist ~ Fisher

    # pure price rescaling: p1 = 2 * p0, any quantities
    rows2 = [(it, 0, p, q) for (it, t, p, q) in rows if t == 0]
    rows2 += [(it, 1, 2 * p, q * 0.9) for (it, t, p, q) in rows if t == 0]
    df2 = spark.createDataFrame(rows2, "item string, t long, p double, q double")
    r2 = price_index(df2, "item", "t", "p", "q", base_period=0).collect()[0]
    for c in ("laspeyres", "paasche", "fisher", "tornqvist"):
        assert r2[c] == pytest.approx(2.0, abs=1e-4), c


def test_friedman_invariant_under_monotone_transform(spark):
    """Rank-based: exp-transforming the values changes nothing."""
    from econdatapipeline_spark.operators.stats import friedman_test

    rng = np.random.RandomState(12)
    rows = [
        (b, t, float(np.round(rng.normal(ti * 0.4, 1), 3)))
        for b in range(40)
        for ti, t in enumerate(("t1", "t2", "t3"))
    ]
    df = spark.createDataFrame(rows, "blk long, trt string, v double")
    r1 = friedman_test(df, "blk", "trt", "v", n_treatments=3).collect()[0]
    df2 = df.select("blk", "trt", F.exp(F.col("v") / 4.0).alias("v"))
    r2 = friedman_test(df2, "blk", "trt", "v", n_treatments=3).collect()[0]
    assert r1["q_stat"] == pytest.approx(r2["q_stat"], abs=1e-6)


def test_mahalanobis_affine_invariance(spark):
    """Rescaling a column (and shifting it) leaves every md2
    unchanged — the whole point vs per-axis z-scores."""
    from econdatapipeline_spark.operators.stats import mahalanobis_scores

    rng = np.random.RandomState(25)
    n = 400
    x = np.round(rng.normal(0, 1, n), 4)
    y = np.round(0.5 * x + rng.normal(0, 1, n), 4)
    df1 = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))],
        "rid long, x double, y double",
    )
    df2 = spark.createDataFrame(
        [(i, float(100.0 + 7.0 * a), float(b)) for i, (a, b) in enumerate(zip(x, y))],
        "rid long, x double, y double",
    )
    m1 = {r["rid"]: r["md2"] for r in mahalanobis_scores(df1, "rid", ["x", "y"]).collect()}
    m2 = {r["rid"]: r["md2"] for r in mahalanobis_scores(df2, "rid", ["x", "y"]).collect()}
    diffs = [abs(m1[k] - m2[k]) for k in m1]
    assert max(diffs) < 5e-3


def test_arch_invariant_under_mean_shift(spark):
    """The test demeans internally: adding a constant changes
    nothing."""
    from econdatapipeline_spark.operators.timeseries import arch_test

    rng = np.random.RandomState(31)
    v = np.round(rng.normal(0, 1, 400), 3)
    r1 = arch_test(_sdf(spark, v), "value", "date", "dataset").collect()[0]
    r2 = arch_test(_sdf(spark, v + 250.0), "value", "date", "dataset").collect()[0]
    assert r1["lm_stat"] == pytest.approx(r2["lm_stat"], abs=1e-3)


def test_ar1_phi_matches_lag1_autocorrelation(spark):
    """Yule-Walker at p = 1 IS c1/c0 — cross-check against the
    certified acf operator."""
    from econdatapipeline_spark.operators.timeseries import acf, ar_fit

    rng = np.random.RandomState(42)
    n = 2000
    v = np.zeros(n)
    for t in range(1, n):
        v[t] = 0.55 * v[t - 1] + rng.normal()
    v = np.round(v, 3)
    df = _sdf(spark, v)
    phi = ar_fit(df, "value", "date", "dataset", order=1).collect()[0]["phi_1"]
    a1 = [r for r in acf(df, max_lag=1).collect() if r["lag"] == 1][0]
    assert phi == pytest.approx(a1["acf"], abs=2e-2)


def test_hits_label_permutation_equivariance(spark):
    """Renaming nodes permutes scores, never changes them."""
    from econdatapipeline_spark.operators.graph import hits

    rng = np.random.RandomState(5)
    edges = list({(int(rng.randint(0, 25)), int(rng.randint(0, 25)))
                  for _ in range(120)})
    edges = [(u, v) for u, v in edges if u != v]
    df1 = spark.createDataFrame(
        [(f"n{u}", f"n{v}") for u, v in edges], "src string, dst string"
    )
    perm = {i: (i * 7 + 3) % 25 for i in range(25)}
    df2 = spark.createDataFrame(
        [(f"n{perm[u]}", f"n{perm[v]}") for u, v in edges],
        "src string, dst string",
    )
    h1 = {r["node"]: (r["authority"], r["hub"])
          for r in hits(df1, iterations=2).collect()}
    h2 = {r["node"]: (r["authority"], r["hub"])
          for r in hits(df2, iterations=2).collect()}
    for n, val in h1.items():
        assert h2[f"n{perm[int(n[1:])]}"] == val, n


def test_shift_share_pure_mix_scenario(spark):
    """Every region holds its industry growth exactly -> zero
    competitive effect everywhere; mix explains the rest."""
    from econdatapipeline_spark.operators.econ import shift_share

    gi = {"steel": 0.0, "tech": 0.5}
    rows = []
    for r, w in (("north", 10.0), ("south", 200.0)):
        for i, g in gi.items():
            rows.append((r, i, w, w * (1 + g)))
    df = spark.createDataFrame(rows, "region string, industry string, vb double, ve double")
    for row in shift_share(df, "region", "industry", "vb", "ve").collect():
        assert row["competitive_effect"] == pytest.approx(0.0, abs=1e-6), row
