"""Kaplan-Meier survival tests (operators/survival)."""

from __future__ import annotations

from econdatapipeline_spark.operators.survival import (
    kaplan_meier,
    median_survival,
)

SCHEMA = "duration long, event int"


def test_textbook_curve(spark):
    # classic hand-checkable example: events at 1,2,4; censor at 3
    # n=5: t=1 (5 at risk, 1 event) S=4/5; t=2 (4 risk, 1 event)
    # S=4/5*3/4=3/5; t=3 censored (no drop); t=4 (2 risk, 1 event)
    # S=3/5*1/2=3/10
    rows = [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["t"]: r for r in kaplan_meier(df).collect()}
    assert out[1]["n_risk"] == 5 and abs(out[1]["survival"] - 0.8) < 1e-6
    assert abs(out[2]["survival"] - 0.6) < 1e-6
    assert out[3]["n_censored"] == 1 and abs(out[3]["survival"] - 0.6) < 1e-6
    assert abs(out[4]["survival"] - 0.3) < 1e-6
    assert out[5]["n_risk"] == 1 and abs(out[5]["survival"] - 0.3) < 1e-6


def test_censoring_keeps_curve_above_naive(spark):
    # heavy censoring: the KM curve must NOT treat censored subjects
    # as events — survival at t=1 reflects only the single event
    rows = [(1, 1)] + [(1, 0)] * 9
    df = spark.createDataFrame(rows, SCHEMA)
    out = kaplan_meier(df).collect()
    assert len(out) == 1
    assert abs(out[0]["survival"] - 0.9) < 1e-6  # 1 - 1/10


def test_full_mortality_hits_exact_zero(spark):
    rows = [(1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["t"]: r for r in kaplan_meier(df).collect()}
    assert out[2]["survival"] == 0.0  # d == n at t=2: exact zero


def test_median_survival(spark):
    rows = [(t, 1) for t in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, SCHEMA)
    curve = kaplan_meier(df)
    med = median_survival(curve).first()
    assert med["median_t"] == 2  # S(2) = 0.5

    censored = spark.createDataFrame([(5, 0)] * 4 + [(1, 1)], SCHEMA)
    med2 = median_survival(kaplan_meier(censored)).first()
    assert med2["median_t"] is None  # never falls to 0.5 -> honest null
