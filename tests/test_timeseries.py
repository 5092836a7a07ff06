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
