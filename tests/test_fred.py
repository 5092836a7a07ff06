"""Golden tests for the FRED normalizer (FIXTURES.md A3)."""

from __future__ import annotations

import datetime as dt

from econdatapipeline_spark.registry import DatasetSpec
from econdatapipeline_spark.sources.fred import normalize_fred_observations

MONTHLY = DatasetSpec(
    name="federalfundsrate", source="fred", value_columns=("rate",),
    value_type="double", fred_series_id="DFF", frequency="m",
)
QUARTERLY = DatasetSpec(
    name="realgdp", source="fred", value_columns=("gdp",),
    value_type="double", fred_series_id="GDPC1", frequency="q",
)
INT_SPEC = DatasetSpec(
    name="unemploymentclaims", source="fred", value_columns=("claims",),
    value_type="long", fred_series_id="X", frequency="m",
)


def payload(obs):
    return {"observations": [{"realtime_start": "2025-01-01", **o} for o in obs]}


def test_monthly_with_missing_sentinel(spark):
    p = payload([
        {"date": "2024-10-01", "value": "253.45"},
        {"date": "2024-09-01", "value": "."},  # missing sentinel -> dropped
        {"date": "2024-08-01", "value": "252.1"},
    ])
    out = normalize_fred_observations(spark, p, MONTHLY).collect()
    assert [(r["date"], r["rate"]) for r in out] == [
        (dt.date(2024, 8, 1), 252.1),
        (dt.date(2024, 10, 1), 253.45),
    ]


def test_quarterly_shift(spark):
    """First-of-quarter -> first of month after quarter end; Q4 rolls year."""
    p = payload([
        {"date": "2024-01-01", "value": "1.0"},   # Q1 -> 2024-04-01
        {"date": "2024-10-01", "value": "2.0"},   # Q4 -> 2025-01-01
    ])
    out = normalize_fred_observations(spark, p, QUARTERLY).collect()
    assert [(r["date"], r["gdp"]) for r in out] == [
        (dt.date(2024, 4, 1), 1.0),
        (dt.date(2025, 1, 1), 2.0),
    ]


def test_int_cast_rounds(spark):
    p = payload([{"date": "2024-01-01", "value": "1234.6"}])
    out = normalize_fred_observations(spark, p, INT_SPEC).collect()
    assert out[0]["claims"] == 1235


def test_desc_input_sorted_asc(spark):
    p = payload([{"date": f"2024-{m:02d}-01", "value": str(m)} for m in (12, 3, 7)])
    out = normalize_fred_observations(spark, p, MONTHLY).collect()
    assert [r["date"].month for r in out] == [3, 7, 12]
