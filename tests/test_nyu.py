"""Golden tests for the NYU ERP normalizer (FIXTURES.md A4)."""

from __future__ import annotations

import datetime as dt

import pytest

from econdatapipeline_spark.sources.nyu import normalize_nyu_sheet, resolve_headers


def test_fuzzy_header_resolution():
    actual = ["Start of month ", "T.Bond Rate!", "the ERP (T12m) col", "Expected Return", "Junk"]
    mapping = resolve_headers(actual)
    assert mapping == {
        "Start of month ": "date",
        "T.Bond Rate!": "tbond_rate",
        "the ERP (T12m) col": "erp_t12m",
        "Expected Return": "expected_return",
    }


def test_missing_header_raises():
    with pytest.raises(ValueError, match="T.Bond Rate"):
        resolve_headers(["Start of month", "Whatever", "ERP (T12m)", "Expected Return"])


def test_percent_formats(spark):
    rows = [
        {"Start of month": "2025-01-01", "T.Bond Rate": "4.02%",
         "ERP (T12m)": 4.02, "Expected Return": 0.0402},
        {"Start of month": "2025-02-01", "T.Bond Rate": "3.96%",
         "ERP (T12m)": 0.05, "Expected Return": 8.5},
        {"Start of month": "2025-03-01", "T.Bond Rate": None,
         "ERP (T12m)": 0.05, "Expected Return": 0.09},  # null -> row dropped
    ]
    out = normalize_nyu_sheet(spark, rows).collect()
    assert len(out) == 2
    r1, r2 = out
    assert r1["date"] == dt.date(2025, 1, 1)
    # '4.02%' -> 0.0402; bare 4.02 > 0.2 -> /100; 0.0402 <= 0.2 kept.
    assert abs(r1["tbond_rate"] - 0.0402) < 1e-12
    assert abs(r1["erp_t12m"] - 0.0402) < 1e-12
    assert abs(r1["expected_return"] - 0.0402) < 1e-12
    assert abs(r2["erp_t12m"] - 0.05) < 1e-12   # <= 0.2 stays decimal
    assert abs(r2["expected_return"] - 0.085) < 1e-12  # 8.5 -> /100
