"""Golden tests for the EDB fiscal-grid normalizer (FIXTURES.md A1/A2).

The fiscal-date mapping is the subtlest logic in the reference
(azure_common_scrapers.py:142-163 monthly, :239-265 quarterly); these
pin the golden mappings including junk cells, blank cells, and unknown
month labels.
"""

from __future__ import annotations

import datetime as dt

from econdatapipeline_spark.registry import DatasetSpec
from econdatapipeline_spark.sources.excel_grid import normalize_edb_grid

MONTHLY_SPEC = DatasetSpec(
    name="autosales", source="edb_monthly", value_columns=("sales",), value_type="long"
)
FLOAT_SPEC = DatasetSpec(
    name="retailsales", source="edb_monthly", value_columns=("sales",), value_type="double"
)
QUARTERLY_SPEC = DatasetSpec(
    name="imports", source="edb_quarterly", value_columns=("value",), value_type="double"
)


def monthly_grid():
    # 13 x 3: header row of fiscal years, 12 month rows (fiscal order).
    return [
        ["", 2024, 2025],
        ["July", "100", "210.4"],
        ["August", "101", ""],        # blank -> dropped
        ["September", "junk", "212"],  # junk -> dropped
        ["October", "103", "213"],
        ["November", "104", "214"],
        ["December", "105", "215"],
        ["January", "106", "216"],
        ["February", "107", "217"],
        ["March", "108", "218"],
        ["April", "109", "219"],
        ["May", "110", "220"],
        ["NotAMonth", "111", "221"],  # unknown label -> null date -> dropped
    ]


def test_monthly_fiscal_mapping(spark):
    out = normalize_edb_grid(spark, monthly_grid(), MONTHLY_SPEC)
    rows = {(r["date"], r["sales"]) for r in out.collect()}
    # July of FY2024 -> calendar 2023; January of FY2024 -> 2024.
    assert (dt.date(2023, 7, 1), 100) in rows
    assert (dt.date(2024, 1, 1), 106) in rows
    # FY2025 July -> 2024-07-01, int cast rounds 210.4 -> 210.
    assert (dt.date(2024, 7, 1), 210) in rows
    # blank/junk/unknown-month dropped: FY2025 August, FY2024 September, NotAMonth.
    dates = {d for d, _ in rows}
    assert dt.date(2024, 8, 1) not in dates
    assert dt.date(2023, 9, 1) not in dates
    # 12 usable months x 2 years minus 2 bad cells minus 2 unknown-label cells
    assert out.count() == 20


def test_monthly_double_type(spark):
    out = normalize_edb_grid(spark, monthly_grid(), FLOAT_SPEC)
    row = out.filter("date = '2024-07-01'").collect()[0]
    assert abs(row["sales"] - 210.4) < 1e-9
    assert dict(out.dtypes)["sales"] == "double"


def test_quarterly_mapping(spark):
    grid = [
        ["", 2024, 2025],
        ["Jul-Sep", "10", "50"],
        [" Oct-Dec ", "20", "60"],   # whitespace exercises trim
        ["Jan-Mar", "30", "70"],
        ["Apr-Jun", "40", "80"],
    ]
    out = normalize_edb_grid(spark, grid, QUARTERLY_SPEC, quarterly=True)
    rows = {(r["date"], r["value"]) for r in out.collect()}
    # Golden mapping (azure_common_scrapers.py:251-256).
    assert (dt.date(2023, 10, 1), 10.0) in rows
    assert (dt.date(2024, 1, 1), 20.0) in rows
    assert (dt.date(2024, 4, 1), 30.0) in rows
    assert (dt.date(2024, 7, 1), 40.0) in rows
    assert (dt.date(2024, 10, 1), 50.0) in rows
    assert out.count() == 8


def test_sorted_by_date(spark):
    out = normalize_edb_grid(spark, monthly_grid(), MONTHLY_SPEC)
    dates = [r["date"] for r in out.collect()]
    assert dates == sorted(dates)


def test_promote_header_distributed_form(spark):
    """The Spark-side header promotion kept for genuinely distributed
    inputs (normalize_edb_grid promotes driver-side since the grid is
    already local)."""
    from econdatapipeline_spark.operators.unpivot import promote_header

    raw = spark.createDataFrame(
        [("Month", "2023", "2024"), ("July", "1", "2"), ("August", "3", "4")],
        "_c0 string, _c1 string, _c2 string",
    )
    out = promote_header(raw, id_column_name="Month")
    assert out.columns == ["Month", "2023", "2024"]
    assert sorted(r["Month"] for r in out.collect()) == ["August", "July"]
