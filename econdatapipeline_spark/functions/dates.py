"""Fiscal-calendar date expressions (Puerto Rico fiscal year: Jul-Jun).

The reference derives calendar dates from fiscal-year grids row-by-row
with ``df.apply(..., axis=1)``; here each rule is a pure Spark column
expression so it stays inside whole-stage codegen:

- month name -> number map (reference: core_local/azure_common_scrapers.py:150-157)
- monthly fiscal->calendar shift (reference: azure_common_scrapers.py:142-163):
  months Jul-Dec of fiscal year Y belong to calendar year Y-1; Jan-Jun to Y.
- quarterly label -> first day of the month AFTER the quarter ends
  (reference: azure_common_scrapers.py:239-265): 'Jul-Sep' -> (Y-1)-10-01,
  'Oct-Dec' -> Y-01-01, 'Jan-Mar' -> Y-04-01, 'Apr-Jun' -> Y-07-01.
- FRED quarterly adjust (reference: azure_fred_scraper.py:158-188): FRED
  reports the first day of the quarter; shift to the first day of the
  month after quarter end == exactly +3 months (Q4 rolls into next year).

Unknown month / quarter labels yield NULL dates (caller drops them), the
same outcome as the reference's None return.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fiscal-order month map, July first (reference: azure_common_scrapers.py:150-157).
MONTH_NUMBERS: dict[str, int] = {
    "July": 7,
    "August": 8,
    "September": 9,
    "October": 10,
    "November": 11,
    "December": 12,
    "January": 1,
    "February": 2,
    "March": 3,
    "April": 4,
    "May": 5,
    "June": 6,
}

# Quarter label -> (month of resulting date, fiscal-year offset).
QUARTER_MAP: dict[str, tuple[int, int]] = {
    "Jul-Sep": (10, -1),
    "Oct-Dec": (1, 0),
    "Jan-Mar": (4, 0),
    "Apr-Jun": (7, 0),
}


def month_number(month_name: Column) -> Column:
    """Month name -> 1-12; NULL for unknown labels."""
    pairs: list[Column] = []
    for name, num in MONTH_NUMBERS.items():
        pairs += [F.lit(name), F.lit(num)]
    return F.create_map(*pairs)[month_name]


def fiscal_monthly_date(month_name: Column, fiscal_year: Column) -> Column:
    """(month name, fiscal year) -> calendar date, day=1.

    Jul-Dec of fiscal year Y fall in calendar year Y-1; Jan-Jun in Y.
    """
    m = month_number(month_name)
    fy = fiscal_year.cast("int")
    calendar_year = F.when(m >= 7, fy - 1).otherwise(fy)
    return F.make_date(calendar_year, m, F.lit(1))


def fiscal_quarterly_date(quarter_label: Column, fiscal_year: Column) -> Column:
    """Fiscal quarter label -> first day of the month after quarter end."""
    label = F.trim(quarter_label)
    fy = fiscal_year.cast("int")
    expr = F.lit(None).cast("date")
    for q, (month, offset) in QUARTER_MAP.items():
        expr = F.when(label == q, F.make_date(fy + offset, F.lit(month), F.lit(1))).otherwise(expr)
    return expr


def fred_quarterly_adjust(date_col: Column) -> Column:
    """First-of-quarter -> first of the month after quarter end (+3 months)."""
    return F.add_months(date_col, 3)
