"""Column-expression builders — the engine's scalar function library.

Every row-wise Python function in the reference reduces to built-in
Spark column expressions here (no Python UDFs on hot paths); see
``dates`` (fiscal calendars), ``parsing`` (coercion heuristics),
``text`` (tokenize/quality/langid/fingerprint), ``vectors``
(embedding math).
"""

from econdatapipeline_spark.functions.dates import (
    fiscal_monthly_date,
    fiscal_quarterly_date,
    fred_quarterly_adjust,
    month_number,
)
from econdatapipeline_spark.functions.parsing import (
    coerce_numeric,
    parse_percent,
    replace_missing_sentinel,
    snake_case,
)

__all__ = [
    "month_number",
    "fiscal_monthly_date",
    "fiscal_quarterly_date",
    "fred_quarterly_adjust",
    "coerce_numeric",
    "parse_percent",
    "replace_missing_sentinel",
    "snake_case",
]
