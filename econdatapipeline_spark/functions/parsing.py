"""Coercion and parsing heuristics as pure column expressions.

Replaces the reference's per-cell Python: ``pd.to_numeric(errors=
'coerce')`` (reference: azure_common_scrapers.py:133), the FRED ``"."``
missing sentinel (azure_fred_scraper.py:114), the NYU percent-parsing
heuristic (azure_nyu_scraper.py:126-152), and the CamelCase->snake_case
column renamer (azure_common_scrapers.py:275-279 — schema metadata, so
driver-side Python is correct there).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def coerce_numeric(col: Column, value_type: str = "double") -> Column:
    """Numeric coercion with null-on-error (== to_numeric(errors='coerce')).

    ``try_cast`` keeps the expression inside codegen; 'long' additionally
    applies the reference's round-then-int (azure_common_scrapers.py:135)
    HALF_UP-style rounding via ``round``.
    """
    as_double = col.cast("string").try_cast("double")
    if value_type == "long":
        return F.round(as_double).try_cast("long")
    return as_double


def replace_missing_sentinel(col: Column, sentinel: str = ".") -> Column:
    """FRED encodes missing observations as '.'; map to NULL pre-cast."""
    return F.when(col.cast("string") == sentinel, F.lit(None)).otherwise(col)


def parse_percent(col: Column) -> Column:
    """NYU ERP mixed-format percent parser (azure_nyu_scraper.py:131-152).

    - '4.02%'  -> 0.0402  (strip '%', divide by 100)
    - 4.02     -> 0.0402  (bare float > 0.2 treated as percentage)
    - 0.0402   -> 0.0402  (already a decimal fraction, <= 0.2)
    - junk     -> NULL

    The >0.2 branch is a data-dependent heuristic, reproduced exactly.
    """
    s = F.trim(col.cast("string"))
    has_pct = s.contains("%")
    pct_val = F.regexp_replace(s, "%", "").try_cast("double") / 100.0
    num = s.try_cast("double")
    return F.when(has_pct, pct_val).otherwise(
        F.when(num > 0.2, num / 100.0).otherwise(num)
    )


def snake_case(name: str) -> str:
    """CamelCase -> snake_case for column *names* (driver-side metadata).

    Mirrors the hand-rolled converter at azure_common_scrapers.py:275-279
    including multi-capital words ('IndividualLoans' -> 'individual_loans').
    """
    out = "".join("_" + ch.lower() if ch.isupper() else ch for ch in name)
    return out.lstrip("_")


def padded_tiebreak(col: Column, width: int = 20) -> Column:
    """Fixed-width zero-padded string form of a non-negative integer
    id, for lexicographic min_by/max_by tie-break keys (ohlc_resample,
    streaming ohlc_bars).

    Spark's lpad TRUNCATES strings longer than `width`, and '-' (0x2d)
    sorts before '0' (0x30), so an overflowing or negative id would
    silently corrupt open/close selection among same-period rows —
    width 20 holds every non-negative int64 (19 digits), and negatives
    raise per-row instead of mis-sorting.
    """
    s = col.cast("long")
    bad = (s < 0) | (s.isNull() & col.isNotNull())
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit("padded_tiebreak: tiebreak id must be a "),
                F.lit("non-negative integer, got "),
                F.coalesce(col.cast("string"), F.lit("null")),
            )
        ),
    ).otherwise(F.lpad(s.cast("string"), width, "0"))
