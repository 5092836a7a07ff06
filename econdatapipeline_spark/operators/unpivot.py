"""Wide->long reshape (the reference's signature transform).

The reference promotes the first row of an Excel slice to column names
(reference: azure_common_scrapers.py:117-121) then ``pd.melt``s 12
months x 10 fiscal-year columns into 120 long rows (:124). Spark 3.4+
has a native ``DataFrame.unpivot`` (SQL ``stack``) which runs inside
codegen — no shuffle, no UDF; a narrow map-only transform that scales
linearly at any data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def promote_header(df: DataFrame, id_column_name: str = "Month") -> DataFrame:
    """First row becomes column names; that row is dropped.

    The grid is a KB-sized spreadsheet slice, so pulling one row to the
    driver is correct (schema is metadata). Returns a DataFrame whose
    first column is ``id_column_name`` and remaining columns are the
    stringified header values (fiscal years).
    """
    first = df.limit(1).collect()
    if not first:
        return df
    header = first[0]
    old_cols = df.columns
    new_cols = [id_column_name] + [str(v) for v in header[1:]]
    renamed = df.toDF(*new_cols)
    # Drop the header row itself (its id cell carries the original blank/label).
    return renamed.filter(F.col(id_column_name) != F.lit(str(header[0])))


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """pd.melt equivalent via native unpivot (codegen'd stack)."""
    value_vars = value_vars or [c for c in df.columns if c not in id_vars]
    # unpivot requires a common type across value columns; go through string
    # and let the caller coerce (mirrors the untyped spreadsheet cells).
    # df[c] (not F.col) so header values containing dots ('110.5') are
    # resolved as literal names, not struct paths.
    casted = df.select(
        *[df[c] for c in id_vars],
        *[df[c].cast("string").alias(c) for c in value_vars],
    )
    return casted.unpivot(
        [casted[c] for c in id_vars],
        [casted[c] for c in value_vars],
        var_name,
        value_name,
    )
