"""Snapshot diff: classify rows between two table versions.

The standalone read-side twin of operators/merge.py's change capture:
given yesterday's and today's snapshot of a keyed table, label every
key as inserted / deleted / updated / unchanged and surface the
changed column values. This is how a warehouse without a transaction
log (plain Parquet snapshots — this engine's storage) still answers
"what changed between loads", the question the reference's
datarevisions table exists for (azure_data_tracker.py:116-127).

Plan shape: one full-outer join on the key — shuffle both sides by key
once (or zero exchanges if both snapshots are bucketed by the key,
sources/warehouse.write_bucketed) — then pure column expressions for
the classification. Tolerance mirrors the reference's 0.001 rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TOLERANCE = 0.001


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    tolerance: float = DEFAULT_TOLERANCE,
) -> DataFrame:
    """(keys..., change, old/new value columns) for every key in either
    snapshot.

    change ∈ {'inserted', 'deleted', 'updated', 'unchanged'}: numeric
    columns compare with ``abs(new-old) > tolerance`` (the reference's
    revision rule, azure_data_tracker.py:108-113); non-numeric with
    null-safe equality.
    """
    # Presence must come from the join side, not value nullability: a row
    # whose values are all null still exists. Use a sentinel per side.
    o = old.select(
        *key_cols, F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in value_cols],
    )
    n = new.select(
        *key_cols, F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in value_cols],
    )
    j = o.join(n, key_cols, "full_outer")

    changed = F.lit(False)
    for c in value_cols:
        oc, nc = F.col(f"old_{c}"), F.col(f"new_{c}")
        dtype = dict(new.dtypes).get(c, "")
        if dtype in ("double", "float", "bigint", "int", "smallint") or dtype.startswith("decimal"):
            col_changed = (
                F.abs(nc - oc) > tolerance
            ) | (oc.isNull() != nc.isNull())
        else:
            col_changed = ~oc.eqNullSafe(nc)
        changed = changed | col_changed

    change = (
        F.when(F.col("__in_old").isNull(), "inserted")
        .when(F.col("__in_new").isNull(), "deleted")
        .when(changed, "updated")
        .otherwise("unchanged")
    )
    return j.select(
        *key_cols,
        change.alias("change"),
        *[F.col(f"old_{c}") for c in value_cols],
        *[F.col(f"new_{c}") for c in value_cols],
    )
