"""As-of (point-in-time) join — the time-series operator Spark lacks.

The reference aligns series by exact date arithmetic only (SURVEY §2.5,
J2); real time-series work needs "latest right row at or before each
left row" (price as-of trade, last click before purchase, last revision
as-of a date). Two classic distributed strategies:

- naive range join: ``l.ts >= r.ts`` theta-join then argmax — candidate
  explosion, O(|L| x matches) shuffle; unusable at 100 TB.
- **union + last_value window (implemented here)**: tag both sides,
  union, one shuffle keyed by the `by` columns, a single ordered pass
  per key carrying the most recent right payload forward. Cost is one
  sort-shuffle of |L| + |R| — the same shape as a sort-merge join, with
  no candidate blowup; skewed keys are handled by AQE like any other
  shuffle.

Determinism: window order is (ts, side, seq) — `side` puts right rows
before left rows at equal ts (ASOF ``>=`` semantics), `seq` makes ties
among right rows total, so results are bit-stable and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] = ("value",),
    seq_col: str | None = None,
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` within the same `by` group (backward as-of).

    right_cols: right payload columns to carry (exposed as
    ``<name><suffix>``; the match timestamp as ``<on><suffix>``).
    seq_col: optional right column making equal-ts right rows ordered
    (last one wins deterministically).
    tolerance: optional max staleness as a Column interval/expression;
    matches older than ``left.on - tolerance`` become nulls.
    """
    by = list(by)
    payload_fields = [F.col(on).alias(f"{on}{suffix}")] + [
        F.col(c).alias(f"{c}{suffix}") for c in right_cols
    ]
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        (F.col(seq_col) if seq_col else F.lit(0)).alias("__seq"),
        F.struct(*payload_fields).alias("__r"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *by,
        F.col(on),
        F.lit(1).alias("__side"),
        F.lit(0).alias("__seq"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc(), F.col("__seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col(f"__m.{on}{suffix}") >= F.col(on) - tolerance, F.col("__m")
            ),
        )
    out_left = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"__m.{f}").alias(f)
        for f in [f"{on}{suffix}"] + [f"{c}{suffix}" for c in right_cols]
    ]
    return matched.select(*out_left, *out_right)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: Column,
    by: Sequence[str] = (),
) -> DataFrame:
    """Interval containment join (``r.lo <= l.point < r.hi``) via bucketing.

    A raw theta range join is a cross product per `by` group. Bucketing
    maps each point to one bucket and each interval to the buckets it
    overlaps (sequence+explode), turning the theta join into an
    equi-join on (by, bucket) — the standard trick behind range-join
    optimizers (Databricks' range-join hint, PostGIS grids). Shuffle is
    keyed and bounded by bucket occupancy, never all-pairs.
    """
    by = list(by)
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    cond = (F.col(f"r.{right_lo}") <= F.col(f"l.{left_point}")) & (
        F.col(f"l.{left_point}") < F.col(f"r.{right_hi}")
    )
    joined = lb.alias("l").join(
        rb.alias("r"),
        [F.col(f"l.{c}") == F.col(f"r.{c}") for c in by]
        + [F.col("l.__bucket") == F.col("r.__bucket")],
    )
    lcols = [F.col(f"l.{c}") for c in left.columns]
    rcols = [F.col(f"r.{c}") for c in right.columns if c not in by]
    return joined.filter(cond).select(*lcols, *rcols)
