"""Survival analysis: the Kaplan-Meier product-limit estimator.

Churn/retention time-to-event analytics with right-censoring done
correctly (Kaplan & Meier 1958): naive "average days to next order"
silently drops the customers who never ordered again — exactly the
ones a retention analysis is about. KM keeps them as censored
subjects: at each distinct event time t with d_t events out of n_t
at risk,

    S(t) = prod over t_i <= t of (1 - d_i / n_i)

Relational shape: ONE groupBy(duration) collapses the subject table
to the distinct-time relation (at-risk counts follow by a reverse
cumulative sum), so everything after the first aggregate runs on
times-sized data — the same collapse discipline as zipf_fit/
quantile_rollup. The cumulative product is exp of a running sum of
decimal(18,9)-quantized ln(1 - d/n) terms (the lm.py rule), making
the whole curve engine-portable; times where d = n (everyone left)
drive S to exactly 0 via an explicit flag rather than ln(0).

At 100 TB the subject table is customers-sized and the curve is
distinct-times-sized; a grouped version runs the identical plan under
an extra partition key in both the aggregate and the windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Product-limit curve -> one row per distinct duration with an
    event or censoring: (t, n_risk, n_events, n_censored, survival).

    ``event_col`` is 1 when the event occurred at ``duration_col``,
    0 when the subject was censored then (still event-free when
    observation ended). survival is carried AT t (post-event), the
    right-continuous convention.
    """
    per_t = (
        df.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("int").alias("e"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("t")
        .agg(
            F.sum("e").cast("long").alias("n_events"),
            F.sum(F.lit(1) - F.col("e")).cast("long").alias("n_censored"),
        )
    )
    # at risk at t = everyone whose duration >= t: reverse cumsum of
    # (events + censored) over the time-ordered distinct-time relation
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_t.withColumn(
        "n_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_rev),
    )
    term = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.log(
            (F.col("n_risk") - F.col("n_events")).cast("double")
            / F.col("n_risk").cast("double")
        ).cast("decimal(18,9)"),
    ).otherwise(F.lit(0).cast("decimal(18,9)"))
    dead = F.when(F.col("n_events") >= F.col("n_risk"), 1).otherwise(0)
    w_fwd = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        at_risk.withColumn("ln_s", F.sum(term).over(w_fwd))
        .withColumn("died", F.max(dead).over(w_fwd))
        .select(
            "t",
            "n_risk",
            "n_events",
            "n_censored",
            F.when(F.col("died") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("ln_s").cast("double")), 6))
            .alias("survival"),
        )
    )
    return curve


def median_survival(curve: DataFrame) -> DataFrame:
    """Median survival time from a kaplan_meier curve -> one row
    (median_t): the smallest t with S(t) <= 0.5, null if the curve
    never falls that far (more than half the subjects censored
    event-free — the honest answer, not an extrapolation)."""
    return curve.filter(F.col("survival") <= 0.5).agg(
        F.min("t").alias("median_t")
    )
